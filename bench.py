"""Headline benchmark: DS1 (27 taxa) log-likelihood + branch-gradient
evaluations per second on one chip.

Workload (BASELINE.json): batched Felsenstein pruning with the linear-time
two-pass branch gradient, JC69 + constant sites, DS1.subsampled_10 topologies
with perturbed branch lengths, float32, rescaling on. One jitted vmapped
program evaluates the whole batch per launch.

Baseline: the reference publishes no throughput numbers (BASELINE.md); its
backend for this workload is BEAGLE's vectorized multi-threaded CPU path
(fat_beagle.cpp:50-70,119-175). BEAGLE is unavailable here, so the baseline
is measured fresh each run from native/cpu_baseline.cpp — an -O3
-march=native (AVX-512 on this host), OpenMP-threaded C++ implementation of
the same computation, verified against the pybeagle/physher golden numbers
(~4.5k evals/s f32 on the 2-core host, vs the retired 360/s XLA-CPU
stand-in; both multiples are reported). North star: 100x BEAGLE-CPU.

Parity gate: before timing, the bench asserts the DS1 golden numbers
(pybeagle LLs, physher last-tree gradient, physher Weibull+4 LLs for the
K-category kernel) on the SAME engine it times — so driver runs catch
TPU/Mosaic lowering regressions, not just perf. `python bench.py --parity`
runs only the gate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...,
"parity"}.
"""

import json
import sys
import time

import numpy as np

XLA_CPU_STANDIN_EVALS_PER_SEC = 360.0  # retired round-1 denominator
FALLBACK_CPU_BASELINE = 4518.0  # native f32, measured 2026-08-20, 2 cores

PYBEAGLE_LIKELIHOODS = np.array([
    -14582.995273982739, -6911.294207416366, -6916.880235529542,
    -6904.016888831189, -6915.055570693576, -6915.50496696512,
    -6910.958836661867, -6909.02639968063, -6912.967861935749,
    -6910.7871105783515,
])

PHYSHER_GRADIENTS = np.array([
    -904.18956, -607.70500, -562.36274, -553.63315, -542.26058, -539.64210,
    -463.36511, -445.32555, -414.27197, -412.84218, -399.15359, -342.68038,
    -306.23644, -277.05392, -258.73681, -175.07391, -171.59627, -168.57646,
    -150.57623, -145.38176, -115.15798, -94.86412, -83.02880, -80.09165,
    -69.00574, -51.93337, 0.00000, 0.00000, 16.17497, 20.47784,
    58.06984, 131.18998, 137.10799, 225.73617, 233.92172, 253.49785,
    255.52967, 259.90378, 394.00504, 394.96619, 396.98933, 429.83873,
    450.71566, 462.75827, 471.57364, 472.83161, 514.59289, 650.72575,
    888.87834, 913.96566, 927.14730, 959.10746, 2296.55028,
])

PHYSHER_WEIBULL_LIKELIHOODS = np.array([
    -9456.1201098061, -6624.4110704332, -6623.4474776131, -6617.25658038029,
    -6627.5385571548, -6621.6155048722, -6622.3314942713, -6618.7695717585,
    -6616.3837517370, -6623.8295828648,
])


def measure_cpu_baseline(args, sp):
    """Throughput of the native BEAGLE-grade CPU path on this host (f32,
    all cores), on the exact bench workload."""
    from libsbn_tpu.utils import cpu_baseline

    post_node, post_children, up_node, up_parent, up_sibs, bl_p = args
    tips = sp.tip_partials()
    w = sp.weights
    B = 512
    reps = B // post_children.shape[0] + 1
    tile = lambda a: np.tile(  # noqa: E731
        a, (reps,) + (1,) * (a.ndim - 1)
    )[:B]
    pc, un, up_, us, blb = map(
        tile, (post_children, up_node, up_parent, up_sibs,
               bl_p.astype(np.float64)),
    )
    rng = np.random.default_rng(0)
    blb = blb * rng.uniform(0.8, 1.2, blb.shape)
    blb[:, -1] = 0.0
    blb[:, blb.shape[1] - 2] = 0.0  # root slot
    run = lambda: cpu_baseline.eval_batch(  # noqa: E731
        pc, un, up_, us, blb, tips, w, tips.shape[0],
        threads=0, dtype_bits=32,
    )
    run()  # warmup
    # Best of 4 windows: the 2-core host also runs the tunnel processes,
    # so single windows vary ~20%; the max window is the machine's rate.
    best = 0.0
    for _ in range(4):
        t0 = time.time()
        iters = 0
        while time.time() - t0 < 1.0:
            run()
            iters += 1
        best = max(best, B * iters / (time.time() - t0))
    return best


def check_parity(ge, engine, sched, bl, sp):
    """Golden-number asserts on the engine bench.py times (f32 on TPU)."""
    import jax
    import jax.numpy as jnp

    from libsbn_tpu.models.phylo_model import (
        PhyloModelSpec, default_parameters, model_tensors,
    )
    from libsbn_tpu.ops import pruning

    bl_p = np.pad(bl, ((0, 0), (0, 1))).astype(np.float32)
    if engine == "pallas":
        fn = jax.jit(ge.entry_pallas())
        ll, grad = fn(np.asarray(sched.post_children), jnp.asarray(bl_p))
    else:
        fn, args = ge.entry()
        ll, grad = jax.jit(fn)(*args[:-1], jnp.asarray(bl_p))
    ll = np.asarray(ll)
    grad = np.asarray(grad)
    np.testing.assert_allclose(
        ll, PYBEAGLE_LIKELIHOODS, rtol=1e-5, atol=0.5,
        err_msg="DS1 LLs vs pybeagle",
    )
    mine = np.sort(
        np.concatenate([np.asarray(grad[-1][: sched.node_count - 1]), [0.0, 0.0]])
    )
    np.testing.assert_allclose(
        mine, PHYSHER_GRADIENTS, rtol=2e-2, atol=0.5,
        err_msg="DS1 last-tree branch gradient vs physher",
    )

    # K-category kernel: Weibull+4 (shape 0.1) LLs vs physher.
    spec = PhyloModelSpec("JC69", "weibull+4", "strict")
    params = default_parameters(spec)
    params["site"] = {"shape": jnp.asarray(0.1, jnp.float32)}
    freqs, evec, ivec, evals, rates, props, Q = model_tensors(spec, params)
    f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
    rates, props = f32(rates), f32(props)
    if engine == "pallas":
        from libsbn_tpu.ops import pruning_pallas_jc

        ll_w, _ = (
            pruning_pallas_jc.log_likelihood_and_branch_gradient_pallas_jc69(
                np.asarray(sched.post_children), jnp.asarray(bl_p),
                sp.tip_partials(np.float32),
                sp.weights.astype(np.float32), root_id=sched.root_id,
                rates=rates, props=props,
            )
        )
    else:
        P_b = jax.vmap(
            lambda b: pruning.node_transition_matrices(
                f32(evec), f32(ivec), f32(evals), b, rates
            )
        )(jnp.asarray(bl_p))
        Qs = f32(Q)[None] * rates[:, None, None]
        lls = []
        for i in range(bl_p.shape[0]):
            class _S:
                pass

            s = _S()
            s.root_id = sched.root_id
            s.post_node = sched.post_node[i]
            s.post_children = sched.post_children[i]
            s.up_node = sched.up_node[i]
            s.up_parent = sched.up_parent[i]
            s.up_sibs = sched.up_sibs[i]
            llw, _ = pruning.log_likelihood_and_branch_gradient(
                s, P_b[i], Qs, jnp.asarray(sp.tip_partials(np.float32)),
                f32(freqs), props, jnp.asarray(sp.weights, jnp.float32), True,
            )
            lls.append(float(llw))
        ll_w = np.asarray(lls)
    np.testing.assert_allclose(
        np.asarray(ll_w), PHYSHER_WEIBULL_LIKELIHOODS, rtol=1e-5, atol=0.5,
        err_msg="DS1 Weibull+4 LLs vs physher (K-category kernel)",
    )


def main():
    import os

    import jax

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    sched, bl, sp = ge._load_ds1()
    B = 512  # topologies per launch
    reps = B // 10 + 1
    rng = np.random.default_rng(0)
    tile = lambda a: np.tile(a, (reps,) + (1,) * (a.ndim - 1))[:B]  # noqa: E731
    post_node, post_children, up_node, up_parent, up_sibs, bl0 = (
        tile(a) for a in args
    )
    bl = (bl0 * rng.uniform(0.8, 1.2, bl0.shape)).astype(np.float32)

    engine = os.environ.get(
        "LIBSBN_TPU_BENCH_ENGINE",
        "pallas" if jax.default_backend() == "tpu" else "scan",
    )

    # Parity gate on the engine being timed (f32 golden asserts).
    try:
        check_parity(ge, engine, sched, np.asarray(ge._load_ds1()[1]), sp)
        parity = "pass"
    except AssertionError as exc:
        parity = "fail: " + " ".join(str(exc).split())[:160]
    except Exception as exc:  # noqa: BLE001
        parity = f"error: {type(exc).__name__}: {exc}"[:140]
    if "--parity" in sys.argv:
        print(json.dumps({"metric": "parity", "value": parity}))
        sys.exit(0 if parity == "pass" else 1)

    if parity != "pass":
        # Hard gate: a red parity check must never ship as a perf headline
        # (round 2 did exactly that). No throughput number, nonzero exit.
        print(
            json.dumps(
                {
                    "metric": "PARITY FAILURE — throughput withheld",
                    "value": 0.0,
                    "unit": "evals/sec",
                    "vs_baseline": 0.0,
                    "parity": parity,
                }
            )
        )
        sys.exit(1)

    # Device-resident inputs: in production (VI loops) branch lengths and
    # schedules live on device; host->device transfer over the tunneled
    # chip would otherwise dominate the measurement.
    if engine == "pallas":
        jfn = jax.jit(ge.entry_pallas())
        pc_d, bl_d = jax.device_put(post_children), jax.device_put(bl)
        run = lambda: jfn(pc_d, bl_d)  # noqa: E731
    else:
        jfn = jax.jit(fn)
        args_d = jax.device_put(
            (post_node, post_children, up_node, up_parent, up_sibs, bl)
        )
        run = lambda: jfn(*args_d)  # noqa: E731
    out = run()
    jax.block_until_ready(out)
    # Steady state: best of 3 windows (the tunneled chip sees occasional
    # multi-ms RTT hiccups; the max window is the reproducible device rate).
    iters = 20
    evals_per_sec = 0.0
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = run()
        jax.block_until_ready(out)
        dt = time.time() - t0
        evals_per_sec = max(evals_per_sec, B * iters / dt)

    # Honest baseline: the native BEAGLE-grade CPU path on this host.
    try:
        cpu = measure_cpu_baseline(args, sp)
        provenance = (
            "native/cpu_baseline.cpp f32, -O3 -march=native -fopenmp, "
            "all host cores, golden-verified; measured this run"
        )
    except Exception as exc:  # noqa: BLE001
        cpu = FALLBACK_CPU_BASELINE
        provenance = f"cached 2026-08-20 value (live measure failed: {exc})"

    print(
        json.dumps(
            {
                "metric": "DS1 loglik+gradient evals/sec (27 taxa, 934 patterns, f32)",
                "value": round(evals_per_sec, 1),
                "unit": "evals/sec",
                "vs_baseline": round(evals_per_sec / cpu, 2),
                "baseline_evals_per_sec": round(cpu, 1),
                "baseline_provenance": provenance,
                "vs_retired_xla_cpu_standin": round(
                    evals_per_sec / XLA_CPU_STANDIN_EVALS_PER_SEC, 2
                ),
                "parity": parity,
            }
        )
    )


if __name__ == "__main__":
    main()
