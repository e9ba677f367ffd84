"""Headline benchmark: DS1 (27 taxa) log-likelihood + branch-gradient
evaluations per second on one chip.

Workload (BASELINE.json): batched Felsenstein pruning with the linear-time
two-pass branch gradient, JC69 + constant sites, DS1.subsampled_10 topologies
with perturbed branch lengths, float32, rescaling on. One jitted vmapped
program evaluates the whole batch per launch.

Baseline: the reference publishes no throughput numbers (BASELINE.md); as a
stand-in for BEAGLE-CPU we use this same workload measured on this host's
CPU via XLA-CPU (360 evals/sec, 2 cores, f32, measured 2026-08-17). The
north-star target is 100x that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

CPU_BASELINE_EVALS_PER_SEC = 360.0


def main():
    import os

    import jax

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
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
    if engine == "pallas":
        jfn = jax.jit(ge.entry_pallas())
        run = lambda: jfn(post_children, bl)  # noqa: E731
    else:
        jfn = jax.jit(fn)
        run = lambda: jfn(  # noqa: E731
            post_node, post_children, up_node, up_parent, up_sibs, bl
        )
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

    print(
        json.dumps(
            {
                "metric": "DS1 loglik+gradient evals/sec (27 taxa, 934 patterns, f32)",
                "value": round(evals_per_sec, 1),
                "unit": "evals/sec",
                "vs_baseline": round(evals_per_sec / CPU_BASELINE_EVALS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
