"""On-TPU f32 parity tier: golden-number asserts on the PRODUCTION engine
configuration (f32, Pallas where that is the default) for every major
subsystem — the class of regression CPU f64 tests structurally cannot catch
(round 2 shipped a 96-LL-unit MXU-precision bug that 162 green CPU tests
never saw).

Coverage (golden sources in /root/reference):
  * DS1 unrooted: JC69 LLs vs pybeagle, last-tree branch gradient vs
    physher, Weibull+4 LLs vs physher (bench.py's gate, both engines) —
    src/unrooted_sbn_instance.hpp:225-297.
  * fluA rooted strict clock: LL + log-det-Jacobian, the 67-value
    ratios/root-height gradient — src/rooted_sbn_instance.hpp:262-284.
  * fluA GTR: LL + 8-value stick-space substitution gradient —
    src/rooted_sbn_instance.hpp:340-354.
  * fluA Weibull+4: LL + site-model (shape) gradient —
    src/rooted_sbn_instance.hpp:367-377.
  * GP: hello fixed-branch marginal (gp_doctest.cpp:89-101) and the
    five_taxon converged branch-ascent marginal (brute-force-pinned in
    tests/test_gp.py on CPU f64).
  * VBPI: one JitVBPI step's mean_ll and elbo_like vs the CPU f64 value
    (same host-sampled topologies/normals, so the difference is pure
    device arithmetic).

Tolerances follow the BASELINE.md precision policy: f32 carries ~7
significant digits, so LLs of magnitude ~5e3 get atol 0.5 (≈1e-4
relative), small-magnitude values get proportionally tighter bounds, and
gradients get rtol 2e-2.

Usage: python tools/tpu_parity.py [--record]
  --record prints measured-vs-golden without asserting (for retuning).
Exit 0 iff every assert passes. One line per check.
"""

import os
_DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "data")
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

FAILURES = []
RECORD = "--record" in sys.argv


def check(name, got, want, atol, rtol=0.0):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    err = np.max(np.abs(got - want))
    bound = atol + rtol * np.max(np.abs(want))
    ok = bool(err <= bound)
    print(f"{'ok  ' if ok else 'FAIL'} {name}: max|err|={err:.3e} (bound {bound:.1e})")
    if not ok and not RECORD:
        FAILURES.append((name, float(err), float(bound)))


def flu_fixture():
    from libsbn_tpu.core.site_pattern import SitePattern
    from libsbn_tpu.core.tree import RootedTree, RootedTreeCollection
    from libsbn_tpu.io import newick
    from libsbn_tpu.io.fasta import Alignment
    from libsbn_tpu.ops import schedule

    tops, bls, ttm = newick.parse_newick_file(f"{_DATA_DIR}/fluA.tree")
    coll = RootedTreeCollection(
        [RootedTree(t, b) for t, b in zip(tops, bls)], ttm
    )
    coll.parse_dates_from_taxon_names(True)
    sp = SitePattern(
        Alignment.read_fasta(f"{_DATA_DIR}/fluA.fa"), ttm
    )
    tree = coll.trees[0]
    sched = schedule.batch_schedules(
        [schedule.schedule_of_topology(t.topology) for t in coll.trees]
    )
    bounds = np.stack([t.node_bounds for t in coll.trees])
    ratios = np.stack([t.height_ratios for t in coll.trees])
    rates = np.full((len(coll.trees), tree.node_count() - 1), 0.001)
    return sched, bounds, ratios, rates, sp


def run_ds1(jnp):
    """The bench.py gate: DS1 LLs/gradient/Weibull on the timed engine."""
    import bench
    import __graft_entry__ as ge

    sched, bl, sp = ge._load_ds1()
    import jax

    engine = "pallas" if jax.default_backend() == "tpu" else "scan"
    try:
        bench.check_parity(ge, engine, sched, np.asarray(bl), sp)
        print(f"ok   DS1 JC69/gradient/Weibull gate ({engine} engine)")
    except AssertionError as exc:
        print(f"FAIL DS1 gate: {' '.join(str(exc).split())[:200]}")
        if not RECORD:
            FAILURES.append(("DS1 gate", np.nan, np.nan))


def run_flu(jnp):
    from tests.test_rooted_likelihood import (
        PHYSHER_JACOBIAN, PHYSHER_LL, PHYSHER_RATIO_GRADIENTS,
    )
    from libsbn_tpu.models.engine import LikelihoodEngine
    from libsbn_tpu.models.phylo_model import PhyloModelSpec, default_parameters

    sched, bounds, ratios, rates, sp = flu_fixture()

    # Strict clock JC69 (production f32 path: Pallas VJP kernel on TPU).
    spec = PhyloModelSpec("JC69", "constant", "strict")
    engine = LikelihoodEngine(sp, spec, dtype=jnp.float32)
    lls, ldjs = engine.rooted_log_likelihoods(
        sched, bounds, ratios, rates, default_parameters(spec), return_parts=True
    )
    check("fluA strict-clock LL", float(lls[0]), PHYSHER_LL, atol=0.5)
    check("fluA log-det-Jacobian", float(ldjs[0]), PHYSHER_JACOBIAN, atol=1e-3)
    g = engine.rooted_phylo_gradients(
        sched, bounds, ratios, rates, default_parameters(spec)
    )
    check(
        "fluA 67-value ratios/root-height gradient",
        np.asarray(g["ratios_root_height"][0]),
        PHYSHER_RATIO_GRADIENTS,
        atol=0.5,
        rtol=2e-2,
    )

    # GTR (phylotorch goldens).
    spec = PhyloModelSpec("GTR", "constant", "strict")
    engine = LikelihoodEngine(sp, spec, dtype=jnp.float32)
    params = default_parameters(spec)
    params["substitution"] = {
        "rates": jnp.asarray([0.05, 0.1, 0.15, 0.20, 0.25, 0.25], jnp.float32),
        "frequencies": jnp.asarray([0.1, 0.2, 0.3, 0.4], jnp.float32),
    }
    lls, ldjs = engine.rooted_log_likelihoods(
        sched, bounds, ratios, rates, params, return_parts=True
    )
    check("fluA GTR LL", float(lls[0]), -5221.438941335706, atol=0.5)
    g = engine.rooted_phylo_gradients(sched, bounds, ratios, rates, params)
    check(
        "fluA GTR substitution gradient (stick space)",
        np.asarray(g["substitution_model"])[0],
        [49.06451538, 151.83105912, 26.40235659, -8.25135661,
         75.29759338, 352.56545247, 90.07046995, 30.12301652],
        atol=0.5,
        rtol=2e-2,
    )

    # Weibull+4 site model.
    spec = PhyloModelSpec("JC69", "weibull+4", "strict")
    engine = LikelihoodEngine(sp, spec, dtype=jnp.float32)
    params = default_parameters(spec)
    params["site"] = {"shape": jnp.asarray(0.1, jnp.float32)}
    lls, _ = engine.rooted_log_likelihoods(
        sched, bounds, ratios, rates, params, return_parts=True
    )
    check("fluA Weibull+4 LL", float(lls[0]), -4618.2062529058, atol=0.5)
    g = engine.rooted_phylo_gradients(sched, bounds, ratios, rates, params)
    check(
        "fluA Weibull shape gradient",
        float(np.asarray(g["site_model"])[0]),
        -5.231329,
        atol=0.05,
        rtol=2e-2,
    )


def run_gp(jnp):
    from libsbn_tpu.gp.instance import GPInstance

    # hello fixed-branch marginal (gp_doctest.cpp:89-101).
    gp = GPInstance("tpu-parity-hello")
    gp.read_fasta_file(f"{_DATA_DIR}/hello.fasta")
    gp.read_newick_file(f"{_DATA_DIR}/hello_rooted.nwk")
    gp.make_engine(dtype=np.float32)
    eng = gp.get_engine()
    eng.branch_lengths = np.array([0.0, 0.22, 0.113, 0.15, 0.1], np.float32)
    gp.populate_plvs()
    gp.compute_likelihoods()
    check(
        "GP hello fixed-branch marginal",
        float(eng.get_log_marginal_likelihood()),
        -84.77961943,
        atol=5e-3,  # measured f32 TPU error 1.6e-3 (rel 2e-5)
    )

    # five_taxon converged ascent (brute-force-pinned on CPU f64:
    # tests/test_gp.py::test_two_tree_marginal machinery; value recorded
    # 2026-08-20, tol 1e-4, 6 sweeps).
    gp = GPInstance("tpu-parity-five")
    gp.read_fasta_file(f"{_DATA_DIR}/five_taxon.fasta")
    gp.read_newick_file(f"{_DATA_DIR}/five_taxon_rooted.nwk")
    gp.make_engine(dtype=np.float32)
    marg, iters = gp.get_engine().run_branch_ascent(1e-4, 100)
    check(
        "GP five_taxon converged marginal",
        float(marg),
        -16.798360173496032,
        atol=5e-3,
    )


def run_vbpi(jnp):
    from libsbn_tpu import UnrootedInstance
    from libsbn_tpu.models.phylo_model import PhyloModelSpec
    from libsbn_tpu.vi.jit_step import JitVBPI

    inst = UnrootedInstance("tpu-parity-vbpi")
    inst.read_nexus_file(f"{_DATA_DIR}/hello_out.t")
    inst.process_loaded_trees()
    inst.train_simple_average()
    inst.read_fasta_file(f"{_DATA_DIR}/hello.fasta")
    inst.prepare_for_phylo_likelihood(
        PhyloModelSpec("JC69", "constant", "strict")
    )
    jv = JitVBPI(inst, particle_count=4, seed=0, dtype=jnp.float32)
    m = jv.step(beta=0.5)
    # CPU f64 goldens (same seed => same host-sampled topologies/eps;
    # recorded 2026-08-20): mean_ll -82.68780605238332,
    # elbo_like -42.72656590920793.
    check("VBPI step mean_ll (f32 vs CPU f64)",
          float(m["mean_ll"]), -82.68780605238332, atol=5e-3)
    check("VBPI step elbo_like (f32 vs CPU f64)",
          float(m["elbo_like"]), -42.72656590920793, atol=5e-3)


def main():
    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    run_ds1(jnp)
    run_flu(jnp)
    run_gp(jnp)
    run_vbpi(jnp)
    if FAILURES:
        print(f"TPU PARITY: {len(FAILURES)} FAILURES")
        sys.exit(1)
    print("TPU PARITY: all checks passed")


if __name__ == "__main__":
    main()
