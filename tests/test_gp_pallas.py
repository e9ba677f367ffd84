"""Parity tests for the fused GP populate Pallas kernel (gp/engine_pallas.py).

Run in interpret mode on CPU; the kernel's per-(node, pattern) log-scales
differ from the XLA path's per-node scalars, so parity is gated on the
scale-invariant quantities: likelihood rows, marginals, per-GPCSP LLs, and
the branch-optimization output driven from the kernel's PLVs."""

import os
import pytest
import numpy as np

from libsbn_tpu.gp import GPInstance

DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data"
)


def make_instance(fasta, newick_file, **kw):
    inst = GPInstance()
    inst.read_fasta_file(f"{DATA}/{fasta}")
    inst.read_newick_file(f"{DATA}/{newick_file}")
    inst.make_engine(**kw)
    return inst


def both_paths(fasta, newick_file):
    """(rows, marginal, per_gpcsp, swept_bl) for XLA and Pallas populate."""
    out = {}
    for use_pallas in (False, True):
        inst = make_instance(fasta, newick_file)
        eng = inst.get_engine()
        eng.use_pallas = use_pallas
        eng.pallas_interpret = use_pallas
        eng.populate_plvs()
        eng.compute_likelihoods()
        eng.optimize_branch_lengths_sweep()
        out[use_pallas] = (
            np.asarray(eng.log_likelihood_rows),
            eng.get_log_marginal_likelihood(),
            eng.get_per_gpcsp_log_likelihoods(),
            eng.branch_lengths.copy(),
        )
    return out


def check_parity(fasta, newick_file, tol=1e-9):
    out = both_paths(fasta, newick_file)
    rows_x, marg_x, per_x, bl_x = out[False]
    rows_p, marg_p, per_p, bl_p = out[True]
    finite = np.isfinite(rows_x)
    assert (finite == np.isfinite(rows_p)).all()
    np.testing.assert_allclose(rows_p[finite], rows_x[finite], atol=tol)
    assert abs(marg_p - marg_x) < tol
    fin = np.isfinite(per_x)
    np.testing.assert_allclose(per_p[fin], per_x[fin], atol=tol * 100)
    np.testing.assert_allclose(bl_p, bl_x, rtol=1e-6)


def test_pallas_populate_hello():
    check_parity("hello.fasta", "hello_rooted.nwk")


def test_pallas_populate_two_trees():
    check_parity("hello.fasta", "hello_rooted_two_trees.nwk")


def test_pallas_populate_five_taxon():
    check_parity("five_taxon.fasta", "five_taxon_rooted_more.nwk")


def test_pallas_hello_golden_marginal():
    """The kernel path reproduces the reference golden -84.77961943
    (gp_doctest.cpp:89-101)."""
    inst = make_instance("hello.fasta", "hello_rooted.nwk")
    eng = inst.get_engine()
    eng.use_pallas = True
    eng.pallas_interpret = True
    eng.branch_lengths = np.array([0.0, 0.22, 0.113, 0.15, 0.1])
    inst.populate_plvs()
    inst.compute_likelihoods()
    per_gpcsp = eng.get_per_gpcsp_log_likelihoods()
    np.testing.assert_allclose(per_gpcsp, -84.77961943, atol=1e-6)
    assert abs(eng.get_log_marginal_likelihood() - -84.77961943) < 1e-6


def test_pallas_full_fit_five_taxon():
    """Full coordinate ascent through the kernel path converges to the same
    marginal as the XLA path (and downstream consumers keep working)."""
    results = {}
    for use_pallas in (False, True):
        inst = make_instance("five_taxon.fasta", "five_taxon_rooted.nwk")
        eng = inst.get_engine()
        eng.use_pallas = use_pallas
        eng.pallas_interpret = use_pallas
        inst.hot_start_branch_lengths()
        inst.estimate_branch_lengths(1e-4, 10, quiet=True)
        inst.estimate_sbn_parameters()
        results[use_pallas] = eng.get_log_marginal_likelihood()
        assert isinstance(eng.get_per_gpcsp_log_likelihoods(), np.ndarray)
    # The optimization *path* is fp-sensitive (reduction orders differ);
    # both paths converge within the fit tolerance of the same optimum.
    assert abs(results[True] - results[False]) < 1e-4


def test_pallas_f32_interpret_tracks_f64():
    """float32 kernel numerics (the TPU production mode) track the f64 XLA
    marginal through populate + likelihoods."""
    inst64 = make_instance("five_taxon.fasta", "five_taxon_rooted_more.nwk")
    inst64.populate_plvs()
    inst64.compute_likelihoods()
    marg64 = inst64.get_engine().get_log_marginal_likelihood()

    inst32 = make_instance(
        "five_taxon.fasta", "five_taxon_rooted_more.nwk", dtype=np.float32
    )
    eng = inst32.get_engine()
    eng.use_pallas = True
    eng.pallas_interpret = True
    inst32.populate_plvs()
    inst32.compute_likelihoods()
    marg32 = eng.get_log_marginal_likelihood()
    assert abs(marg32 - marg64) < 1e-2 * (1 + abs(marg64))


@pytest.mark.slow
def test_device_ascent_matches_host_loop():
    """run_branch_ascent (one-program coordinate ascent) reproduces the
    host loop's fit on both populate paths (f64, CPU)."""
    for use_pallas in (False, True):
        res = {}
        for device_loop in (False, True):
            inst = make_instance("five_taxon.fasta", "five_taxon_rooted.nwk")
            eng = inst.get_engine()
            eng.use_pallas = use_pallas
            eng.pallas_interpret = use_pallas
            inst.hot_start_branch_lengths()
            inst.estimate_branch_lengths(
                1e-4, 10, quiet=True, device_loop=device_loop
            )
            res[device_loop] = (
                eng.get_log_marginal_likelihood(),
                eng.branch_lengths.copy(),
            )
        # The marginal evaluation orders differ (host: full rows path;
        # device: root rows only), so stopping points can differ by one
        # damping step — gate at fit-tolerance scale.
        assert abs(res[True][0] - res[False][0]) < 1e-6, (use_pallas, res)
        np.testing.assert_allclose(
            res[True][1], res[False][1], rtol=1e-3, atol=1e-8
        )
