"""End-to-end vip-benchmark and optimizer behavior tests."""

import os
import shutil

import numpy as np
import pytest

from libsbn_tpu.vi import benchmark, optimizers, scalar_models

DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data"
)


@pytest.fixture()
def hello_data_dir(tmp_path):
    d = tmp_path / "hello"
    d.mkdir()
    shutil.copy(f"{DATA}/hello_out.t", d / "hello_out.t")
    shutil.copy(f"{DATA}/hello.fasta", d / "hello.fasta")
    return str(d)


@pytest.mark.parametrize("optimizer_name", ["simple", "bump"])
def test_benchmark_fixed(hello_data_dir, optimizer_name):
    """vip benchmark end-to-end (vip/benchmark.py fixed)."""
    run_details, opt_trace, fitting = benchmark.fixed(
        hello_data_dir,
        branch_model_name="split",
        scalar_model_name="lognormal",
        optimizer_name=optimizer_name,
        step_count=4,
        particle_count=3,
        final_elbo_particle_count=50,
    )
    assert np.isfinite(run_details["final_elbo"])
    assert run_details["gradient_time"] > 0
    assert fitting["vb_sample"].shape[0] > 0
    if optimizer_name == "bump":
        assert len(opt_trace) == 4  # one windowed-ELBO estimate per step


def test_bump_optimizer_turnaround():
    """BumpStepsizeOptimizer grows the stepsize, then restores the best
    parameters when the windowed ELBO drops (optimizers.py:83-127)."""

    class FakeInst:
        sbn_parameters = np.zeros(4)

    model = scalar_models.LogNormalModel(3)
    elbos = iter([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 5.0, 1.0, 0.5, 0.2,
                  0.1, 0.05, 0.02, 0.01, 0.005, 0.001])

    opt = optimizers.BumpStepsizeOptimizer(
        FakeInst(), model, lambda particle_count: next(elbos)
    )
    initial_step = opt.step_size.copy()
    grads = {
        "scalar_params": np.full_like(model.q_params, 0.1),
        "sbn_params": np.zeros(4),
    }
    for _ in range(13):
        opt.gradient_step(grads)
    assert not opt.stepsize_increasing  # turned around after the window drop
    # Step size decayed from its peak.
    assert np.all(opt.step_size < initial_step * 1.2**13)


def test_simple_optimizer_halves_on_nonfinite():
    class FakeInst:
        sbn_parameters = np.zeros(4)

    model = scalar_models.LogNormalModel(3)
    opt = optimizers.SimpleOptimizer(FakeInst(), model, lambda particle_count: 0.0)
    step0 = opt.step_size.copy()
    bad = {
        "scalar_params": np.full_like(model.q_params, np.nan),
        "sbn_params": np.zeros(4),
    }
    opt.gradient_step(bad)
    np.testing.assert_allclose(opt.step_size, step0 / 2)


def test_gp_sbn_update_prefers_hybrids():
    """UpdateSBNProbabilities uses hybrid marginals when available
    (gp_engine.cpp:137-156)."""
    from libsbn_tpu.gp import GPInstance

    inst = GPInstance()
    inst.read_fasta_file(f"{DATA}/7-taxon-slice-of-ds1.fasta")
    inst.read_newick_file(f"{DATA}/simplest-hybrid-marginal.nwk")
    inst.make_engine()
    eng = inst.get_engine()
    rng = np.random.default_rng(3)
    eng.branch_lengths = rng.uniform(1e-6, 0.1, inst.dag.gpcsp_count_with_fake())
    inst.populate_plvs()
    inst.compute_likelihoods()
    q_without = None
    eng.update_sbn_probabilities()
    q_without = eng.q.copy()

    # Reset prior, compute hybrids, re-update: ranges covered by hybrids can
    # differ from the per-gpcsp-LL result.
    eng.q = inst.dag.build_uniform_on_topological_support_prior()
    inst.calculate_hybrid_marginals()
    inst.compute_likelihoods()
    eng.update_sbn_probabilities()
    assert np.all(np.isfinite(eng.q))
    # Every sibling block still sums to one.
    for start, stop in inst.dag.parent_to_range.values():
        assert abs(eng.q[start:stop].sum() - 1.0) < 1e-9
    assert abs(eng.q[: inst.dag.rootsplit_count()].sum() - 1.0) < 1e-9
