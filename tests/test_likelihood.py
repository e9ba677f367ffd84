"""Likelihood and gradient parity tests vs pybeagle/physher golden numbers
(/root/reference/src/unrooted_sbn_instance.hpp:206-335)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libsbn_tpu.core.site_pattern import SitePattern
from libsbn_tpu.io import newick
from libsbn_tpu.io.fasta import Alignment
from libsbn_tpu.models.engine import LikelihoodEngine
from libsbn_tpu.models.phylo_model import PhyloModelSpec, default_parameters
from libsbn_tpu.ops import schedule

PYBEAGLE_LIKELIHOODS = [
    -14582.995273982739, -6911.294207416366, -6916.880235529542,
    -6904.016888831189, -6915.055570693576, -6915.50496696512,
    -6910.958836661867, -6909.02639968063, -6912.967861935749,
    -6910.7871105783515,
]

PHYSHER_GRADIENTS = [
    -904.18956, -607.70500, -562.36274, -553.63315, -542.26058, -539.64210,
    -463.36511, -445.32555, -414.27197, -412.84218, -399.15359, -342.68038,
    -306.23644, -277.05392, -258.73681, -175.07391, -171.59627, -168.57646,
    -150.57623, -145.38176, -115.15798, -94.86412, -83.02880, -80.09165,
    -69.00574, -51.93337, 0.00000, 0.00000, 16.17497, 20.47784,
    58.06984, 131.18998, 137.10799, 225.73617, 233.92172, 253.49785,
    255.52967, 259.90378, 394.00504, 394.96619, 396.98933, 429.83873,
    450.71566, 462.75827, 471.57364, 472.83161, 514.59289, 650.72575,
    888.87834, 913.96566, 927.14730, 959.10746, 2296.55028,
]

PHYSHER_WEIBULL_LIKELIHOODS = [
    -9456.1201098061, -6624.4110704332, -6623.4474776131, -6617.25658038029,
    -6627.5385571548, -6621.6155048722, -6622.3314942713, -6618.7695717585,
    -6616.3837517370, -6623.8295828648,
]

PHYSHER_WEIBULL_GRADIENTS_BL0 = [
    -126.890527, 157.251275, 138.202510, -180.311856, 417.562897, -796.450894,
    -173.744375, -70.693513, 699.190754, -723.034349,
]


@pytest.fixture(scope="module")
def ds1(data_dir):
    tops, bls, ttm = newick.parse_nexus_file(f"{data_dir}/DS1.subsampled_10.t")
    aln = Alignment.read_fasta(f"{data_dir}/DS1.fasta")
    sp = SitePattern(aln, ttm)
    sched = schedule.schedules_of_topologies(tops)
    bl = np.stack([b for b in bls])
    return sched, bl, sp


def test_hello_likelihood(data_dir):
    tops, bls, ttm = newick.parse_newick_file(f"{data_dir}/hello.nwk")
    aln = Alignment.read_fasta(f"{data_dir}/hello.fasta")
    sp = SitePattern(aln, ttm)
    spec = PhyloModelSpec("JC69", "constant", "strict")
    engine = LikelihoodEngine(sp, spec)
    sched = schedule.schedules_of_topologies(tops)
    lls = engine.log_likelihoods(sched, np.stack(bls), default_parameters(spec))
    assert abs(float(lls[0]) - (-84.852358)) < 1e-6


@pytest.mark.parametrize("rescale", [False, True])
def test_ds1_likelihoods(ds1, rescale):
    sched, bl, sp = ds1
    spec = PhyloModelSpec("JC69", "constant", "strict")
    engine = LikelihoodEngine(sp, spec, rescale=rescale)
    lls = engine.log_likelihoods(sched, bl, default_parameters(spec))
    np.testing.assert_allclose(lls, PYBEAGLE_LIKELIHOODS, atol=1.1e-4)


@pytest.mark.parametrize("rescale", [False, True])
def test_ds1_branch_gradients(ds1, rescale):
    sched, bl, sp = ds1
    spec = PhyloModelSpec("JC69", "constant", "strict")
    engine = LikelihoodEngine(sp, spec, rescale=rescale)
    lls, grads = engine.branch_gradients(sched, bl, default_parameters(spec))
    np.testing.assert_allclose(lls, PYBEAGLE_LIKELIHOODS, atol=1.1e-4)
    # The reference's detrifurcated layout has two structural zeros (root +
    # fixed root child, fat_beagle.cpp:498-499); ours is the trifurcating
    # layout with 2n-3 real edges.
    mine = sorted(np.asarray(grads[-1]).tolist() + [0.0, 0.0])
    np.testing.assert_allclose(mine, PHYSHER_GRADIENTS, atol=1e-4)


def test_ds1_weibull(ds1):
    sched, bl, sp = ds1
    spec = PhyloModelSpec("JC69", "weibull+4", "strict")
    engine = LikelihoodEngine(sp, spec)
    params = default_parameters(spec)
    params["site"]["shape"] = jnp.asarray(0.1)
    lls = engine.log_likelihoods(sched, bl, params)
    np.testing.assert_allclose(lls, PHYSHER_WEIBULL_LIKELIHOODS, atol=1.1e-4)
    lls2, grads = engine.branch_gradients(sched, bl, params)
    np.testing.assert_allclose(
        grads[:, 0], PHYSHER_WEIBULL_GRADIENTS_BL0, atol=1.1e-4
    )


def test_branch_gradient_matches_ad(ds1):
    """The linear-time two-pass gradient must equal AD through the scan."""
    sched, bl, sp = ds1
    spec = PhyloModelSpec("JC69", "constant", "strict")
    engine = LikelihoodEngine(sp, spec)
    params = default_parameters(spec)
    _, grads = engine.branch_gradients(sched, bl, params)

    def ll_of_bl(b):
        return engine.log_likelihoods(sched, bl_mod, params)[0]

    bl_mod = bl.copy()

    def f(b0):
        blx = jnp.asarray(bl[0]).at[:].set(b0)
        return engine.log_likelihoods(
            sched, jnp.broadcast_to(blx, bl.shape), params
        )[0]

    ad_grad = jax.grad(f)(jnp.asarray(bl[0]))
    np.testing.assert_allclose(grads[0], ad_grad[:-1], rtol=1e-8, atol=1e-8)


def test_tip_states_mode_matches_tip_partials(ds1):
    """use_tip_states (fat_beagle.cpp:207-256): 1-byte tip codes expanded
    on the fly give bit-identical LLs and gradients to dense tip
    partials (the reference asserts both modes against the same goldens,
    unrooted_sbn_instance.hpp:225-232)."""
    sched, bls, sp = ds1
    import numpy as np

    from libsbn_tpu.models.engine import LikelihoodEngine
    from libsbn_tpu.models.phylo_model import (
        PhyloModelSpec, default_parameters,
    )

    spec = PhyloModelSpec("JC69", "constant", "strict")
    dense = LikelihoodEngine(sp, spec)
    states = LikelihoodEngine(sp, spec, use_tip_states=True)
    params = default_parameters(spec)
    bl = np.stack(bls)
    ll_d = np.asarray(dense.log_likelihoods(sched, bl, params))
    ll_s = np.asarray(states.log_likelihoods(sched, bl, params))
    np.testing.assert_array_equal(ll_d, ll_s)
    _, g_d = dense.branch_gradients(sched, bl, params)
    _, g_s = states.branch_gradients(sched, bl, params)
    np.testing.assert_array_equal(np.asarray(g_d), np.asarray(g_s))
    # The resident representation really is codes, not partials.
    assert states._tips is None
    assert states._tip_codes.dtype == np.int32


@pytest.mark.slow
def test_gtr_weibull_batched_100_topologies(data_dir):
    """BASELINE.json config: batched GTR + 4-category likelihood over
    DS1.100_topologies.nwk (one vmapped program across all 100 trees)."""
    import jax.numpy as jnp

    from libsbn_tpu.models.engine import LikelihoodEngine
    from libsbn_tpu.models.phylo_model import (
        PhyloModelSpec, default_parameters,
    )

    tops, bls, ttm = newick.parse_newick_file(
        f"{data_dir}/DS1.100_topologies.nwk"
    )
    assert len(tops) == 100
    sp = SitePattern(Alignment.read_fasta(f"{data_dir}/DS1.fasta"), ttm)
    spec = PhyloModelSpec("GTR", "weibull+4", "strict")
    eng = LikelihoodEngine(sp, spec)
    params = default_parameters(spec)
    params["site"] = {"shape": jnp.asarray(0.5)}
    sched = schedule.schedules_of_topologies(tops)
    bl = np.full((100, sched.post_node.shape[0] and len(bls[0])), 0.1)
    lls = np.asarray(eng.log_likelihoods(sched, bl, params))
    assert lls.shape == (100,) and np.all(np.isfinite(lls))
    # The MCMC-sampled file repeats topologies; distinct ones give
    # distinct likelihoods at shared lengths.
    assert len(np.unique(np.round(lls, 6))) > 10
    g = eng.phylo_gradients(sched, bl, params)
    assert np.all(np.isfinite(np.asarray(g["branch_lengths"])))
    assert np.all(np.isfinite(np.asarray(g["substitution_model"])))
    assert np.all(np.isfinite(np.asarray(g["site_model"])))
