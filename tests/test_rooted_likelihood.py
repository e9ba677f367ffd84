"""Rooted time-tree parity tests vs physher/phylotorch golden numbers
(/root/reference/src/rooted_sbn_instance.hpp:246-378)."""

import jax.numpy as jnp
import numpy as np
import pytest

from libsbn_tpu.core.site_pattern import SitePattern
from libsbn_tpu.core.tree import RootedTree, RootedTreeCollection
from libsbn_tpu.io import newick
from libsbn_tpu.io.fasta import Alignment
from libsbn_tpu.models.engine import LikelihoodEngine
from libsbn_tpu.models.phylo_model import PhyloModelSpec, default_parameters
from libsbn_tpu.ops import schedule

import os

DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data"
)

PHYSHER_LL = -4777.616349
PHYSHER_JACOBIAN = -9.25135166

PHYSHER_RATIO_GRADIENTS = [
    -0.593654, 6.441290, 11.202945, 5.173924, -0.904631, 2.731402, 3.157131,
    7.082914, 10.305417, 13.988206, 20.709336, 48.897993, 99.164949, 130.205747,
    17.314019, 21.033290, -1.336335, 12.259822, 22.887291, 27.176564, 47.487426,
    3.637276, 12.955169, 15.315953, 83.254605, -3.806996, 105.385095, 4.874023,
    22.754466, 6.036534, 25.651478, 29.535185, 29.598789, 1.817247, 10.598685,
    76.259248, 56.481423, 10.679778, 6.587179, 3.330556, -4.622247, 33.417304,
    63.415767, 188.809515, 23.540875, 17.421076, 1.222568, 22.372012, 34.239511,
    3.486115, 4.098873, 13.200954, 19.726890, 96.808738, 4.240029, 7.414585,
    48.871694, 3.488516, 82.969065, 9.009334, 8.032474, 3.981016, 6.543650,
    53.702423, 37.835952, 2.840831, 7.517186, 19.936861,
]


@pytest.fixture(scope="module")
def flu(data_dir):
    tops, bls, ttm = newick.parse_newick_file(f"{data_dir}/fluA.tree")
    coll = RootedTreeCollection(
        [RootedTree(t, b) for t, b in zip(tops, bls)], ttm
    )
    coll.parse_dates_from_taxon_names(True)
    aln = Alignment.read_fasta(f"{data_dir}/fluA.fa")
    sp = SitePattern(aln, ttm)
    tree = coll.trees[0]
    sched = schedule.batch_schedules(
        [schedule.schedule_of_topology(t.topology) for t in coll.trees]
    )
    bounds = np.stack([t.node_bounds for t in coll.trees])
    ratios = np.stack([t.height_ratios for t in coll.trees])
    rates = np.full((len(coll.trees), tree.node_count() - 1), 0.001)
    return sched, bounds, ratios, rates, sp


def test_flu_strict_clock_ll(flu):
    sched, bounds, ratios, rates, sp = flu
    spec = PhyloModelSpec("JC69", "constant", "strict")
    engine = LikelihoodEngine(sp, spec)
    lls, ldjs = engine.rooted_log_likelihoods(
        sched, bounds, ratios, rates, default_parameters(spec), return_parts=True
    )
    assert abs(float(lls[0]) - PHYSHER_LL) < 1e-4
    assert abs(float(ldjs[0]) - PHYSHER_JACOBIAN) < 1e-4


def test_flu_ratio_gradients(flu):
    sched, bounds, ratios, rates, sp = flu
    spec = PhyloModelSpec("JC69", "constant", "strict")
    engine = LikelihoodEngine(sp, spec)
    g = engine.rooted_phylo_gradients(
        sched, bounds, ratios, rates, default_parameters(spec)
    )
    assert abs(float(g["log_likelihood"][0]) - PHYSHER_LL) < 1e-4
    np.testing.assert_allclose(
        g["ratios_root_height"][0], PHYSHER_RATIO_GRADIENTS, atol=1e-4
    )


def test_flu_clock_gradients_vs_finite_differences(flu):
    sched, bounds, ratios, rates, sp = flu
    spec = PhyloModelSpec("JC69", "constant", "strict")
    engine = LikelihoodEngine(sp, spec)
    params = default_parameters(spec)
    g = engine.rooted_phylo_gradients(sched, bounds, ratios, rates, params)
    # Central finite differences on the strict clock rate (the reference's
    # DerivativeStrictClock device, rooted_sbn_instance.hpp:57-80).
    eps = 1e-7

    def ll_at(rate_val):
        r = np.full_like(rates, rate_val)
        lls, _ = engine.rooted_log_likelihoods(
            sched, bounds, ratios, r, params, return_parts=True
        )
        return float(lls[0])

    fd = (ll_at(0.001 + eps) - ll_at(0.001 - eps)) / (2 * eps)
    assert abs(float(g["clock_model"][0][0]) - fd) < 1e-3 * max(1.0, abs(fd))

    # Relaxed clock: per-branch rates with variation.
    relaxed = rates.copy()
    n = relaxed.shape[1]
    relaxed[0] *= np.arange(n) % 3 + 1.0
    g2 = engine.rooted_phylo_gradients(
        sched, bounds, ratios, relaxed, params, strict_clock=False
    )
    for j in [0, 1, n // 2, n - 1]:
        rp = relaxed.copy()
        rp[0, j] += eps
        rm = relaxed.copy()
        rm[0, j] -= eps
        llp, _ = engine.rooted_log_likelihoods(sched, bounds, ratios, rp, params, True)
        llm, _ = engine.rooted_log_likelihoods(sched, bounds, ratios, rm, params, True)
        fd_j = (float(llp[0]) - float(llm[0])) / (2 * eps)
        assert abs(float(g2["clock_model"][0][j]) - fd_j) < 1e-3 * max(1.0, abs(fd_j))


def test_flu_gtr(flu):
    sched, bounds, ratios, rates, sp = flu
    spec = PhyloModelSpec("GTR", "constant", "strict")
    engine = LikelihoodEngine(sp, spec)
    params = default_parameters(spec)
    params["substitution"] = {
        "rates": jnp.asarray([0.05, 0.1, 0.15, 0.20, 0.25, 0.25]),
        "frequencies": jnp.asarray([0.1, 0.2, 0.3, 0.4]),
    }
    phylotorch_ll = -5221.438941335706
    lls, ldjs = engine.rooted_log_likelihoods(
        sched, bounds, ratios, rates, params, return_parts=True
    )
    assert abs(float(lls[0]) - phylotorch_ll) < 1e-3
    assert abs(float(ldjs[0]) - PHYSHER_JACOBIAN) < 1e-4

    g = engine.rooted_phylo_gradients(sched, bounds, ratios, rates, params)
    phylotorch_gradients = [
        49.06451538, 151.83105912, 26.40235659, -8.25135661,
        75.29759338, 352.56545247, 90.07046995, 30.12301652,
    ]
    np.testing.assert_allclose(
        np.asarray(g["substitution_model"])[0], phylotorch_gradients, atol=1e-3
    )
    assert abs(float(g["log_likelihood"][0]) - phylotorch_ll) < 1e-3


def test_flu_weibull(flu):
    sched, bounds, ratios, rates, sp = flu
    spec = PhyloModelSpec("JC69", "weibull+4", "strict")
    engine = LikelihoodEngine(sp, spec)
    params = default_parameters(spec)
    params["site"]["shape"] = jnp.asarray(0.1)
    physher_ll = -4618.2062529058
    lls, ldjs = engine.rooted_log_likelihoods(
        sched, bounds, ratios, rates, params, return_parts=True
    )
    assert abs(float(lls[0]) - physher_ll) < 1e-4
    g = engine.rooted_phylo_gradients(sched, bounds, ratios, rates, params)
    assert abs(float(np.asarray(g["site_model"])[0]) - (-5.231329)) < 1e-3
    assert abs(float(g["log_likelihood"][0]) - physher_ll) < 1e-3


def test_stick_breaking_vs_pytorch():
    from libsbn_tpu.ops import transforms

    y = jnp.array([1.0, 2.0, 3.0])
    x = transforms.stick_breaking(y)
    np.testing.assert_allclose(
        x, [0.475367, 0.412879, 0.106454, 0.00530004], atol=1e-5
    )
    yy = transforms.stick_breaking_inverse(x)
    np.testing.assert_allclose(yy, y, atol=1e-5)
    j = transforms.stick_breaking_log_abs_det_jacobian(x, y)
    assert abs(float(j) - (-9.108352)) < 1e-5


def test_heights_squaring_matches_sweeps():
    """The affine-map 'squaring' lowering of the heights fixed point and
    its adjoint equals the sweep lowering exactly (opt-in path,
    engine.heights_method; ops/heights.py)."""
    from libsbn_tpu.io import newick as newick_io
    from libsbn_tpu.ops import heights as H
    from libsbn_tpu.ops import schedule as schedule_ops

    tops, bls, ttm = newick_io.parse_newick_file(f"{DATA}/fluA.tree")
    sch = schedule_ops.schedule_of_topology(tops[0])
    n, L = sch.node_count, sch.leaf_count
    pre_n = jnp.asarray(sch.pre_internal_node)
    pre_p = jnp.asarray(sch.pre_internal_parent)
    par = jnp.asarray(sch.parent)
    rng = np.random.default_rng(1)
    bounds = np.zeros(n)
    bounds[:L] = rng.uniform(0.0, 0.5, L)
    for step in range(sch.post_node.shape[0]):
        v = int(sch.post_node[step])
        kids = sch.post_children[step]
        bounds[v] = max(bounds[int(k)] for k in kids if int(k) < n)
    bounds = jnp.asarray(bounds)
    ratios = jnp.asarray(np.clip(rng.uniform(0.2, 0.8, L - 1), 1e-3, 1 - 1e-3))
    ratios = ratios.at[-1].set(float(bounds[-1]) + 1.0)
    rates = jnp.asarray(rng.uniform(0.5, 2.0, n - 1))
    g = jnp.asarray(rng.normal(size=(n - 1,)))
    for n_it in (32, 37):
        h1 = H.node_heights_from_ratios(
            ratios, bounds, L, pre_n, pre_p, n_iters=n_it
        )
        h2 = H.node_heights_from_ratios(
            ratios, bounds, L, pre_n, pre_p, n_iters=n_it, method="squaring"
        )
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-13)
        d1 = H.ratio_and_rate_gradients_from_branch_gradient(
            g, ratios, bounds, rates, L, pre_n, pre_p, par, n_it
        )
        d2 = H.ratio_and_rate_gradients_from_branch_gradient(
            g, ratios, bounds, rates, L, pre_n, pre_p, par, n_it,
            method="squaring",
        )
        np.testing.assert_allclose(
            np.asarray(d1[0]), np.asarray(d2[0]), atol=1e-10
        )
        np.testing.assert_allclose(np.asarray(d1[1]), np.asarray(d2[1]))


def test_hand_chain_jacobian_guard_no_nan():
    """A leaf whose height coincides with its parent's (zero-length
    pendant branch) must not NaN the ratio gradient (round-5 review
    finding: 0 * inf in the masked Jacobian rows)."""
    from libsbn_tpu.io import newick as newick_io
    from libsbn_tpu.ops import heights as H
    from libsbn_tpu.ops import schedule as schedule_ops

    tops, bls, ttm = newick_io.parse_newick_file(f"{DATA}/fluA.tree")
    sch = schedule_ops.schedule_of_topology(tops[0])
    n, L = sch.node_count, sch.leaf_count
    pre_n = jnp.asarray(sch.pre_internal_node)
    pre_p = jnp.asarray(sch.pre_internal_parent)
    par = jnp.asarray(sch.parent)
    rng = np.random.default_rng(2)
    bounds = np.zeros(n)
    bounds[:L] = rng.uniform(0.0, 0.5, L)
    for step in range(sch.post_node.shape[0]):
        v = int(sch.post_node[step])
        kids = sch.post_children[step]
        bounds[v] = max(bounds[int(k)] for k in kids if int(k) < n)
    # Force a CHERRY parent's height onto its bound: its max-date LEAF
    # child gets a zero-length pendant branch (h_parent - b_leaf = 0) —
    # the masked-row 0*inf scenario (an internal child sharing the bound
    # would instead be a genuine log(0) singularity of the Jacobian).
    ratios = np.clip(rng.uniform(0.2, 0.8, L - 1), 1e-3, 1 - 1e-3)
    kids_of = {}
    for step in range(sch.post_node.shape[0]):
        v = int(sch.post_node[step])
        kids_of[v] = [int(k) for k in sch.post_children[step] if int(k) < n]
    cherry = next(
        v for v, ks in kids_of.items() if all(k < L for k in ks)
    )
    ratios[cherry - L] = 0.0
    bounds = jnp.asarray(bounds)
    ratios = jnp.asarray(ratios)
    ratios = ratios.at[-1].set(float(bounds[-1]) + 1.0)
    rates = jnp.asarray(rng.uniform(0.5, 2.0, n - 1))
    g = jnp.asarray(rng.normal(size=(n - 1,)))
    dr, dk, h = H.ratio_and_rate_gradients_from_branch_gradient(
        g, ratios, bounds, rates, L, pre_n, pre_p, par, 32
    )
    assert bool(jnp.all(jnp.isfinite(dr))), np.asarray(dr)
    assert bool(jnp.all(jnp.isfinite(dk)))
