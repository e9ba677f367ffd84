"""Forest (cross-tree sharing) engine vs the per-tree engine.

The forest mode evaluates a collection under split-keyed branch lengths
(the GP-hot-start / SplitModel regime). Its LLs and per-branch gradients
must equal the classic per-tree kernels exactly (same math, shared order);
reference mechanism being replaced: one-BEAGLE-instance-per-tree
(fat_beagle.hpp:119-149)."""

import os
import jax.numpy as jnp
import numpy as np
import pytest

from libsbn_tpu.core.site_pattern import SitePattern
from libsbn_tpu.io.fasta import Alignment
from libsbn_tpu.io import newick
from libsbn_tpu.ops import forest, pruning, schedule, substitution

DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data"
)


def _load(newick_name, fasta_name):
    tops, _, ttm = newick.parse_newick_file(f"{DATA}/{newick_name}")
    sp = SitePattern(Alignment.read_fasta(f"{DATA}/{fasta_name}"), ttm)
    return tops, sp


def _forest_vs_pertree(tops, sp, rtol):
    for t in tops:
        t.polish()
    fs = forest.build_forest(tops)
    rng = np.random.default_rng(7)
    bl_splits = rng.uniform(0.02, 0.2, fs.n_splits)

    freqs, evec, ivec, evals = substitution.jc69_eigen()
    rates = jnp.ones(1)
    props = jnp.ones(1)
    Q = substitution.jc69_q()[None]
    tips = jnp.asarray(sp.tip_partials())
    w = jnp.asarray(sp.weights)

    ll_f, grad_f = forest.forest_log_likelihoods_and_gradients(
        fs, jnp.asarray(bl_splits), evec, ivec, evals, Q, tips, freqs,
        rates, props, w,
    )
    ll_f, grad_f = np.asarray(ll_f), np.asarray(grad_f)

    for ti, top in enumerate(tops):
        sched = schedule.schedule_of_topology(top)
        bl = fs.tree_branch_lengths(top, bl_splits)
        bl_p = jnp.asarray(np.concatenate([bl, [0.0]]))
        P = pruning.node_transition_matrices(evec, ivec, evals, bl_p, rates)
        ll, grad = pruning.log_likelihood_and_branch_gradient(
            sched, P, Q, tips, freqs, props, w, True
        )
        np.testing.assert_allclose(ll_f[ti], float(ll), rtol=rtol)
        np.testing.assert_allclose(
            grad_f[ti], np.asarray(grad), rtol=rtol, atol=1e-9
        )
    return fs


def test_forest_five_taxon():
    tops, sp = _load("five_taxon_unrooted.nwk", "five_taxon.fasta")
    fs = _forest_vs_pertree(tops, sp, 1e-9)
    stats = forest.forest_stats(fs)
    # These four random topologies are rooted inconsistently, so sharing is
    # incidental; the point of this case is exact numerics.
    assert stats["op_sharing"] >= 1.0


def _forest_jc_vs_generic(tops, sp):
    """The matrix-free JC69 path must match the generic einsum path in f64."""
    for t in tops:
        t.polish()
    fs = forest.build_forest(tops)
    rng = np.random.default_rng(3)
    bl_splits = jnp.asarray(rng.uniform(0.02, 0.2, fs.n_splits))
    freqs, evec, ivec, evals = substitution.jc69_eigen()
    tips = jnp.asarray(sp.tip_partials())
    w = jnp.asarray(sp.weights)
    ll_g, grad_g = forest.forest_log_likelihoods_and_gradients(
        fs, bl_splits, evec, ivec, evals, substitution.jc69_q()[None],
        tips, freqs, jnp.ones(1), jnp.ones(1), w,
    )
    ll_j, grad_j = forest.forest_jc_log_likelihoods_and_gradients(
        fs, bl_splits, tips, w, dtype=jnp.float64
    )
    np.testing.assert_allclose(np.asarray(ll_j), np.asarray(ll_g), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(grad_j), np.asarray(grad_g), rtol=1e-8, atol=1e-9
    )
    ll_o, none = forest.forest_jc_log_likelihoods_and_gradients(
        fs, bl_splits, tips, w, dtype=jnp.float64, ll_only=True
    )
    assert none is None
    np.testing.assert_allclose(np.asarray(ll_o), np.asarray(ll_g), rtol=1e-10)


def test_forest_jc_five_taxon():
    tops, sp = _load("five_taxon_unrooted.nwk", "five_taxon.fasta")
    _forest_jc_vs_generic(tops, sp)


@pytest.mark.slow
def test_forest_jc_ds1_100():
    tops, sp = _load("DS1.100_topologies.nwk", "DS1.fasta")
    _forest_jc_vs_generic(tops, sp)


def test_forest_rooted_trees():
    """Rooted (binary-root) collections share through the same machinery."""
    tops, sp = _load("hello_rooted_two_trees.nwk", "hello.fasta")
    _forest_vs_pertree(tops, sp, 1e-9)


@pytest.mark.slow
def test_forest_ds1_100_topologies():
    """The headline sharing workload: 100 MCMC topologies over DS1."""
    tops, sp = _load("DS1.100_topologies.nwk", "DS1.fasta")
    fs = _forest_vs_pertree(tops, sp, 1e-8)
    stats = forest.forest_stats(fs)
    # Measured round 4: 2500 -> 292 internal combines, 5100 -> 2424 upper
    # partials, 5100 -> 2805 unique edges (op_sharing ~2.4). Regression-guard
    # the dedup itself, loosely.
    assert stats["op_sharing"] > 2.0
    assert stats["down_internal_unique"] < 400


def test_forest_weighted_split_gradient():
    """One reverse pass through the shared down DAG == aggregating the
    per-tree edge gradients onto splits (the split-keyed optimization
    surface; GP-hot-start-style ascent)."""
    tops, sp = _load("five_taxon_unrooted.nwk", "five_taxon.fasta")
    for t in tops:
        t.polish()
    fs = forest.build_forest(tops)
    rng = np.random.default_rng(1)
    bl = jnp.asarray(rng.uniform(0.02, 0.2, fs.n_splits))
    tips = jnp.asarray(sp.tip_partials())
    w = jnp.asarray(sp.weights)
    lam = jnp.asarray(rng.uniform(0.5, 1.5, fs.tree_count))

    ll_w, g_ad = forest.forest_jc_weighted_ll_and_split_gradient(
        fs, bl, tips, w, lam=lam, dtype=jnp.float64
    )
    ll, grad = forest.forest_jc_log_likelihoods_and_gradients(
        fs, bl, tips, w, dtype=jnp.float64
    )
    np.testing.assert_allclose(np.asarray(ll_w), np.asarray(ll), rtol=1e-12)
    g_ref = np.zeros(fs.n_splits)
    for ti, top in enumerate(tops):
        for node in top.postorder():
            if node.id == top.id:
                continue
            sidx = fs.split_of_clade[forest._clade_mask(node)]
            g_ref[sidx] += float(lam[ti]) * float(grad[ti, node.id])
    np.testing.assert_allclose(
        np.asarray(g_ad), g_ref, rtol=1e-8, atol=1e-10
    )


def test_forest_branch_ascent():
    """The forest ascent (collection analog of EstimateBranchLengths,
    gp_instance.cpp:129-175) improves the summed LL, lands near a
    stationary point, and its optimum re-evaluates identically through
    the per-tree engine."""
    tops, sp = _load("five_taxon_unrooted.nwk", "five_taxon.fasta")
    for t in tops:
        t.polish()
    fs = forest.build_forest(tops)
    tips = jnp.asarray(sp.tip_partials())
    w = jnp.asarray(sp.weights)
    bl0 = np.full(fs.n_splits, 0.1)

    bl, ll, trace = forest.forest_branch_ascent(
        fs, bl0, tips, w, steps=400, lr=0.05, dtype=jnp.float64
    )
    assert float(trace[-1]) > float(trace[0]) + 1.0
    # Stationarity: aggregated gradient small at the optimum.
    _, g = forest.forest_jc_weighted_ll_and_split_gradient(
        fs, bl, tips, w, dtype=jnp.float64
    )
    assert float(jnp.max(jnp.abs(g * bl))) < 0.05  # log-space gradient

    # Cross-check the optimum through the classic per-tree engine.
    freqs, evec, ivec, evals = substitution.jc69_eigen()
    for ti, top in enumerate(tops):
        sched = schedule.schedule_of_topology(top)
        bl_t = jnp.asarray(
            np.concatenate([fs.tree_branch_lengths(top, np.asarray(bl)),
                            [0.0]])
        )
        P = pruning.node_transition_matrices(
            evec, ivec, evals, bl_t, jnp.ones(1)
        )
        ll_t, _ = pruning.log_likelihood_and_branch_gradient(
            sched, P, substitution.jc69_q()[None], tips, freqs,
            jnp.ones(1), w, True,
        )
        np.testing.assert_allclose(float(ll[ti]), float(ll_t), rtol=1e-9)


def test_forest_split_canonicalization_across_rootings():
    """The same unrooted branch in differently-rooted trees must share ONE
    split id (the reference's canonical split semantics: SplitModel /
    HotStartBranchLengths key by unordered bipartition)."""
    nwk = "(t0,t1,(t2,(t3,t4)));\n(t3,t4,(t2,(t0,t1)));\n"
    tops, _, _ = newick.parse_newick_string(nwk)
    for t in tops:
        t.polish()
    fs = forest.build_forest(tops)
    # 5 pendant splits + 2 internal splits + the (garbage) full-clade root
    # slot = 8; without canonicalization the two internal splits would each
    # appear under both orientations (10).
    assert fs.n_splits == 8
    m34 = (1 << 3) | (1 << 4)
    full = (1 << 5) - 1
    assert fs.split_of_clade[m34] == fs.split_of_clade[full ^ m34]
    m01 = (1 << 0) | (1 << 1)
    assert fs.split_of_clade[m01] == fs.split_of_clade[full ^ m01]

    # Same unrooted tree under shared split-keyed branch lengths ->
    # identical likelihoods.
    rng = np.random.default_rng(3)
    bl_splits = jnp.asarray(rng.uniform(0.02, 0.2, fs.n_splits))
    freqs, evec, ivec, evals = substitution.jc69_eigen()
    rng2 = np.random.default_rng(0)
    tips = jnp.asarray(rng2.dirichlet(np.ones(4), size=(5, 20)).transpose(0, 2, 1))
    w = jnp.ones(20)
    ll, _ = forest.forest_log_likelihoods_and_gradients(
        fs, bl_splits, evec, ivec, evals, substitution.jc69_q()[None],
        tips, freqs, jnp.ones(1), jnp.ones(1), w,
    )
    np.testing.assert_allclose(float(ll[0]), float(ll[1]), rtol=1e-12)


@pytest.mark.slow
def test_forest_large_taxon_masks():
    """69-taxon clade masks exceed int64 — the schedule must keep Python
    ints (round-5 fix) and still evaluate correctly on a 1-tree forest."""
    tops, bls, ttm = newick.parse_newick_file(f"{DATA}/fluA.tree")
    for t in tops:
        t.polish()
    fs = forest.build_forest(tops)
    assert fs.leaf_count == 69
    assert max(fs.split_of_clade) >> 63 > 0  # masks genuinely >63 bits
    sp = SitePattern(Alignment.read_fasta(f"{DATA}/fluA.fa"), ttm)
    bl_splits = fs.branch_lengths_from_tree(tops[0], bls[0])
    ll, grad = forest.forest_jc_log_likelihoods_and_gradients(
        fs, jnp.asarray(bl_splits), jnp.asarray(sp.tip_partials()),
        jnp.asarray(sp.weights), dtype=jnp.float64,
    )
    # Cross-check against the per-tree engine.
    sched = schedule.schedule_of_topology(tops[0])
    freqs, evec, ivec, evals = substitution.jc69_eigen()
    bl_p = jnp.asarray(np.concatenate([fs.tree_branch_lengths(tops[0], bl_splits), [0.0]]))
    P = pruning.node_transition_matrices(evec, ivec, evals, bl_p, jnp.ones(1))
    ll_t, grad_t = pruning.log_likelihood_and_branch_gradient(
        sched, P, substitution.jc69_q()[None], jnp.asarray(sp.tip_partials()),
        freqs, jnp.ones(1), jnp.asarray(sp.weights), True,
    )
    np.testing.assert_allclose(float(ll[0]), float(ll_t), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(grad[0]), np.asarray(grad_t), rtol=1e-8, atol=1e-9
    )
