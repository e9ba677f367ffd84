"""Per-tree phylo-model parameter matrix + assorted binding-parity APIs
(generic_sbn_instance.hpp:221-270, pylibsbn.cpp:192-200,231,378,388-413)."""

import pytest
import csv
import os
import tempfile

import numpy as np

from libsbn_tpu import RootedInstance, UnrootedInstance
from libsbn_tpu import ratio_gradient_of_height_gradient
from libsbn_tpu.models.phylo_model import (
    PhyloModelSpec,
    flat_from_parameters,
    parameters_from_flat,
)

DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data"
)


def make_gtr_instance():
    inst = UnrootedInstance("param matrix")
    inst.read_nexus_file(f"{DATA}/DS1.subsampled_10.t")
    inst.read_fasta_file(f"{DATA}/DS1.fasta")
    inst.process_loaded_trees()
    inst.prepare_for_phylo_likelihood(
        PhyloModelSpec("GTR", "constant", "none")
    )
    return inst


def test_flat_round_trip():
    spec = PhyloModelSpec("GTR", "weibull+4", "strict")
    v = np.concatenate(
        [np.full(6, 1 / 6.0), np.full(4, 0.25), [0.7], [1.3]]
    )
    params = parameters_from_flat(spec, v)
    np.testing.assert_allclose(flat_from_parameters(spec, params), v)


def test_param_matrix_block_map_and_identical_rows():
    inst = make_gtr_instance()
    mat = inst.get_phylo_model_params()
    assert mat.shape == (inst.tree_collection.tree_count(), 10)
    blocks = inst.get_phylo_model_param_block_map()
    assert blocks["GTR rates"].shape == (10, 6)
    assert blocks["frequencies"].shape == (10, 4)
    assert blocks["entire"].shape == (10, 10)
    baseline = inst.log_likelihoods().copy()
    # Editing the block-map views edits the matrix (zero-copy parity with
    # the reference's Eigen column blocks) — identical rows stay batched.
    blocks["frequencies"][:] = np.array([0.3, 0.25, 0.2, 0.25])
    changed = inst.log_likelihoods()
    assert not np.allclose(changed, baseline)


def test_param_matrix_per_tree_rows():
    inst = make_gtr_instance()
    blocks = inst.get_phylo_model_param_block_map()
    freq_a = np.array([0.3, 0.25, 0.2, 0.25])
    freq_b = np.array([0.2, 0.3, 0.25, 0.25])
    blocks["frequencies"][:] = freq_a
    blocks["frequencies"][3] = freq_b
    mixed = inst.log_likelihoods()

    blocks["frequencies"][:] = freq_a
    all_a = inst.log_likelihoods()
    blocks["frequencies"][:] = freq_b
    all_b = inst.log_likelihoods()
    # Every tree matches the LL computed with its own row's parameters.
    expected = all_a.copy()
    expected[3] = all_b[3]
    np.testing.assert_allclose(mixed, expected, atol=1e-9)


@pytest.mark.slow
def test_param_matrix_per_tree_gradients():
    inst = make_gtr_instance()
    blocks = inst.get_phylo_model_param_block_map()
    blocks["frequencies"][:] = np.array([0.3, 0.25, 0.2, 0.25])
    blocks["frequencies"][0] = np.array([0.2, 0.3, 0.25, 0.25])
    grads = inst.phylo_gradients()
    shared = inst.set_phylo_model_params_from_flat(blocks["entire"][0])
    shared_grads = inst.phylo_gradients()
    # Tree 0's rows agree between the per-tree path and the shared path.
    np.testing.assert_allclose(
        np.asarray(grads["branch_lengths"])[0],
        np.asarray(shared_grads["branch_lengths"])[0],
        atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(grads["log_likelihood"])[0],
        np.asarray(shared_grads["log_likelihood"])[0],
        atol=1e-8,
    )


@pytest.mark.slow
def test_param_matrix_per_tree_gradients_match_loop():
    """The single vmapped per-tree-parameter gradient program equals an
    explicit loop that sets each row as shared params (the reference's
    per-row SetParameters semantics, fat_beagle.hpp:144) — every gradient
    key, every tree."""
    inst = make_gtr_instance()
    blocks = inst.get_phylo_model_param_block_map()
    B = inst.tree_collection.tree_count()
    rng = np.random.default_rng(7)
    blocks["frequencies"][:] = rng.dirichlet(np.full(4, 20.0), size=B)
    # Distinct exchangeability rates per row: at the uniform default the GTR
    # Q has degenerate eigenvalues and d(eigh) is undefined (engine.py note).
    blocks["GTR rates"][:] = rng.dirichlet(np.full(6, 20.0), size=B)
    entire = inst.get_phylo_model_params().copy()
    batched = inst.phylo_gradients()

    for i in range(B):
        inst.set_phylo_model_params_from_flat(entire[i])
        shared = inst.phylo_gradients()
        for key in ("log_likelihood", "branch_lengths", "substitution_model"):
            np.testing.assert_allclose(
                np.atleast_1d(np.asarray(batched[key]))[i],
                np.atleast_1d(np.asarray(shared[key]))[i],
                atol=1e-8,
                err_msg=f"tree {i}, key {key}",
            )


@pytest.mark.slow
def test_rooted_per_tree_param_gradients(data_dir):
    """Rooted time-tree gradients with heterogeneous parameter rows run as
    one batched program and match the shared path row-by-row."""
    from libsbn_tpu import RootedInstance

    inst = RootedInstance("rooted per-tree")
    inst.read_newick_file(f"{DATA}/fluA.tree")
    inst.read_fasta_file(f"{DATA}/fluA.fa")
    inst.parse_dates_from_taxon_names(True)
    inst.process_loaded_trees()
    inst.prepare_for_phylo_likelihood(
        PhyloModelSpec("GTR", "constant", "strict")
    )
    inst.set_clock_rates(0.001)
    # Duplicate the single fluA tree so the collection has 2 trees.
    from libsbn_tpu.core.tree import RootedTreeCollection

    t = inst.tree_collection.trees[0]
    inst.tree_collection = RootedTreeCollection(
        [t, t], inst.tree_collection.tag_taxon_map,
        inst.tree_collection.tag_date_map,
    )
    inst.resize_phylo_model_params(2)
    blocks = inst.get_phylo_model_param_block_map()
    blocks["frequencies"][0] = np.array([0.3, 0.25, 0.2, 0.25])
    blocks["frequencies"][1] = np.array([0.2, 0.3, 0.25, 0.25])
    rng = np.random.default_rng(11)
    blocks["GTR rates"][:] = rng.dirichlet(np.full(6, 20.0), size=2)
    entire = inst.get_phylo_model_params().copy()
    batched = inst.phylo_gradients()
    lls_batched = inst.log_likelihoods()

    for i in range(2):
        inst.set_phylo_model_params_from_flat(entire[i])
        shared = inst.phylo_gradients()
        for key in ("log_likelihood", "ratios_root_height", "clock_model",
                    "substitution_model"):
            np.testing.assert_allclose(
                np.atleast_1d(np.asarray(batched[key]))[i],
                np.atleast_1d(np.asarray(shared[key]))[i],
                atol=1e-6,
                err_msg=f"tree {i}, key {key}",
            )
        np.testing.assert_allclose(
            lls_batched[i], np.asarray(inst.log_likelihoods())[i], atol=1e-8
        )


def test_resize_preserves_prefix():
    inst = make_gtr_instance()
    blocks = inst.get_phylo_model_param_block_map()
    blocks["frequencies"][2] = np.array([0.1, 0.2, 0.3, 0.4])
    inst.resize_phylo_model_params(20)
    mat = inst.get_phylo_model_params()
    assert mat.shape[0] == 20
    np.testing.assert_allclose(
        mat[2, 6:10], np.array([0.1, 0.2, 0.3, 0.4])
    )


@pytest.mark.slow
def test_ratio_gradient_of_height_gradient_fd():
    """J^T g matches central finite differences of g . heights(ratios)."""
    inst = RootedInstance("ratio grad")
    inst.read_newick_file(f"{DATA}/fluA.tree")
    inst.parse_dates_from_taxon_names(True)
    tree = inst.tree_collection.trees[0]
    leaf_count = tree.topology.leaf_count
    rng = np.random.default_rng(5)
    g = rng.normal(size=leaf_count - 1)

    out = ratio_gradient_of_height_gradient(tree, g)
    assert out.shape == (leaf_count - 1,)

    from libsbn_tpu.ops import heights as heights_ops
    from libsbn_tpu.ops import schedule as schedule_ops

    sched = schedule_ops.schedules_of_topologies([tree.topology])

    def dot(ratios):
        h = heights_ops.node_heights_from_ratios(
            ratios, tree.node_bounds, leaf_count,
            sched.pre_internal_node[0], sched.pre_internal_parent[0],
        )
        return float(np.dot(np.asarray(h)[leaf_count:], g))

    eps = 1e-7
    base = np.asarray(tree.height_ratios, dtype=float)
    for i in range(leaf_count - 1):
        up, dn = base.copy(), base.copy()
        up[i] += eps
        dn[i] -= eps
        fd = (dot(up) - dot(dn)) / (2 * eps)
        assert abs(fd - out[i]) < 1e-5 * max(1.0, abs(fd)), (i, fd, out[i])


def test_gp_export_trees_and_print_dag(capsys):
    from libsbn_tpu.gp import GPInstance

    inst = GPInstance("exports")
    inst.read_fasta_file(f"{DATA}/five_taxon.fasta")
    inst.read_newick_file(f"{DATA}/five_taxon_rooted.nwk")
    inst.make_engine()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "out.nwk")
        inst.export_trees(path)
        lines = [ln for ln in open(path) if ln.strip()]
        assert len(lines) == inst.tree_collection.tree_count()
        assert all(ln.rstrip().endswith(";") for ln in lines)
    inst.print_dag()
    assert capsys.readouterr().out.strip()


def test_unconditional_subsplit_probabilities_csv():
    inst = RootedInstance("csv")
    inst.read_newick_file(f"{DATA}/five_taxon_rooted_more.nwk")
    inst.process_loaded_trees()
    inst.train_simple_average()
    probs = inst.unconditional_subsplit_probabilities()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "probs.csv")
        inst.unconditional_subsplit_probabilities_to_csv(path)
        with open(path) as f:
            rows = list(csv.reader(f))
    assert len(rows) == len(probs)
    by_string = {s.to_string(): p for s, p in probs.items()}
    for key, value in rows:
        assert abs(by_string[key] - float(value)) < 1e-12
