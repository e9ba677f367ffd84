"""Mechanical pylibsbn binding-surface parity.

The name table below is extracted from the reference's Python bindings
(/root/reference/src/pylibsbn.cpp: every `.def*("name"` plus the module
class/function names at :130,177,269,383,378) and vendored here as data.
Each reference name must resolve against this framework's API — on the
same kind of object a pylibsbn user would hold — so a user switching from
the reference finds every binding they used.

Documented deviations (docs/parity_map.md) are asserted in their deviated
form rather than excluded: PhyloGradient objects become dicts keyed by the
same gradient-map keys with `log_likelihood` alongside (tree_gradient.hpp:21),
and `beagle_flags` has no counterpart because there is no BEAGLE (N/A by
design, parity_map §2.3).
"""

import numpy as np
import pytest

import libsbn_tpu
from libsbn_tpu.core.topology import Topology
from libsbn_tpu.models.phylo_model import PhyloModelSpec

# pylibsbn.cpp class -> bound method/property names (extracted, vendored).
ROOTED_TREE_NAMES = [
    "parent_id_vector", "initialize_time_tree_using_height_ratios",
    "example", "of_parent_id_vector", "branch_lengths", "height_ratios",
    "node_heights", "node_bounds", "rates",
]
UNROOTED_TREE_NAMES = ["parent_id_vector", "of_parent_id_vector", "branch_lengths"]
TREE_COLLECTION_NAMES = ["erase", "drop_first", "newick", "trees"]
PSP_INDEXER_NAMES = ["details"]
GENERIC_INSTANCE_NAMES = [
    # PreRootedSBNInstance / PreUnrootedSBNInstance shared surface
    "get_phylo_model_params", "get_phylo_model_param_block_map",
    "prepare_for_phylo_likelihood", "resize_phylo_model_params",
    "read_fasta_file", "taxon_names", "print_status", "tree_count",
    "process_loaded_trees", "train_simple_average", "sbn_parameters_to_csv",
    "read_sbn_parameters_from_csv", "calculate_sbn_probabilities",
    "log_likelihoods", "set_rescaling", "phylo_gradients",
    "read_newick_file", "read_nexus_file", "tree_collection",
]
ROOTED_INSTANCE_NAMES = [
    "unconditional_subsplit_probabilities_to_csv", "set_dates_to_be_constant",
    "parse_dates_from_taxon_names", "parse_dates_from_csv",
]
UNROOTED_INSTANCE_NAMES = [
    "train_expectation_maximization", "sample_trees",
    "make_indexer_representations", "make_psp_indexer_representations",
    "split_lengths", "split_counters", "topology_gradients", "psp_indexer",
]
GP_INSTANCE_NAMES = [
    "print_status", "print_dag", "read_newick_file", "read_nexus_file",
    "read_fasta_file", "sbn_parameters_to_csv", "sbn_prior_to_csv",
    "branch_lengths_to_csv", "export_trees", "export_all_generated_trees",
    "export_trees_with_a_pcsp", "subsplit_dag_to_dot", "make_engine",
    "hot_start_branch_lengths", "calculate_hybrid_marginals",
    "estimate_sbn_parameters", "estimate_branch_lengths",
]
MODULE_NAMES = [
    # Module-level classes/functions a pylibsbn user calls by this exact name
    "rooted_instance", "unrooted_instance", "gp_instance",
    "PhyloModelSpecification", "ratio_gradient_of_height_gradient",
]


def _assert_has(obj, names, where):
    missing = [n for n in names if not hasattr(obj, n)]
    assert not missing, f"{where} lacks reference binding names: {missing}"


def test_module_surface():
    _assert_has(libsbn_tpu, MODULE_NAMES, "libsbn_tpu")
    # The factories are the instance classes themselves.
    assert libsbn_tpu.unrooted_instance is libsbn_tpu.UnrootedInstance
    assert libsbn_tpu.rooted_instance is libsbn_tpu.RootedInstance
    assert libsbn_tpu.gp_instance is libsbn_tpu.GPInstance
    # PhyloModelSpecification(substitution=..., site=..., clock=...) works
    # verbatim (pylibsbn.cpp:137-138 keyword args).
    spec = libsbn_tpu.PhyloModelSpecification(
        substitution="JC69", site="weibull+4", clock="strict")
    assert spec.site_category_count() == 4


def test_unrooted_surface(data_dir):
    inst = libsbn_tpu.unrooted_instance("names")
    _assert_has(inst, GENERIC_INSTANCE_NAMES, "unrooted_instance")
    _assert_has(inst, UNROOTED_INSTANCE_NAMES, "unrooted_instance")
    inst.read_newick_file(f"{data_dir}/hello.nwk")
    inst.read_fasta_file(f"{data_dir}/hello.fasta")
    inst.process_loaded_trees()
    tc = inst.tree_collection
    _assert_has(tc, TREE_COLLECTION_NAMES, "UnrootedTreeCollection")
    _assert_has(tc.trees[0], UNROOTED_TREE_NAMES, "UnrootedTree")
    _assert_has(inst.psp_indexer, PSP_INDEXER_NAMES, "PSPIndexer")
    assert hasattr(Topology, "of_parent_id_vector")
    # Documented deviation: PhyloGradient -> dict with the reference's
    # gradient-map keys plus log_likelihood (tree_gradient.hpp:21).
    inst.prepare_for_phylo_likelihood(PhyloModelSpec("JC69", "constant", "strict"))
    grads = inst.phylo_gradients()
    assert "log_likelihood" in grads and "branch_lengths" in grads


def test_rooted_surface(data_dir):
    inst = libsbn_tpu.rooted_instance("names")
    _assert_has(inst, GENERIC_INSTANCE_NAMES, "rooted_instance")
    _assert_has(inst, ROOTED_INSTANCE_NAMES, "rooted_instance")
    inst.read_newick_file(f"{data_dir}/fluA.tree")
    inst.read_fasta_file(f"{data_dir}/fluA.fa")
    inst.parse_dates_from_taxon_names(True)
    inst.process_loaded_trees()
    tree = inst.tree_collection.trees[0]
    _assert_has(tree, ROOTED_TREE_NAMES, "RootedTree")
    # The time-tree state vectors are populated numpy arrays, as the
    # zero-copy views are in the reference (pylibsbn.cpp:28-48).
    assert np.all(np.isfinite(np.asarray(tree.node_heights)))
    assert len(np.asarray(tree.height_ratios)) > 0


def test_gp_surface():
    inst = libsbn_tpu.gp_instance("mmap.dat")
    _assert_has(inst, GP_INSTANCE_NAMES, "gp_instance")


def test_no_beagle_flags():
    # N/A by design (parity_map §2.3): anyone reaching for beagle_flags
    # should get a clean absence, not a stub that silently does nothing.
    assert not hasattr(libsbn_tpu, "beagle_flags")


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
