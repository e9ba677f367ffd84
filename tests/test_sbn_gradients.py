"""Topology gradient tests: hand-derived cases and VIMCO factors
(unrooted_sbn_instance.hpp:399-581)."""

import numpy as np
import pytest

from libsbn_tpu import UnrootedInstance
from libsbn_tpu.core.topology import Topology
from libsbn_tpu.core.tree import UnrootedTree, UnrootedTreeCollection
from libsbn_tpu.sbn import gradients as sbn_gradients
from libsbn_tpu.utils.bitset import Bitset


@pytest.fixture()
def gradient_inst(data_dir):
    inst = UnrootedInstance("charlie")
    inst.read_nexus_file(f"{data_dir}/gradient_test.t")
    inst.process_loaded_trees()
    # tau = ((0,1),(2,3),4) with internal node labels ((0,1)5,(2,3)6,4)7.
    tau = UnrootedTree(
        Topology.of_parent_id_vector([5, 5, 6, 6, 7, 7, 7]), np.zeros(8)
    )
    inst.tree_collection = UnrootedTreeCollection(
        [tau], inst.tree_collection.tag_taxon_map
    )
    return inst


def test_gradient_of_log_q_uniform(gradient_inst):
    inst = gradient_inst
    num_rootsplits = 8
    G = inst.sbn_support.gpcsp_count
    num_pcsp = G - num_rootsplits
    inst.sbn_parameters = np.zeros(G)

    grad = inst.gradient_of_log_q(inst.tree_collection.trees[0].topology)
    # Rootsplit block: one entry 1/8 (rooting on 014|23), -1/8 for the
    # unobserved rootsplit, rest 0.
    realized_rootsplit = np.sort(grad[:num_rootsplits])
    expected_rootsplit = np.array([-1.0 / 8] + [0.0] * 6 + [1.0 / 8])
    np.testing.assert_allclose(realized_rootsplit, expected_rootsplit, atol=1e-8)
    # PCSP block: 6 entries -1/16, 6 entries 1/16, rest 0.
    realized_pcsp = np.sort(grad[num_rootsplits:])
    expected_pcsp = np.concatenate(
        [np.full(6, -1.0 / 16), np.zeros(num_pcsp - 12), np.full(6, 1.0 / 16)]
    )
    np.testing.assert_allclose(realized_pcsp, expected_pcsp, atol=1e-8)


def test_gradient_of_log_q_nonuniform(gradient_inst):
    inst = gradient_inst
    G = inst.sbn_support.gpcsp_count
    s = Bitset.of_string("000011111000110")
    s_prime = Bitset.of_string("000011111000010")
    s_idx = inst.sbn_support.indexer[s]
    s_prime_idx = inst.sbn_support.indexer[s_prime]
    params = np.zeros(G)
    params[s_idx] = 1.0
    params[s_prime_idx] = -1.0
    inst.sbn_parameters = params

    seg = inst.sbn_support.segment_ids()
    from libsbn_tpu.sbn.probability import probability_normalize_in_log

    normalized = np.asarray(
        probability_normalize_in_log(params, seg, int(seg.max()) + 1)
    )
    p_tau_rho = (1.0 / 8) * np.exp(normalized[s_idx])
    q_tau = inst.calculate_sbn_probabilities()[0]
    expected_s = (1.0 / q_tau) * p_tau_rho * (1 - np.exp(normalized[s_idx]))
    expected_s_prime = (
        (1.0 / q_tau) * p_tau_rho * -np.exp(normalized[s_prime_idx])
    )
    grad = inst.gradient_of_log_q(inst.tree_collection.trees[0].topology)
    assert abs(expected_s - grad[s_idx]) < 1e-8
    assert abs(expected_s_prime - grad[s_prime_idx]) < 1e-8


def test_topology_gradients_naive_and_vimco(gradient_inst):
    inst = gradient_inst
    G = inst.sbn_support.gpcsp_count
    inst.sbn_parameters = np.zeros(G)
    inst.set_seed(42)
    inst.sample_trees(4)
    log_f = np.array([-83.0, -75.0, -80.0, -79.0])

    # Reference VIMCO factors for this log_f (unrooted_sbn_instance.hpp:562).
    vimco = np.asarray(sbn_gradients.vimco_multiplicative_factors(log_f))
    np.testing.assert_allclose(
        vimco, [-0.04742748, 2.59553236, -0.01779887, -0.01278592], atol=1e-7
    )

    naive = np.asarray(sbn_gradients.multiplicative_factors(log_f))
    # Build expected gradient by summing per-tree gradient_of_log_q.
    for use_vimco, factors in [(False, naive), (True, vimco)]:
        expected = np.zeros(G)
        for k, tree in enumerate(inst.tree_collection.trees):
            expected += factors[k] * inst.gradient_of_log_q(tree.topology)
        realized = inst.topology_gradients(log_f, use_vimco=use_vimco)
        np.testing.assert_allclose(realized, expected, atol=1e-8)


def test_sampling_frequencies(data_dir):
    """Sampled rooted-topology frequencies match SA training frequencies at
    reference scale: 1e6 samples, tol 5e-3 (unrooted_sbn_instance.hpp:359-397).
    The native bulk sampler makes this cheap; samples dedupe to the handful
    of distinct five-taxon topologies before representation lookup."""
    inst = UnrootedInstance("charlie")
    inst.read_newick_file(f"{data_dir}/five_taxon_unrooted.nwk")
    inst.process_loaded_trees()
    inst.train_simple_average()

    def standardized(rep):
        return (rep[0],) + tuple(sorted(rep[1:]))

    counter_from_file = {}
    total_from_file = 0
    for rep_set in inst.make_indexer_representations():
        for rooted_rep in rep_set:
            key = standardized(rooted_rep)
            counter_from_file[key] = counter_from_file.get(key, 0) + 1
            total_from_file += 1

    from libsbn_tpu.sbn import maps, sampling

    n_samples = 1_000_000
    sampler = sampling.NativeSBNSampler(
        inst.sbn_support, inst.sbn_parameters, seed=0
    )
    pvs = sampler.sample_parent_vectors(n_samples, rooted=True)
    if pvs is None:
        pytest.skip("native sampler unavailable")
    assert pvs.shape == (n_samples, 8)  # 9 rooted nodes for 5 taxa
    unique, counts = np.unique(pvs, axis=0, return_counts=True)
    counter_from_sampling = {}
    for pv, count in zip(unique, counts):
        top = Topology.of_parent_id_vector(list(pv))
        rep = maps.rooted_indexer_representation_of(
            inst.sbn_support.indexer, top, inst.sbn_support.gpcsp_count
        )
        key = standardized(rep)
        counter_from_sampling[key] = counter_from_sampling.get(key, 0) + int(count)

    assert sum(counter_from_sampling.values()) == n_samples
    for key, count in counter_from_file.items():
        observed = counter_from_sampling.get(key, 0) / n_samples
        expected = count / total_from_file
        assert abs(observed - expected) < 5e-3, (key, observed, expected)
    # Nothing outside the support was sampled.
    assert set(counter_from_sampling) <= set(counter_from_file)
