"""Quartet hybrid marginals and DAG probability tests
(gp_doctest.cpp:414-597, rooted_sbn_instance.hpp:194-216)."""

import os
import numpy as np
from scipy.special import logsumexp

from libsbn_tpu import RootedInstance
from libsbn_tpu.gp.quartet import quartet_hybrid_request_of
from libsbn_tpu.sbn import maps as sbn_maps
from libsbn_tpu.utils.bitset import Bitset

from test_gp import make_instance, per_pattern_log_likelihoods

DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data"
)


def classical_likelihoods_with_prior(trees, site_pattern):
    ll = per_pattern_log_likelihoods(trees, site_pattern)
    totals = ll @ site_pattern.weights
    return totals + np.log(1.0 / trees.tree_count())


def test_simplest_hybrid_marginal():
    inst = make_instance("7-taxon-slice-of-ds1.fasta", "simplest-hybrid-marginal.nwk")
    dag = inst.dag
    eng = inst.get_engine()
    rng = np.random.default_rng(7)
    eng.branch_lengths = rng.uniform(1e-6, 0.1, dag.gpcsp_count_with_fake())
    inst.populate_plvs()

    # The central edge (12 -> 11 in the reference's diagram) is the unique
    # fully-formed request whose quartet combination count equals the number
    # of trees the DAG spans — its quartets capture ALL the uncertainty, so
    # the hybrid likelihoods equal the classical ones (gp_doctest.cpp note).
    trees_count = int(dag.topology_count)
    candidates = []
    for parent_id, rotated, child_id, _ in dag.reverse_postorder_index_traversal():
        req = quartet_hybrid_request_of(dag, parent_id, rotated, child_id)
        combos = (
            len(req.rootward_tips) * len(req.sister_tips)
            * len(req.rotated_tips) * len(req.sorted_tips)
        )
        if req.is_fully_formed() and combos == trees_count:
            candidates.append(req)
    assert len(candidates) == 1
    request = candidates[0]

    eng.process_quartet_hybrid_request(request)
    # Recompute the per-tree hybrid likelihoods for comparison.
    results = _quartet_likelihood_list(eng, request)

    trees = inst.generate_complete_rooted_tree_collection()
    manual = classical_likelihoods_with_prior(trees, eng.site_pattern)
    np.testing.assert_allclose(sorted(results), sorted(manual), atol=1e-12)
    # And the engine stored the logsumexp.
    assert abs(
        eng.hybrid_marginal_log_likelihoods[request.central_gpcsp_idx]
        - logsumexp(results)
    ) < 1e-12


def test_second_simplest_hybrid_marginal():
    inst = make_instance(
        "7-taxon-slice-of-ds1.fasta", "second-simplest-hybrid-marginal.nwk"
    )
    dag = inst.dag
    eng = inst.get_engine()
    rng = np.random.default_rng(11)
    eng.branch_lengths = rng.uniform(1e-6, 0.1, dag.gpcsp_count_with_fake())
    inst.populate_plvs()

    # The central edge is identified by its PCSP bitset (gp_doctest.cpp:586).
    pcsp = Bitset.of_string("000000100111100001110")
    indexer = dag.build_gpcsp_indexer()
    assert pcsp in indexer
    central_idx = indexer[pcsp]
    parent_id = child_id = rotated = None
    for p, r, c, g in dag.reverse_postorder_index_traversal():
        if g == central_idx:
            parent_id, rotated, child_id = p, r, c
    request = quartet_hybrid_request_of(dag, parent_id, rotated, child_id)
    assert request.is_fully_formed()
    results = _quartet_likelihood_list(eng, request)

    # Restrict generated trees to those containing the central PCSP.
    all_trees = inst.generate_complete_rooted_tree_collection()
    pcsp_only = {}
    for key, idx in indexer.items():
        if key.size == 3 * dag.taxon_count:
            pcsp_only[key] = idx
        else:
            pcsp_only[min(key.subsplit_chunk(0), key.subsplit_chunk(1))] = idx
    keep = []
    for tree in all_trees.trees:
        rep = sbn_maps.rooted_indexer_representation_of(
            pcsp_only, tree.topology, dag.gpcsp_count_with_fake()
        )
        if central_idx in rep:
            keep.append(tree)
    from libsbn_tpu.core.tree import RootedTreeCollection

    kept = RootedTreeCollection(keep, all_trees.tag_taxon_map)
    manual = classical_likelihoods_with_prior(kept, eng.site_pattern)
    np.testing.assert_allclose(sorted(results), sorted(manual), atol=1e-12)


def _quartet_likelihood_list(eng, request):
    """The individual per-quartet log likelihoods (CalculateQuartetHybrid-
    Likelihoods), re-deriving the list the engine logsumexps."""
    import jax.numpy as jnp

    from libsbn_tpu.gp.engine import _jc69_transition

    plvs = eng.plvs
    bl = eng.branch_lengths
    results = []
    for rootward in request.rootward_tips:
        r_plv = (plvs["rtilde"] if rootward.rotated else plvs["r"])[rootward.node_id]
        ls_root = (plvs["ls_rtilde"] if rootward.rotated else plvs["ls_r"])[
            rootward.node_id
        ]
        log_prior = np.log(
            eng.unconditional_node_probabilities[rootward.node_id]
        )
        P = np.asarray(_jc69_transition(jnp.asarray([bl[rootward.gpcsp_idx]]))[0])
        quartet_root = P @ r_plv
        for sister in request.sister_tips:
            P = np.asarray(_jc69_transition(jnp.asarray([bl[sister.gpcsp_idx]]))[0])
            r_s = quartet_root * (P @ plvs["p"][sister.node_id])
            P = np.asarray(
                _jc69_transition(jnp.asarray([bl[request.central_gpcsp_idx]]))[0]
            )
            q_s = P @ r_s
            for rotated_tip in request.rotated_tips:
                P = np.asarray(
                    _jc69_transition(jnp.asarray([bl[rotated_tip.gpcsp_idx]]))[0]
                )
                r_sorted = q_s * (P @ plvs["p"][rotated_tip.node_id])
                for sorted_tip in request.sorted_tips:
                    non_seq = np.log(
                        eng.inverted_sbn_prior[rootward.gpcsp_idx]
                        * eng.q[sister.gpcsp_idx]
                        * eng.q[rotated_tip.gpcsp_idx]
                        * eng.q[sorted_tip.gpcsp_idx]
                    )
                    P = np.asarray(
                        _jc69_transition(jnp.asarray([bl[sorted_tip.gpcsp_idx]]))[0]
                    )
                    per_pattern = np.log(
                        np.einsum(
                            "is,ij,js->s", r_sorted, P, plvs["p"][sorted_tip.node_id]
                        )
                    )
                    per_pattern += (
                        ls_root
                        + plvs["ls_p"][sister.node_id]
                        + plvs["ls_p"][rotated_tip.node_id]
                        + plvs["ls_p"][sorted_tip.node_id]
                    )
                    per_pattern -= log_prior
                    results.append(
                        non_seq + float(np.dot(per_pattern, eng.weights))
                    )
    return results


def test_unconditional_subsplit_probabilities():
    """Golden subsplit probability map (rooted_sbn_instance.hpp:194-216)."""
    inst = RootedInstance("rooted instance")
    inst.read_newick_file(f"{DATA}/five_taxon_rooted_more.nwk")
    inst.process_loaded_trees()
    inst.train_simple_average()
    correct = {
        "0011111000": 0.5, "0111110000": 0.3, "0001011101": 0.2,
        "1100100100": 0.2, "0100000111": 0.1, "0111000001": 0.2,
        "0101000100": 0.2, "1000001001": 0.2, "0010000011": 0.4,
        "0011000001": 0.2, "1000001000": 0.5, "0100000010": 0.2,
        "0100000001": 0.2, "0010000010": 0.2, "0001000001": 0.4,
    }
    got = inst.unconditional_subsplit_probabilities()
    assert len(got) == len(correct)
    for subsplit, prob in got.items():
        assert abs(correct[subsplit.to_string()] - prob) < 1e-8, subsplit


def test_inverted_gpcsp_probabilities_sum_to_one():
    """P(parent|child) sums to 1 over each child's parents
    (subsplit_dag.cpp InvertedGPCSPProbabilities semantics)."""
    inst = make_instance("five_taxon.fasta", "five_taxon_rooted_more_2.nwk")
    dag = inst.dag
    prior = dag.build_uniform_on_topological_support_prior()
    node_probs = dag.unconditional_node_probabilities(prior)
    # Leaves and once-per-rootsplit nodes have probability as expected.
    np.testing.assert_allclose(node_probs[: dag.taxon_count], 1.0, atol=1e-12)
    inverted = dag.inverted_gpcsp_probabilities(prior, node_probs)
    sums = {}
    for p, r, c, g in dag.reverse_postorder_index_traversal():
        sums[c] = sums.get(c, 0.0) + inverted[g]
    for child, total in sums.items():
        assert abs(total - 1.0) < 1e-10, (child, total)


def test_gpcsp_index_traversal_consistency():
    inst = make_instance("7-taxon-slice-of-ds1.fasta", "simplest-hybrid-marginal.nwk")
    dag = inst.dag
    for parent_id, rotated, child_id, gpcsp_idx in (
        dag.reverse_postorder_index_traversal()
    ):
        assert dag.gpcsp_index_of_ids(parent_id, child_id) == gpcsp_idx


def test_batched_hybrid_requests_match_sequential():
    """The batched (flattened-combination) hybrid path equals the
    per-request port across a whole DAG's worth of requests."""
    inst = make_instance(
        "7-taxon-slice-of-ds1.fasta", "second-simplest-hybrid-marginal.nwk"
    )
    dag = inst.dag
    eng = inst.get_engine()
    rng = np.random.default_rng(13)
    eng.branch_lengths = rng.uniform(1e-6, 0.1, dag.gpcsp_count_with_fake())
    inst.populate_plvs()

    requests = [
        quartet_hybrid_request_of(dag, parent_id, rotated, child_id)
        for parent_id, rotated, child_id, _ in (
            dag.reverse_postorder_index_traversal()
        )
    ]
    for req in requests:
        eng.process_quartet_hybrid_request(req)
    sequential = eng.hybrid_marginal_log_likelihoods.copy()

    eng.hybrid_marginal_log_likelihoods[:] = -np.inf
    # Tiny chunk to exercise the padding/chunk-boundary logic.
    eng.process_quartet_hybrid_requests(requests, chunk=7)
    np.testing.assert_allclose(
        eng.hybrid_marginal_log_likelihoods, sequential, atol=1e-10
    )
