"""Topology tests, mirroring /root/reference/src/node.hpp TEST_CASE("Node")
and tree classes (tree.hpp, unrooted_tree.hpp, rooted_tree.hpp)."""

import numpy as np
import pytest

from libsbn_tpu.core.topology import Topology
from libsbn_tpu.core.tree import RootedTree, UnrootedTree


def test_triple_preorder():
    # ((((0,1)7,2)8,(3,4)9)10,5,6)11
    tbig = Topology.of_parent_id_vector([7, 7, 8, 9, 9, 11, 11, 8, 10, 10, 11])
    triples = []

    def collect(n, s, p):
        triples.append(f"{n.id}, {s.id}, {p.id}")

    tbig.triple_preorder(collect, collect)
    assert triples == [
        "10, 5, 6", "8, 9, 10", "7, 2, 8", "0, 1, 7", "1, 0, 7", "2, 7, 8",
        "9, 8, 10", "3, 4, 9", "4, 3, 9", "5, 6, 10", "6, 10, 5",
    ]


def test_equality_and_canonicalization():
    ex = Topology.example_topologies()
    t1, t1_twin, t2, t3 = ex[0], ex[1], ex[2], ex[3]
    assert hash(t1) != hash(t2)
    assert t1 == t1_twin
    assert t1 != t2
    # Trifurcation at the root.
    t1_alt = Topology.of_parent_id_vector([5, 5, 4, 4, 5])
    assert t1 == t1_alt
    # Bifurcating tree.
    t3_alt = Topology.of_parent_id_vector([6, 5, 4, 4, 5, 6])
    assert t3 == t3_alt


def test_parent_id_vector_roundtrip_and_leafsets():
    for top in Topology.example_topologies():
        assert top == Topology.of_parent_id_vector(top.parent_id_vector())
        # Leaf bitsets union correctly.
        for node in top.postorder():
            if not node.is_leaf():
                acc = node.children[0].leaves
                for c in node.children[1:]:
                    acc = acc | c.leaves
                assert node.leaves == acc


def test_deroot():
    ex = Topology.example_topologies()
    assert ex[0] == ex[3].deroot()
    # Deroot on the left: ((0,1)3,2)4 -> (0,1,2)
    assert (
        Topology.of_parent_id_vector([3, 3, 3])
        == Topology.of_parent_id_vector([3, 3, 4, 4]).deroot()
    )


def test_ladder():
    assert Topology.of_parent_id_vector([4, 4, 5, 6, 5, 6]) == Topology.ladder(4)


def test_polish_ids():
    # Root has the largest id; leaves keep taxon numbers.
    top = Topology.example_topologies()[3]
    assert top.id == 6
    assert [n.id for n in top.postorder() if n.is_leaf()] == [0, 1, 2, 3]


def test_detrifurcate():
    tops = Topology.example_topologies()
    tree = UnrootedTree(tops[0], np.ones(tops[0].id + 1))
    assert tree.detrifurcate().topology == tops[3]
    # UnrootedTree must be trifurcating at the root.
    with pytest.raises(AssertionError):
        UnrootedTree(tops[3], np.ones(tops[3].id + 1))


def test_rooted_tree_example():
    tree = RootedTree.example()
    np.testing.assert_allclose(
        tree.height_ratios, [1.0 / 3.5, 1.5 / 4.0, 7.0], rtol=0, atol=0
    )
    np.testing.assert_array_equal(
        tree.node_heights, [5.0, 3.0, 0.0, 1.0, 2.0, 4.5, 7.0]
    )
    np.testing.assert_array_equal(
        tree.node_bounds, [5.0, 3.0, 0.0, 1.0, 1.0, 3.0, 5.0]
    )
    np.testing.assert_array_equal(
        tree.branch_lengths[:6], [2.0, 1.5, 2.0, 1.0, 2.5, 2.5]
    )
    # Ratios -> heights (root height doubled).
    tree.initialize_time_tree_using_height_ratios([1.0 / 3.5, 1.5 / 4.0, 14.0])
    np.testing.assert_allclose(
        tree.node_heights, [5.0, 3.0, 0.0, 1.0, 2.75, 7.125, 14.0]
    )
    np.testing.assert_allclose(
        tree.branch_lengths[:6], [9.0, 4.125, 2.75, 1.75, 4.375, 6.875]
    )


def test_ids_above():
    top = Topology.example_topologies()[3]
    above = top.ids_above()
    assert above[top.id] == []
    # Leaf 3 in (0,(1,(2,3)4)5)6 sits below 4, 5, 6.
    assert above[3] == [6, 5, 4]
