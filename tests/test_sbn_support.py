"""SBN support/indexer/PSP tests mirroring the reference doctests
(unrooted_sbn_instance.hpp:89-204, rooted_sbn_instance.hpp:115-192)."""

import pytest

from libsbn_tpu import RootedInstance, UnrootedInstance
from libsbn_tpu.core.topology import Topology
from libsbn_tpu.sbn import maps

OUT = 10**6  # out_of_sample_index stand-in


@pytest.fixture(scope="module")
def five_taxon(data_dir):
    inst = UnrootedInstance("charlie")
    inst.read_newick_file(f"{data_dir}/five_taxon_unrooted.nwk")
    inst.process_loaded_trees()
    return inst


def test_pretty_rootsplits(five_taxon):
    pretty = five_taxon.pretty_indexer()
    correct_rootsplits = {
        "01110", "01010", "00101", "00111", "00001", "00011", "00010",
        "00100", "00110", "01000", "01111", "01001",
    }
    assert set(pretty[: len(correct_rootsplits)]) == correct_rootsplits
    pcsp_block = {
        "00001|11110|01110", "00001|11110|00010",
        "00001|11110|01000", "00001|11110|00100",
    }
    assert pcsp_block <= set(pretty)
    # Block structure: the four children of 00001|11110 occupy contiguous
    # indices.
    idxs = sorted(pretty.index(p) for p in pcsp_block)
    assert idxs == list(range(idxs[0], idxs[0] + 4))


def test_unrooted_indexer_representations(five_taxon):
    # (2,(1,3),(0,4)) with internal nodes (2,(1,3)5,(0,4)6)7
    top1 = Topology.of_parent_id_vector([6, 5, 7, 5, 6, 7, 7])
    correct_1 = [
        {"01111", "10000|01111|00001", "00001|01110|00100", "00100|01010|00010"},
        {"01000", "01000|10111|00010", "00100|10001|00001", "00010|10101|00100"},
        {"00100", "10001|01010|00010", "01010|10001|00001", "00100|11011|01010"},
        {"00010", "00010|11101|01000", "00100|10001|00001", "01000|10101|00100"},
        {"00001", "00001|11110|01110", "10000|01110|00100", "00100|01010|00010"},
        {"01010", "10101|01010|00010", "00100|10001|00001", "01010|10101|00100"},
        {"01110", "00100|01010|00010", "10001|01110|00100", "01110|10001|00001"},
    ]
    assert five_taxon.string_indexer_representation_of(top1, OUT) == correct_1

    correct_psp_1 = [
        ["01111", "01000", "00100", "00010", "00001", "01010", "01110"],
        ["", "", "", "", "", "01010|00010", "10001|00001"],
        ["01111|00001", "10111|00010", "11011|01010", "11101|01000",
         "11110|01110", "10101|00100", "01110|00100"],
    ]
    assert five_taxon.psp_indexer.string_representation_of(top1) == correct_psp_1

    # (((0,1),2),3,4) with internal nodes (((0,1)5,2)6,3,4)7
    top2 = Topology.of_parent_id_vector([5, 5, 6, 7, 7, 6, 7])
    correct_2 = [
        {"01111", "10000|01111|00111", "00100|00011|00001", "01000|00111|00011"},
        {"01000", "01000|10111|00111", "00100|00011|00001", "10000|00111|00011"},
        {"00100", "00100|11011|00011", "11000|00011|00001", "00011|11000|01000"},
        {"00010", "00100|11000|01000", "00001|11100|00100", "00010|11101|00001"},
        {"00001", "00100|11000|01000", "00001|11110|00010", "00010|11100|00100"},
        {"00111", "00111|11000|01000", "00100|00011|00001", "11000|00111|00011"},
        {"00011", "00100|11000|01000", "11100|00011|00001", "00011|11100|00100"},
    ]
    assert five_taxon.string_indexer_representation_of(top2, OUT) == correct_2

    correct_psp_2 = [
        ["01111", "01000", "00100", "00010", "00001", "00111", "00011"],
        ["", "", "", "", "", "11000|01000", "11100|00100"],
        ["01111|00111", "10111|00111", "11011|00011", "11101|00001",
         "11110|00010", "00111|00011", "00011|00001"],
    ]
    assert five_taxon.psp_indexer.string_representation_of(top2) == correct_psp_2


def test_rooted_indexer_representation_in_unrooted_support(five_taxon):
    reversed_indexer = five_taxon.pretty_indexer() + ["out_of_sample"]
    # ((((0,1)5,2)6,3)7,4)8
    top1 = Topology.of_parent_id_vector([5, 5, 6, 7, 8, 6, 7, 8])
    rep = maps.rooted_indexer_representation_of(
        five_taxon.sbn_support.indexer, top1, len(five_taxon.pretty_indexer())
    )
    rep_strings = maps.string_indexer_representation_of(
        five_taxon.pretty_indexer() + ["out_of_sample"], rep
    )
    assert rep_strings == {
        "00001", "00001|11110|00010", "00010|11100|00100", "00100|11000|01000"
    }
    # (((0,1)5,2)6,(3,4)7)8
    top2 = Topology.of_parent_id_vector([5, 5, 6, 7, 7, 6, 8, 8])
    rep2 = maps.rooted_indexer_representation_of(
        five_taxon.sbn_support.indexer, top2, len(five_taxon.pretty_indexer())
    )
    rep2_strings = maps.string_indexer_representation_of(
        five_taxon.pretty_indexer() + ["out_of_sample"], rep2
    )
    assert rep2_strings == {
        "00011", "11100|00011|00001", "00011|11100|00100", "00100|11000|01000"
    }


def test_rooted_support_and_simple_average(data_dir):
    inst = RootedInstance("charlie")
    inst.read_newick_file(f"{data_dir}/five_taxon_rooted.nwk")
    inst.process_loaded_trees()
    correct_pretty = {
        "00111", "01111", "00010",
        "00100|01010|00010", "00111|11000|01000", "00100|00011|00001",
        "11000|00111|00011", "00100|11001|01001", "10000|01001|00001",
        "01000|00111|00010", "10000|01111|00001", "10000|01111|00111",
        "00010|00101|00001", "00001|01110|00100", "00010|11101|00100",
    }
    assert set(inst.pretty_indexer()) == correct_pretty

    # ((0,1)5,(2,(3,4)6)7)8
    top = Topology.of_parent_id_vector([5, 5, 7, 6, 6, 8, 7, 8])
    rep_strings = inst.string_indexer_representation_of(top, OUT)
    assert rep_strings == {
        "00111", "11000|00111|00011", "00100|00011|00001", "00111|11000|01000"
    }

    inst.train_simple_average()
    assert inst.taxon_names() == ["x0", "x1", "x2", "x3", "x4"]
    correct = {
        "00111": 0.25, "01111": 0.5, "00010": 0.25,
        "00100|01010|00010": 1, "00111|11000|01000": 1, "00100|00011|00001": 1,
        "11000|00111|00011": 1, "00100|11001|01001": 1, "10000|01001|00001": 1,
        "01000|00111|00010": 1, "10000|01111|00001": 0.5,
        "10000|01111|00111": 0.5, "00010|00101|00001": 1,
        "00001|01110|00100": 1, "00010|11101|00100": 1,
    }
    got = dict(inst.pretty_indexed_sbn_parameters())
    assert set(got) == set(correct)
    for k in correct:
        assert abs(got[k] - correct[k]) < 1e-12


def test_rooted_instance_string_representation_helper():
    # RootedInstance needs string_indexer_representation_of too.
    pass
