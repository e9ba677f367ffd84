"""Precondition guard rails and parser error surfaces.

The reference fails these paths with guidance-carrying exceptions
(generic_sbn_instance.hpp:142-152 engine/trees/support checks,
rooted_tree.hpp:55-63 EnsureTipDatesHaveBeenSet, sugar.hpp:67-78 Failwith;
the bison parser rejects malformed newick with located syntax errors,
parser.yy). This pins the same behaviors here: every misuse surfaces a
clear exception, never an internal TypeError/IndexError.
"""

import pytest

import libsbn_tpu as libsbn
from libsbn_tpu.io import newick
from libsbn_tpu.models.phylo_model import PhyloModelSpec


@pytest.mark.parametrize(
    "bad",
    [
        "((a,b),c",          # unbalanced parens
        "(a,b))",            # trailing garbage
        "(a,,b);",           # empty label
        "(a:1.2.3,b);",      # malformed branch length
    ],
)
def test_malformed_newick_raises(bad):
    with pytest.raises(ValueError):
        newick.parse_newick_string(bad)


def test_guard_rails_unrooted():
    inst = libsbn.unrooted_instance("guard")
    with pytest.raises(RuntimeError, match="load some trees"):
        inst.process_loaded_trees()
    with pytest.raises(RuntimeError, match="prepare_for_phylo_likelihood"):
        inst.log_likelihoods()
    with pytest.raises(RuntimeError, match="process_loaded_trees"):
        inst.sample_trees(1)
    with pytest.raises(RuntimeError, match="process_loaded_trees"):
        inst.train_simple_average()


def test_mismatched_fasta_names(data_dir):
    inst = libsbn.unrooted_instance("guard")
    inst.read_newick_file(f"{data_dir}/hello.nwk")
    inst.process_loaded_trees()
    inst.read_fasta_file(f"{data_dir}/five_taxon.fasta")
    with pytest.raises(KeyError, match="mars"):
        inst.prepare_for_phylo_likelihood(
            PhyloModelSpec("JC69", "constant", "strict"))


def test_rooted_requires_tip_dates(data_dir):
    inst = libsbn.rooted_instance("guard")
    inst.read_newick_file(f"{data_dir}/fluA.tree")
    inst.read_fasta_file(f"{data_dir}/fluA.fa")
    inst.process_loaded_trees()
    inst.prepare_for_phylo_likelihood(PhyloModelSpec("JC69", "constant", "strict"))
    with pytest.raises(RuntimeError, match="tip dates"):
        inst.log_likelihoods()
    with pytest.raises(RuntimeError, match="tip dates"):
        inst.phylo_gradients()


def test_rooted_dates_without_time_tree_init(data_dir):
    # initialize_time_trees=False sets bounds/rates but not height ratios
    # (rooted_sbn_instance.hpp:48); likelihood access must still raise the
    # guidance message, not an internal IndexError.
    inst = libsbn.rooted_instance("guard")
    inst.read_newick_file(f"{data_dir}/fluA.tree")
    inst.read_fasta_file(f"{data_dir}/fluA.fa")
    inst.parse_dates_from_taxon_names(False)
    inst.process_loaded_trees()
    inst.prepare_for_phylo_likelihood(PhyloModelSpec("JC69", "constant", "strict"))
    if any(t.height_ratios is None for t in inst.tree_collection.trees):
        with pytest.raises(RuntimeError, match="tip dates"):
            inst.log_likelihoods()


def test_guard_rails_gp():
    # GPInstance preconditions (gp_instance.cpp:68-83 engine/data checks);
    # print_status works on an empty instance like the reference's.
    gi = libsbn.gp_instance("x.dat")
    with pytest.raises(RuntimeError, match="fasta and newick"):
        gi.make_engine()
    with pytest.raises(RuntimeError, match="make_engine"):
        gi.estimate_branch_lengths(1e-2, 5)
    with pytest.raises(RuntimeError, match="hot_start"):
        gi.hot_start_branch_lengths()
    gi.print_status()


def test_empty_newick_gives_empty_collection(data_dir, tmp_path):
    # An empty tree file yields an empty collection (matching the
    # reference's line-by-line driver), and the guard rail fires at
    # process_loaded_trees.
    p = tmp_path / "empty.nwk"
    p.write_text("")
    inst = libsbn.unrooted_instance("guard")
    inst.read_newick_file(str(p))
    assert inst.tree_count() == 0
    with pytest.raises(RuntimeError, match="load some trees"):
        inst.process_loaded_trees()


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
