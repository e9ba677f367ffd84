"""Scale and instance-level robustness tests."""

import os
import pytest
import numpy as np

from libsbn_tpu import RootedInstance, UnrootedInstance
from libsbn_tpu.core.topology import Topology
from libsbn_tpu.models.phylo_model import PhyloModelSpec

DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data"
)


def random_unrooted(n, rng):
    nodes = [Topology.leaf(i) for i in range(n)]
    while len(nodes) > 3:
        i, j = sorted(rng.choice(len(nodes), 2, replace=False), reverse=True)
        a, b = nodes.pop(i), nodes.pop(j)
        nodes.append(Topology.join2(a, b))
    t = Topology.join(nodes)
    t.polish()
    return t


@pytest.mark.slow
def test_support_and_em_at_scale(tmp_path):
    """200 random 30-taxon trees: support build, SA, EM, probabilities,
    sampling, and topology gradients all stay finite and consistent."""
    rng = np.random.default_rng(0)
    tops = [random_unrooted(30, rng) for _ in range(200)]
    path = tmp_path / "scale.nwk"
    path.write_text("\n".join(t.newick() for t in tops) + "\n")

    inst = UnrootedInstance("scale")
    inst.read_newick_file(str(path))
    inst.process_loaded_trees()
    assert inst.sbn_support.gpcsp_count > 1000
    inst.train_simple_average()
    sa_probs = inst.calculate_sbn_probabilities()
    assert np.isfinite(sa_probs).all() and (sa_probs > 0).all()
    hist = inst.train_expectation_maximization(0.1, 3)
    assert np.all(np.diff(hist) > -1e-8)  # monotone EM score
    inst.set_seed(7)
    inst.sample_trees(20)
    g = inst.topology_gradients(rng.normal(size=20) - 100.0)
    assert g.shape == (inst.sbn_support.gpcsp_count,)
    assert np.isfinite(g).all()


def test_relaxed_clock_instance(data_dir):
    """Per-branch clock rates through the rooted instance API."""
    inst = RootedInstance("flu")
    inst.read_newick_file(f"{data_dir}/fluA.tree")
    inst.parse_dates_from_taxon_names(True)
    inst.read_fasta_file(f"{data_dir}/fluA.fa")
    inst.prepare_for_phylo_likelihood(PhyloModelSpec("JC69", "constant", "strict"))
    tree = inst.tree_collection.trees[0]
    n_branches = tree.node_count() - 1
    rng = np.random.default_rng(1)
    tree.rates = 0.001 * (1.0 + 0.5 * rng.random(n_branches))
    tree.rate_count = n_branches

    lls = inst.log_likelihoods()
    assert np.isfinite(lls).all()
    g = inst.phylo_gradients()
    # Relaxed clock: one gradient entry per branch.
    assert np.asarray(g["clock_model"]).shape == (1, n_branches)
    assert np.isfinite(np.asarray(g["clock_model"])).all()
    assert np.isfinite(np.asarray(g["ratios_root_height"])).all()
