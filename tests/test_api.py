"""API-surface tests ported from the reference's Python suite
(test/test_libsbn.py) plus BlockSpecification and date-parsing doctests."""

import os
import json

import numpy as np

from libsbn_tpu import RootedInstance, UnrootedInstance
from libsbn_tpu.core.topology import Topology
from libsbn_tpu.core.tree import UnrootedTree, UnrootedTreeCollection
from libsbn_tpu.models.block_specification import BlockSpecification
from libsbn_tpu.models.phylo_model import PhyloModelSpec, parameters_from_flat

DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data"
)
SIMPLE = PhyloModelSpec("JC69", "constant", "none")


def test_hello_demo():
    """Zero-copy branch length mutation changes likelihoods
    (test_libsbn.py hello_demo)."""
    inst = UnrootedInstance("charlie")
    inst.tree_collection = UnrootedTreeCollection(
        [UnrootedTree(Topology.of_parent_id_vector([3, 3, 3]), np.zeros(4))],
        {(0, 1): "mars", (1, 1): "saturn", (2, 1): "jupiter"},
    )
    inst.read_fasta_file(f"{DATA}/hello.fasta")
    inst.prepare_for_phylo_likelihood(SIMPLE, 2)
    bl = inst.tree_collection.trees[0].branch_lengths
    bl[:] = np.array([0.15, 0.1, 0.333, 0.24])
    ll1 = inst.log_likelihoods()[0]
    bl[0] = 0.2
    ll2 = inst.log_likelihoods()[0]
    assert ll1 != ll2
    assert np.isfinite(ll1) and np.isfinite(ll2)


def test_ds1_support_vs_vbpi(data_dir):
    """Subsplit support matches vbpi's JSON (test_libsbn.py ds1_support_test)."""
    inst = UnrootedInstance("DS1")
    inst.read_nexus_file(f"{data_dir}/DS1.subsampled_10.t.reordered")
    inst.process_loaded_trees()
    rootsplit_support, subsplit_support = inst.split_counters()
    with open(f"{data_dir}/DS1.subsampled_10.t_support.json") as f:
        supports = json.load(f)
    assert rootsplit_support.keys() == supports["rootsplit_supp_dict"].keys()
    assert subsplit_support.keys() == supports["subsplit_supp_dict"].keys()


def test_gtr_with_jc_parameters_matches_jc(data_dir):
    """(test_libsbn.py ds1_phylo_model_demo)."""
    inst = UnrootedInstance("DS1")
    inst.read_nexus_file(f"{data_dir}/DS1.subsampled_10.t.reordered")
    inst.read_fasta_file(f"{data_dir}/DS1.fasta")
    inst.tree_collection.erase(1, 10)
    inst.tree_collection.trees[0].branch_lengths[:] = 0.1

    inst.prepare_for_phylo_likelihood(SIMPLE, 2)
    jc69 = np.asarray(inst.log_likelihoods())

    gtr_spec = PhyloModelSpec("GTR", "constant", "none")
    inst.prepare_for_phylo_likelihood(gtr_spec, 2)
    flat = np.concatenate([np.repeat(1.0 / 6, 6), np.repeat(0.25, 4)])
    inst.set_phylo_model_params_from_flat(flat)
    gtr = np.asarray(inst.log_likelihoods())
    np.testing.assert_allclose(jc69, gtr, rtol=1e-10)


def test_rootings_indexer(data_dir):
    """All rootings of a tree give the same set-of-PCSPs representations
    (test_libsbn.py rootings_indexer_test)."""
    inst = UnrootedInstance("rootings")
    inst.read_newick_file(f"{data_dir}/many_rootings.nwk")
    inst.process_loaded_trees()
    reps = [
        sorted(
            (rooted[0], frozenset(rooted[1:]))
            for rooted in indexer_representation
        )
        for indexer_representation in inst.make_indexer_representations()
    ]
    for rep in reps[1:]:
        assert reps[0] == rep


def test_block_specification():
    """(block_specification.hpp:78-99)."""
    spec = BlockSpecification([("kazoo", 4), ("jordan", 23)])
    assert spec.get_map() == {
        "entire": (0, 27), "jordan": (0, 23), "kazoo": (23, 4)
    }
    spec.append(
        "entire turbo and boost",
        BlockSpecification([("boost", 42), ("turbo", 666)]),
    )
    assert spec.get_map() == {
        "boost": (27, 42),
        "entire": (0, 735),
        "entire turbo and boost": (27, 708),
        "jordan": (0, 23),
        "kazoo": (23, 4),
        "turbo": (69, 666),
    }


def test_parameters_from_flat_roundtrip():
    spec = PhyloModelSpec("GTR", "weibull+4", "strict")
    from libsbn_tpu.models.phylo_model import block_specification

    bs = block_specification(spec)
    flat = np.zeros(bs.parameter_count())
    seg = bs.get_map()
    flat[seg["GTR rates"][0] : seg["GTR rates"][0] + 6] = 1.0 / 6
    flat[seg["frequencies"][0] : seg["frequencies"][0] + 4] = 0.25
    flat[seg["Weibull shape"][0]] = 0.5
    flat[seg["clock rate"][0]] = 2.0
    params = parameters_from_flat(spec, flat)
    np.testing.assert_allclose(params["substitution"]["rates"], 1.0 / 6)
    np.testing.assert_allclose(params["substitution"]["frequencies"], 0.25)
    assert float(params["site"]["shape"]) == 0.5
    assert float(params["clock"]["rate"]) == 2.0


def test_parsing_dates(data_dir):
    """(rooted_sbn_instance.hpp 'parsing dates')."""
    inst = RootedInstance("charlie")
    inst.read_nexus_file(f"{data_dir}/test_beast_tree_parsing.nexus")
    inst.parse_dates_from_taxon_names(True)
    dates = sorted(inst.tree_collection.tag_date_map.values())
    assert dates[0] == 0
    assert dates[-1] == 80.0

    alt = RootedInstance("betty")
    alt.read_nexus_file(f"{data_dir}/test_beast_tree_parsing.nexus")
    alt.tree_collection.parse_dates_from_csv(
        f"{data_dir}/test_beast_tree_parsing.csv", True
    )
    assert inst.tree_collection.tag_date_map == alt.tree_collection.tag_date_map


def test_tree_collection_ops(data_dir):
    """erase/drop_first/newick round trip (generic_tree_collection.hpp)."""
    inst = UnrootedInstance("x")
    inst.read_nexus_file(f"{data_dir}/DS1.subsampled_10.t")
    assert inst.tree_count() == 10
    inst.tree_collection.drop_first(0.2)
    assert inst.tree_count() == 8
    inst.tree_collection.erase(0, 3)
    assert inst.tree_count() == 5
    newick_text = inst.tree_collection.newick()
    assert newick_text.count(";") == 5


def test_psp_split_lengths(data_dir):
    """SplitLengths groups branch lengths by split (psp_indexer.cpp)."""
    inst = UnrootedInstance("x")
    inst.read_nexus_file(f"{data_dir}/DS1.subsampled_10.t")
    inst.process_loaded_trees()
    ragged = inst.split_lengths()
    total = sum(len(r) for r in ragged)
    # Every branch of every tree lands in exactly one split bucket.
    n_branches = inst.tree_collection.trees[0].node_count() - 1
    assert total == 10 * n_branches
    assert all(all(x >= 0 for x in r) for r in ragged)


def test_marginal_likelihood_estimate():
    """Importance-sampling marginal likelihood is finite and below the best
    log-likelihood (burrito.py marginal_likelihood_estimate)."""
    from libsbn_tpu.models.phylo_model import PhyloModelSpec as Spec
    from libsbn_tpu.vi.burrito import Burrito

    burro = Burrito(
        mcmc_nexus_path=f"{DATA}/hello_out.t",
        burn_in_fraction=0,
        fasta_path=f"{DATA}/hello.fasta",
        phylo_model_specification=Spec("JC69", "constant", "strict"),
        branch_model_name="split",
        scalar_model_name="lognormal",
        optimizer_name="simple",
        particle_count=4,
        seed=3,
    )
    burro.gradient_steps(20)
    ml = burro.marginal_likelihood_estimate(200)
    assert np.isfinite(ml)
    # The marginal is bounded above by the max log likelihood over free
    # branch lengths (~ -82.2 for hello).
    assert ml < -82.0


def test_per_tree_parameters(data_dir):
    """Per-tree phylo model parameters (the reference's param-matrix rows,
    generic_sbn_instance.hpp:247-270)."""
    import jax

    from libsbn_tpu.core.site_pattern import SitePattern
    from libsbn_tpu.io import newick
    from libsbn_tpu.io.fasta import Alignment
    from libsbn_tpu.models.engine import LikelihoodEngine
    from libsbn_tpu.ops import schedule as schedule_ops

    tops, bls, ttm = newick.parse_nexus_file(f"{data_dir}/DS1.subsampled_10.t")
    sp = SitePattern(Alignment.read_fasta(f"{data_dir}/DS1.fasta"), ttm)
    spec = PhyloModelSpec("JC69", "weibull+4", "strict")
    engine = LikelihoodEngine(sp, spec)
    sched = schedule_ops.schedules_of_topologies(tops)
    bl = np.stack(bls)

    shapes = np.linspace(0.3, 2.0, len(tops))
    batched = {"site": {"shape": jax.numpy.asarray(shapes)}}
    lls = np.asarray(
        engine.log_likelihoods(sched, bl, batched, per_tree=True)
    )
    for i, shape in enumerate(shapes):
        single = {"site": {"shape": jax.numpy.asarray(shape)}}
        ll_i = np.asarray(engine.log_likelihoods(sched, bl, single))[i]
        assert abs(lls[i] - ll_i) < 1e-9


def test_profiling_utilities(tmp_path):
    """PhaseTimer accumulates synced phase times; device_trace writes a
    profile directory (utils/profiling.py, SURVEY.md §5.1 equivalent)."""
    import jax.numpy as jnp

    from libsbn_tpu.utils import profiling

    timer = profiling.PhaseTimer(sync=True)
    x = jnp.ones((200, 200))
    for _ in range(3):
        y = timer.time_fn("matmul", lambda: x @ x)
    assert timer.counts["matmul"] == 3
    assert timer.total("matmul") > 0
    assert "matmul" in timer.report()
    with timer.phase("noop"):
        pass
    assert timer.mean("noop") is not None

    logdir = str(tmp_path / "trace")
    with profiling.device_trace(logdir):
        with profiling.annotate("span"):
            (x @ x).block_until_ready()
    import os

    assert os.path.isdir(logdir) and os.listdir(logdir)


def test_jitvbpi_mode_match_matches_branch_models():
    """JitVBPI.mode_match reproduces SplitModel/PSPModel.mode_match."""
    import numpy as np

    from libsbn_tpu import UnrootedInstance
    from libsbn_tpu.models.phylo_model import PhyloModelSpec
    from libsbn_tpu.vi import branch_models
    from libsbn_tpu.vi.jit_step import JitVBPI

    inst = UnrootedInstance("mm")
    inst.read_nexus_file(f"{DATA}/hello_out.t")
    inst.process_loaded_trees()
    inst.train_simple_average()
    inst.read_fasta_file(f"{DATA}/hello.fasta")
    inst.prepare_for_phylo_likelihood(
        PhyloModelSpec("JC69", "constant", "strict")
    )
    n_split = inst.psp_indexer.details()["after_rootsplits_index"]
    rng = np.random.default_rng(3)
    modes = rng.uniform(0.01, 0.4, n_split)

    for name, cls in (("split", branch_models.SplitModel),
                      ("psp", branch_models.PSPModel)):
        bm = cls("lognormal", inst)
        bm.mode_match(modes)
        expected = np.asarray(
            bm.scalar_model.q_params if name == "split" else bm.q_params
        )
        jv = JitVBPI(inst, particle_count=2, seed=0, branch_model=name)
        jv.mode_match(modes)
        np.testing.assert_allclose(
            np.asarray(jv.state.q_params), expected, atol=1e-12
        )
