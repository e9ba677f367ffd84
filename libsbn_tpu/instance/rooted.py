"""Rooted SBN instance (reference: rooted_sbn_instance.{hpp,cpp})."""

from __future__ import annotations


import numpy as np

from ..core.tree import RootedTree, RootedTreeCollection
from ..sbn.support import RootedSBNSupport
from .generic import GenericSBNInstance


class RootedInstance(GenericSBNInstance):
    support_class = RootedSBNSupport
    collection_class = RootedTreeCollection
    rooted = True

    # -- tip dates -----------------------------------------------------------
    def set_dates_to_be_constant(self, initialize_time_trees: bool):
        self.tree_collection.set_dates_to_be_constant(initialize_time_trees)

    def parse_dates_from_taxon_names(self, initialize_time_trees: bool):
        self.tree_collection.parse_dates_from_taxon_names(initialize_time_trees)

    def parse_dates_from_csv(self, path: str, initialize_time_trees: bool):
        self.tree_collection.parse_dates_from_csv(path, initialize_time_trees)

    # -- sampling ------------------------------------------------------------
    def sample_trees(self, count: int):
        self._check_support()
        taxon_count = self.sbn_support.taxon_count()
        node_count = 2 * taxon_count - 1
        trees = []
        for _ in range(count):
            top = self.sample_topology()
            trees.append(RootedTree(top, np.zeros(node_count)))
        self.tree_collection = RootedTreeCollection(
            trees, self.tree_collection.tag_taxon_map,
            self.tree_collection.tag_date_map,
        )

    # -- time-tree state matrices -------------------------------------------
    def _time_tree_arrays(self):
        trees = self.tree_collection.trees
        if any(
            t.node_bounds is None or t.rates is None or t.height_ratios is None
            for t in trees
        ):
            # Reference precondition (rooted_tree.hpp:55-63
            # EnsureTipDatesHaveBeenSet): fail with guidance, not a
            # TypeError from the stacking below.
            raise RuntimeError(
                "Attempted access of a time tree member that requires the "
                "tip dates to be set. Have you set dates for your time "
                "trees? (parse_dates_from_taxon_names / parse_dates_from_csv"
                " / set_dates_to_be_constant)"
            )
        bounds = np.stack([t.node_bounds for t in trees])
        ratios = np.stack([t.height_ratios for t in trees])
        rates = np.stack([t.rates[: t.node_count() - 1] for t in trees])
        return bounds, ratios, rates

    def set_clock_rates(self, rate: float):
        """Assign a constant per-branch clock rate to every tree."""
        for t in self.tree_collection.trees:
            t.rates = np.full(t.node_count() - 1, rate)
            t.rate_count = 1

    # -- likelihoods ---------------------------------------------------------
    def unrooted_log_likelihoods(self) -> np.ndarray:
        """Plain pruning likelihoods of the rooted trees' branch lengths,
        without rate scaling or the height Jacobian
        (RootedSBNInstance::UnrootedLogLikelihoods)."""
        engine = self._get_engine()
        sched = self._batched_schedule()
        params, per_tree = self._compute_params()
        return np.asarray(
            engine.log_likelihoods(
                sched, self.branch_length_matrix(), params, per_tree=per_tree
            )
        )

    def log_likelihoods(self) -> np.ndarray:
        """LL + log-det-Jacobian of the height transform
        (fat_beagle.cpp LogLikelihood(RootedTree)). Heterogeneous per-tree
        parameter rows stay one vmapped program (per_tree=True)."""
        engine = self._get_engine()
        sched = self._batched_schedule()
        bounds, ratios, rates = self._time_tree_arrays()
        params, per_tree = self._compute_params()
        return np.asarray(
            engine.rooted_log_likelihoods(
                sched, bounds, ratios, rates, params, per_tree=per_tree
            )
        )

    def phylo_gradients(self):
        engine = self._get_engine()
        sched = self._batched_schedule()
        bounds, ratios, rates = self._time_tree_arrays()
        strict = all(t.rate_count == 1 for t in self.tree_collection.trees)
        params, per_tree = self._compute_params()
        return engine.rooted_phylo_gradients(
            sched, bounds, ratios, rates, params, strict_clock=strict,
            per_tree=per_tree,
        )

    def unconditional_subsplit_probabilities(self):
        """Via a temporary subsplit DAG (rooted_sbn_instance.cpp:19-40).

        The DAG's non-fake GPCSP layout coincides with the support's (both
        come from the same rooted counters through build_indexer_bundle);
        fake-subsplit edges are appended with probability one."""
        if not self.tree_collection or not self.tree_collection.trees:
            raise RuntimeError(
                "Please load some trees before trying to calculate "
                "unconditional subsplit probabilities."
            )
        from ..gp.subsplit_dag import SubsplitDAG

        dag = SubsplitDAG.of_tree_collection(self.tree_collection)
        params = self.normalized_sbn_parameters()
        assert params.size == dag.gpcsp_count(), "GPCSP count mismatch."
        expanded = np.ones(dag.gpcsp_count_with_fake())
        expanded[: params.size] = params
        return dag.unconditional_subsplit_probabilities(expanded)

    def unconditional_subsplit_probabilities_to_csv(self, path: str):
        """subsplit-string,probability rows (rooted_sbn_instance.cpp:36-40)."""
        import csv as csv_mod

        with open(path, "w", newline="") as f:
            writer = csv_mod.writer(f)
            for subsplit, prob in (
                self.unconditional_subsplit_probabilities().items()
            ):
                writer.writerow([subsplit.to_string(), prob])


def ratio_gradient_of_height_gradient(tree, height_gradient) -> np.ndarray:
    """Chain-rule a gradient w.r.t. internal-node heights into a gradient
    w.r.t. (height ratios..., root height) — the reference's standalone
    binding `ratio_gradient_of_height_gradient` (pylibsbn.cpp:378,
    rooted_gradient_transforms.cpp:132-175, the BEAST-derived recursions).
    Here it is one vjp through the height-transform scan (ops/heights.py):
    both compute J^T g for J = d(heights)/d(ratios), WITHOUT the
    log-det-Jacobian term ("unweighted log density")."""
    import jax

    from ..ops import heights as heights_ops
    from ..ops import schedule as schedule_ops

    sched = schedule_ops.schedules_of_topologies([tree.topology])
    leaf_count = sched.leaf_count

    def internal_heights(ratios):
        h = heights_ops.node_heights_from_ratios(
            ratios,
            jnp_asarray(tree.node_bounds),
            leaf_count,
            sched.pre_internal_node[0],
            sched.pre_internal_parent[0],
        )
        return h[leaf_count:]

    def jnp_asarray(x):
        import jax.numpy as jnp

        return jnp.asarray(x)

    _, vjp = jax.vjp(internal_heights, jnp_asarray(tree.height_ratios))
    return np.asarray(vjp(jnp_asarray(np.asarray(height_gradient)))[0])
