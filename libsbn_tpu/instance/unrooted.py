"""Unrooted SBN instance (reference: unrooted_sbn_instance.{hpp,cpp})."""

from __future__ import annotations

from typing import List

import numpy as np

from ..core.tree import UnrootedTree, UnrootedTreeCollection
from ..sbn import gradients as sbn_gradients
from ..sbn import probability as sbn_probability
from ..sbn.support import UnrootedSBNSupport
from .generic import GenericSBNInstance


class UnrootedInstance(GenericSBNInstance):
    support_class = UnrootedSBNSupport
    collection_class = UnrootedTreeCollection
    rooted = False

    # -- training ------------------------------------------------------------
    def train_expectation_maximization(
        self, alpha: float, max_iter: int, score_epsilon: float = 0.0,
        progress: bool = False,
    ) -> np.ndarray:
        self._check_support()
        reps, counts = self._dense_counter()
        params, score_history = sbn_probability.expectation_maximization(
            reps,
            counts,
            self.sbn_support.segment_ids(),
            self.sbn_support.gpcsp_count,
            alpha=alpha,
            max_iter=max_iter,
            score_epsilon=score_epsilon,
            progress=progress,
        )
        # Writable copy, matching the reference's mutable view semantics.
        self.sbn_parameters = np.array(params)
        self._sampler = None
        return score_history

    # -- sampling ------------------------------------------------------------
    def sample_trees(self, count: int):
        self._check_support()
        taxon_count = self.sbn_support.taxon_count()
        assert taxon_count > 2, "Can't sample an unrooted tree with < 3 taxa."
        edge_count = 2 * taxon_count - 2
        trees = []
        for _ in range(count):
            top = self.sample_topology()
            trees.append(UnrootedTree(top, np.zeros(edge_count)))
        self.tree_collection = UnrootedTreeCollection(
            trees, self.tree_collection.tag_taxon_map
        )

    def split_counters(self):
        """(rootsplit counter, PCSP counter) as string-keyed maps, recomputed
        from scratch (unrooted_sbn_instance.cpp SplitCounters)."""
        from ..sbn import maps

        counter = self.tree_collection.topology_counter()
        rootsplits = {
            b.to_string(): c
            for b, c in maps.unrooted_rootsplit_counter_of(counter).items()
        }
        pcsps = {
            parent.to_string(): {
                child.to_string(): c for child, c in children.items()
            }
            for parent, children in maps.unrooted_pcsp_counter_of(counter).items()
        }
        return rootsplits, pcsps

    # -- PSP -----------------------------------------------------------------
    def make_psp_indexer_representations(self) -> List[List[List[int]]]:
        return [
            self.psp_indexer.representation_of(t.topology)
            for t in self.tree_collection.trees
        ]

    def split_lengths(self):
        return self.psp_indexer.split_lengths(self.tree_collection)

    # -- likelihoods ---------------------------------------------------------
    def log_likelihoods(self) -> np.ndarray:
        engine = self._get_engine()
        sched = self._batched_schedule()
        params, per_tree = self._compute_params()
        return np.asarray(
            engine.log_likelihoods(
                sched, self.branch_length_matrix(), params, per_tree=per_tree
            )
        )

    def phylo_gradients(self):
        engine = self._get_engine()
        sched = self._batched_schedule()
        params, per_tree = self._compute_params()
        bls = self.branch_length_matrix()
        # per_tree (heterogeneous parameter-matrix rows) stays one vmapped
        # program — the reference's per-row SetParameters workload is exactly
        # what FatBeagleParallelize batches (fat_beagle.hpp:119-149).
        return engine.phylo_gradients(sched, bls, params, per_tree=per_tree)

    # -- topology gradients (the VBPI hot path) ------------------------------
    def topology_gradients(self, log_f, use_vimco: bool = True) -> np.ndarray:
        """Σ_j factor_j ∇_φ log q(τ_j) over the current tree collection."""
        self._check_support()
        seg = self.sbn_support.segment_ids()
        num_segments = int(seg.max(initial=0)) + 1
        reps = self.sbn_support.dense_representations(
            [t.topology for t in self.tree_collection.trees]
        )
        touched = sbn_gradients.touched_segments_of(self.sbn_support, reps)
        return np.asarray(
            sbn_gradients.topology_gradients(
                np.asarray(self.sbn_parameters),
                seg,
                num_segments,
                reps,
                touched,
                np.asarray(log_f),
                use_vimco=use_vimco,
            )
        )

    def gradient_of_log_q(self, topology) -> np.ndarray:
        rep = self.sbn_support.dense_representations([topology])[0]
        return np.asarray(
            sbn_gradients.gradient_of_log_q(
                self.sbn_support, np.asarray(self.sbn_parameters), rep
            )
        )
