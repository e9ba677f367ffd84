"""Ancestral sampling of topologies from a trained SBN.

Reference: generic_sbn_instance.hpp SampleTopology (recursion over
parent_to_range + discrete_distribution). Host-side with a numpy Generator;
the per-range categorical probabilities are normalized on the fly exactly as
the reference does (SampleIndex normalizes the log-parameter segment).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..core.topology import Topology
from ..utils.bitset import Bitset
from .support import SBNSupport


class SBNSampler:
    def __init__(self, support: SBNSupport, sbn_parameters, seed: int = 0):
        self.support = support
        self.params = np.asarray(sbn_parameters, dtype=np.float64)
        self.rng = np.random.default_rng(seed)
        # Cache normalized linear probabilities per range.
        self._range_probs = {}

    def set_seed(self, seed: int):
        self.rng = np.random.default_rng(seed)

    def refresh_parameters(self, sbn_parameters):
        self.params = np.asarray(sbn_parameters, dtype=np.float64)
        self._range_probs = {}

    def _probs_of_range(self, rng_pair):
        probs = self._range_probs.get(rng_pair)
        if probs is None:
            start, end = rng_pair
            seg = self.params[start:end]
            m = np.max(seg)
            p = np.exp(seg - m)
            probs = p / p.sum()
            self._range_probs[rng_pair] = probs
        return probs

    def sample_index(self, rng_pair) -> int:
        start, end = rng_pair
        assert start < end <= self.params.size
        return start + int(self.rng.choice(end - start, p=self._probs_of_range(rng_pair)))

    def sample_topology(self, rooted: bool) -> Topology:
        rootsplit_idx = self.sample_index((0, self.support.rootsplit_count()))
        rootsplit = self.support.rootsplits[rootsplit_idx]
        subsplit = rootsplit + ~rootsplit
        top = self._sample_subtree(subsplit)
        if not rooted:
            top.polish()
            top = top.deroot()
        top.polish()
        return top

    def _sample_subtree(self, parent_subsplit: Bitset) -> Topology:
        def process(parent: Bitset) -> Topology:
            focal = parent.subsplit_chunk(1)
            singleton = focal.singleton_option()
            if singleton is not None:
                return Topology.leaf(singleton)
            child_index = self.sample_index(
                self.support.parent_to_range[parent]
            )
            return self._sample_subtree(self.support.index_to_child[child_index])

        return Topology.join2(
            process(parent_subsplit), process(parent_subsplit.rotate_subsplit())
        )
