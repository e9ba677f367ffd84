"""Lowering topologies to dense traversal schedules.

This is the bridge between the host-side combinatorial layer (core.topology)
and the device compute layer (ops.pruning): a topology becomes a handful of
int32 index arrays that drive statically-shaped scans. All trees on the same
taxon set (and same rootedness) lower to identically-shaped schedules, so a
whole collection batches into one stacked schedule and evaluates in a single
jitted kernel launch via vmap — replacing the reference's one-BEAGLE-instance-
per-thread parallelism (fat_beagle.hpp:119-149, task_processor.hpp).

Conventions (matching node ids from core.topology.Topology.polish):
  * leaves have ids 0..L-1, internals L..node_count-1, root last;
  * a "ones slot" at index ``node_count`` holds an all-ones partial, used to
    pad bifurcating nodes up to the max child count (3 at an unrooted root);
    evolving ones through any row-stochastic P gives ones, so padding is
    numerically inert;
  * branch lengths are indexed by node id; bl[root] and bl[ones_slot] are 0.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import numpy as np

from ..core.topology import Topology

MAX_CHILDREN = 3


@dataclass(frozen=True)
class PruningSchedule:
    """Dense index arrays for one topology."""

    node_count: int
    leaf_count: int
    root_id: int
    # Postorder combine steps, one per internal node (root included, last).
    post_node: np.ndarray  # (S,) destination node id
    post_children: np.ndarray  # (S, 3) child ids, padded with ones_slot
    # Preorder upper-partial steps, one per non-root node (parents first).
    up_node: np.ndarray  # (S2,) destination node id
    up_parent: np.ndarray  # (S2,) parent node id
    up_sibs: np.ndarray  # (S2, 2) sibling ids, padded with ones_slot
    # Parent of every non-root node (by node id): (N-1,).
    parent: np.ndarray
    # Siblings of every non-root node (by node id), ones-slot padded: (N-1, 2).
    node_sibs: np.ndarray
    # Internal non-root nodes in preorder (parents first), for the
    # height-ratio transform of rooted time trees (rooted_tree.hpp:19-24).
    pre_internal_node: np.ndarray  # (I,)
    pre_internal_parent: np.ndarray  # (I,)

    @property
    def ones_slot(self) -> int:
        return self.node_count

    @property
    def edge_count(self) -> int:
        """Number of edges = non-root nodes."""
        return self.node_count - 1


def schedule_of_topology(top: Topology) -> PruningSchedule:
    """Lower one polished topology to a PruningSchedule."""
    if top.id < 0:
        top.polish()
    node_count = top.id + 1
    ones = node_count

    post_node: List[int] = []
    post_children: List[List[int]] = []
    for node in top.postorder():
        if node.is_leaf():
            continue
        kids = [c.id for c in node.children]
        assert len(kids) <= MAX_CHILDREN, "nodes must have <= 3 children"
        post_node.append(node.id)
        post_children.append(kids + [ones] * (MAX_CHILDREN - len(kids)))

    up_node: List[int] = []
    up_parent: List[int] = []
    up_sibs: List[List[int]] = []
    parent = np.full((node_count - 1,), -1, dtype=np.int32)
    pre_internal_node: List[int] = []
    pre_internal_parent: List[int] = []
    for node in top.preorder():
        if node.is_leaf():
            continue
        kids = [c.id for c in node.children]
        for c in node.children:
            parent[c.id] = node.id
            if not c.is_leaf():
                pre_internal_node.append(c.id)
                pre_internal_parent.append(node.id)
            sibs = [k for k in kids if k != c.id]
            up_node.append(c.id)
            up_parent.append(node.id)
            up_sibs.append(sibs + [ones] * (2 - len(sibs)))

    post_node_arr = np.asarray(post_node, dtype=np.int32)
    # The pruning kernels rely on internal ids being postorder-linear
    # (step s writes node leaf_count + s); polish guarantees this.
    assert np.array_equal(
        post_node_arr, np.arange(top.leaf_count, node_count, dtype=np.int32)
    ), "internal node ids must be postorder-linear"
    node_sibs = np.empty((node_count - 1, 2), dtype=np.int32)
    node_sibs[np.asarray(up_node)] = np.asarray(up_sibs, dtype=np.int32)
    return PruningSchedule(
        node_count=node_count,
        leaf_count=top.leaf_count,
        root_id=top.id,
        post_node=post_node_arr,
        post_children=np.asarray(post_children, dtype=np.int32),
        up_node=np.asarray(up_node, dtype=np.int32),
        up_parent=np.asarray(up_parent, dtype=np.int32),
        up_sibs=np.asarray(up_sibs, dtype=np.int32),
        parent=parent,
        node_sibs=node_sibs,
        pre_internal_node=np.asarray(pre_internal_node, dtype=np.int32),
        pre_internal_parent=np.asarray(pre_internal_parent, dtype=np.int32),
    )


@dataclass(frozen=True)
class BatchedSchedule:
    """Stacked schedules for a collection of same-shape trees."""

    node_count: int
    leaf_count: int
    root_id: int
    post_node: np.ndarray  # (B, S)
    post_children: np.ndarray  # (B, S, 3)
    up_node: np.ndarray  # (B, S2)
    up_parent: np.ndarray  # (B, S2)
    up_sibs: np.ndarray  # (B, S2, 2)
    parent: np.ndarray  # (B, N-1)
    node_sibs: np.ndarray  # (B, N-1, 2)
    pre_internal_node: np.ndarray  # (B, I)
    pre_internal_parent: np.ndarray  # (B, I)

    @property
    def ones_slot(self) -> int:
        return self.node_count

    @property
    def tree_count(self) -> int:
        return self.post_node.shape[0]


def batch_schedules(schedules: Sequence[PruningSchedule]) -> BatchedSchedule:
    first = schedules[0]
    for s in schedules:
        assert s.node_count == first.node_count, (
            "all trees in a batch must share a taxon set and rootedness"
        )
        assert s.post_node.shape == first.post_node.shape
    return BatchedSchedule(
        node_count=first.node_count,
        leaf_count=first.leaf_count,
        root_id=first.root_id,
        post_node=np.stack([s.post_node for s in schedules]),
        post_children=np.stack([s.post_children for s in schedules]),
        up_node=np.stack([s.up_node for s in schedules]),
        up_parent=np.stack([s.up_parent for s in schedules]),
        up_sibs=np.stack([s.up_sibs for s in schedules]),
        parent=np.stack([s.parent for s in schedules]),
        node_sibs=np.stack([s.node_sibs for s in schedules]),
        pre_internal_node=np.stack([s.pre_internal_node for s in schedules]),
        pre_internal_parent=np.stack([s.pre_internal_parent for s in schedules]),
    )


def schedules_of_topologies(tops: Sequence[Topology]) -> BatchedSchedule:
    native = _native_batched(tops)
    if native is not None:
        return native
    return batch_schedules([schedule_of_topology(t) for t in tops])


def _native_batched(tops: Sequence[Topology]) -> "BatchedSchedule | None":
    """Fast path: build the batched schedule via the native C++ builder
    (native/libsbn_native.cpp lsbn_build_schedules)."""
    try:
        from ..io import native
    except ImportError:  # pragma: no cover
        return None
    if not tops:
        return None
    first = tops[0]
    if first.id < 0:
        for t in tops:
            t.polish()
    node_count = first.id + 1
    leaf_count = first.leaf_count
    pv_rows = []
    for t in tops:
        if t.id + 1 != node_count or t.leaf_count != leaf_count:
            return None
        pv_rows.append(t.parent_id_vector())
    pv = np.asarray(pv_rows, dtype=np.int32)
    out = native.build_schedules(pv, leaf_count)
    if out is None:
        return None
    # The parent vector IS the per-node parent array; the internal-node
    # preorder steps are the up steps whose destination is internal.
    node_sibs = np.empty((len(tops), node_count - 1, 2), dtype=np.int32)
    rows = np.arange(len(tops))[:, None]
    node_sibs[rows, out["up_node"]] = out["up_sibs"]
    internal_mask = out["up_node"] >= leaf_count
    counts = internal_mask.sum(axis=1)
    if counts.size and not np.all(counts == counts[0]):
        return None
    pre_node = out["up_node"][internal_mask].reshape(len(tops), -1)
    pre_parent = out["up_parent"][internal_mask].reshape(len(tops), -1)
    return BatchedSchedule(
        node_count=node_count,
        leaf_count=leaf_count,
        root_id=node_count - 1,
        post_node=out["post_node"],
        post_children=out["post_children"],
        up_node=out["up_node"],
        up_parent=out["up_parent"],
        up_sibs=out["up_sibs"],
        parent=pv,
        node_sibs=node_sibs,
        pre_internal_node=pre_node,
        pre_internal_parent=pre_parent,
    )
