"""Time-tree height-ratio transform as differentiable scans.

Reference semantics: rooted_tree.cpp InitializeTimeTreeUsingHeightRatios and
fat_beagle.cpp LogDeterminantJacobian. The reference computes gradients of
this transform with hand-derived BEAST recursions
(rooted_gradient_transforms.cpp); here the transform is a jax.lax.scan over a
preorder schedule, so the ratio/root-height and clock gradients are exact AD.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def node_heights_from_ratios(
    ratios, node_bounds, leaf_count, pre_internal_node, pre_internal_parent,
    n_iters=None,
):
    """height_ratios (leaf_count-1, last entry = root height) -> node heights.

    node_bounds: (N,) max tip date below each node; leaf entries are the tip
    dates themselves. Returns heights (N,).

    Computed by DENSE fixed-point iteration instead of a per-node scan:
    h[v] = b_v + r_v (h[parent] - b_v) propagates one tree level per sweep
    and is exact (and idempotent) once every level has been reached, so
    internal-count sweeps always suffice — and each sweep is one dense
    gather + FMA over all nodes, which reverse-differentiates as dense ops.
    The per-node lax.scan VJP measured 39 ms/launch at fluA B=64 on the
    TPU (0.6 ms per scan step!) vs ~2 ms for this form. Pass n_iters (>=
    max internal depth, e.g. from BatchedSchedule heights) to shorten the
    loop when the caller knows the depth statically."""
    ratios = jnp.asarray(ratios)
    node_bounds = jnp.asarray(node_bounds)
    n = node_bounds.shape[0]
    n_internal = n - leaf_count - 1
    if n_iters is None:
        n_iters = max(1, n_internal)
    dtype = ratios.dtype
    b = node_bounds.astype(dtype)

    # Per-node update operands, aligned to node ids (leaves and root are
    # fixed points: r = 1 keeps h[v] = its initial value... leaves use
    # r = 0 so h = b; the root uses its own slot as "parent" with r = 1).
    r_full = jnp.zeros((n,), dtype)
    r_full = r_full.at[leaf_count:n - 1].set(ratios[:n_internal])
    r_full = r_full.at[n - 1].set(1.0)
    parent_full = jnp.arange(n)
    parent_full = parent_full.at[pre_internal_node].set(pre_internal_parent)

    h0 = b.at[n - 1].set(ratios[-1])

    def sweep(_, h):
        return b + r_full * (h[parent_full] - b)

    return jax.lax.fori_loop(0, n_iters, sweep, h0)


def branch_lengths_from_heights(heights, parent):
    """bl[i] = heights[parent[i]] - heights[i] for non-root nodes i."""
    return heights[parent] - heights[:-1]


def log_det_jacobian(heights, node_bounds, parent, leaf_count):
    """log |det d(heights)/d(ratios)| = sum over internal non-root nodes of
    log(h_parent - bound_node) (fat_beagle.cpp LogDeterminantJacobian)."""
    n = heights.shape[0]
    internal = jnp.arange(leaf_count, n - 1)
    return jnp.sum(
        jnp.log(heights[parent[internal]] - node_bounds[internal])
    )
