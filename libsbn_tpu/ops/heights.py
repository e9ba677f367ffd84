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
    ratios, node_bounds, leaf_count, pre_internal_node, pre_internal_parent
):
    """height_ratios (leaf_count-1, last entry = root height) -> node heights.

    node_bounds: (N,) max tip date below each node; leaf entries are the tip
    dates themselves. Returns heights (N,)."""
    ratios = jnp.asarray(ratios)
    node_bounds = jnp.asarray(node_bounds)
    n = node_bounds.shape[0]
    heights = jnp.zeros((n,), dtype=ratios.dtype)
    heights = heights.at[:leaf_count].set(node_bounds[:leaf_count])
    heights = heights.at[n - 1].set(ratios[-1])

    def step(heights, xs):
        node, parent = xs
        h = node_bounds[node] + ratios[node - leaf_count] * (
            heights[parent] - node_bounds[node]
        )
        return heights.at[node].set(h), None

    heights, _ = jax.lax.scan(
        step, heights, (pre_internal_node, pre_internal_parent)
    )
    return heights


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
