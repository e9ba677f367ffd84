"""Topology gradients: ∇_φ log q(τ) and VIMCO multiplicative factors.

Reference: unrooted_sbn_instance.cpp GradientOfLogQ/TopologyGradients and
generic_sbn_instance.hpp CalculateVIMCOMultiplicativeFactors.

Dense formulation (eq:gradLogQ): for unrooted topology τ with rootings ρ,

  ∇ log q(τ)[i] = (1/q) Σ_ρ P_ρ ( 1[i ∈ rep_ρ] − p̄_i · 1[seg(i) touched by ρ] )

which decomposes into two scatter-adds: rooting probabilities onto the rep
indices (term 1) and onto the touched normalization segments (term 2). The
whole multi-particle gradient is one jitted program; the reference's
per-tree, per-rooting, per-range loops (a noted PROFILE hotspot,
unrooted_sbn_instance.cpp:114,191) become gathers and scatters.

Host-side prep (touched_segments_of) computes, per rooting, which parameter
blocks (segments) appear in eq:gradLogQ's sum over subsplits s|t in the
rooted tree — the rootsplit block plus each present parent subsplit's child
block, in both orientations (GetSubsplitRanges).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from .probability import probability_normalize_in_log, with_sentinel
from .support import SBNSupport


def multiplicative_factors(log_f):
    """Naive multi-sample ELBO factors (CalculateMultiplicativeFactors)."""
    log_f = jnp.asarray(log_f)
    k = log_f.shape[0]
    log_F = jax.scipy.special.logsumexp(log_f)
    hat_L = log_F - jnp.log(float(k))
    tilde_w = jnp.exp(log_f - log_F)
    return hat_L - tilde_w


def vimco_multiplicative_factors(log_f):
    """VIMCO factors with geometric-mean baseline
    (CalculateVIMCOMultiplicativeFactors)."""
    log_f = jnp.asarray(log_f)
    k = log_f.shape[0]
    log_gm = (jnp.sum(log_f) - log_f) / (k - 1.0)
    # Row j: log_f with entry j replaced by its geometric-mean baseline.
    mat = jnp.broadcast_to(log_f, (k, k))
    mat = jnp.where(jnp.eye(k, dtype=bool), log_gm[:, None], mat)
    per_sample_signal = jax.scipy.special.logsumexp(mat, axis=1) - jnp.log(float(k))
    return multiplicative_factors(log_f) - per_sample_signal


def _touched_tables(support: SBNSupport):
    """Per-index touched-segment lookup tables, cached on the support.

    A rep entry touches a fixed set of segments determined by the index
    alone: the rootsplit index s touches the segments of the ordered parents
    (root + ~root, ~root + root); a PCSP index touches the segments of its
    child subsplit in both orientations (GetSubsplitRanges). Absent parents
    map to the dummy segment id (= num_segments)."""
    cached = getattr(support, "_touched_tables_cache", None)
    if cached is not None:
        return cached
    seg_of_parent = {
        parent: s for s, parent in enumerate(support.parent_to_range, start=1)
    }
    num_segments = len(seg_of_parent) + 1
    rs_count = support.rootsplit_count()
    root_tab = np.full((rs_count, 2), num_segments, dtype=np.int32)
    for s, root in enumerate(support.rootsplits):
        for k, parent in enumerate((root + ~root, (~root) + root)):
            root_tab[s, k] = seg_of_parent.get(parent, num_segments)
    child_tab = np.full((support.gpcsp_count, 2), num_segments, dtype=np.int32)
    for idx, child in support.index_to_child.items():
        for k, parent in enumerate((child, child.rotate_subsplit())):
            child_tab[idx, k] = seg_of_parent.get(parent, num_segments)
    cached = (num_segments, root_tab, child_tab)
    object.__setattr__(support, "_touched_tables_cache", cached)
    return cached


def touched_segments_of(
    support: SBNSupport, reps: np.ndarray, pad_to: int | None = None
) -> np.ndarray:
    """Per rooting, segment ids touched by eq:gradLogQ (host-side).

    reps: (..., E, R) int32 dense unrooted representations.
    Returns (..., E, Smax) int32 padded with the dummy segment id S
    (= num_segments). Vectorized as gathers into precomputed per-index
    tables (_touched_tables); out-of-support rootings yield all-dummy rows."""
    num_segments, root_tab, child_tab = _touched_tables(support)
    sentinel = support.gpcsp_count

    flat = reps.reshape(-1, reps.shape[-1])
    R = flat.shape[1]
    valid = ~(flat >= sentinel).any(axis=1)
    safe = np.where(valid[:, None], flat, 0)
    cols = np.concatenate(
        [
            np.zeros((flat.shape[0], 1), dtype=np.int32),  # rootsplit segment
            root_tab[safe[:, 0]],
            child_tab[safe[:, 1:]].reshape(flat.shape[0], 2 * (R - 1)),
        ],
        axis=1,
    )
    cols = np.where(valid[:, None], cols, num_segments)
    width = pad_to if pad_to is not None else cols.shape[1]
    if width < cols.shape[1]:
        used = int((cols != num_segments).sum(axis=1).max(initial=0))
        assert used <= width, "pad_to too small for touched segments"
        # Compact non-dummy entries left before truncating.
        order = np.argsort(cols == num_segments, axis=1, kind="stable")
        cols = np.take_along_axis(cols, order, axis=1)[:, :width]
    out = np.full((flat.shape[0], width), num_segments, dtype=np.int32)
    out[:, : cols.shape[1]] = cols
    return out.reshape(reps.shape[:-1] + (width,))


def topology_gradients(
    sbn_parameters,
    segment_ids,
    num_segments: int,
    reps,
    touched,
    log_f,
    use_vimco: bool = True,
):
    """Σ_j factor_j ∇_φ log q(τ_j) over particles (TopologyGradients).

    sbn_parameters: (G,) unnormalized log params; reps: (T, E, R) int32;
    touched: (T, E, Sm) int32 (dummy segment = num_segments); log_f: (T,).
    Returns (G,)."""
    params = jnp.asarray(sbn_parameters)
    segment_ids = jnp.asarray(segment_ids)
    reps = jnp.asarray(reps)
    touched = jnp.asarray(touched)
    log_f = jnp.asarray(log_f)
    G = params.shape[0]

    normalized = probability_normalize_in_log(params, segment_ids, num_segments)
    ext = with_sentinel(normalized)

    log_rho = jnp.sum(ext[reps], axis=-1)  # (T, E): log P of each rooting
    log_q = jax.scipy.special.logsumexp(log_rho, axis=-1)  # (T,)

    factors = (
        vimco_multiplicative_factors(log_f)
        if use_vimco
        else multiplicative_factors(log_f)
    )
    # Weight per rooting: factor_j * P_ρ / q_j.
    w = factors[:, None] * jnp.exp(log_rho - log_q[:, None])  # (T, E)

    term1 = (
        jnp.zeros((G + 1,), params.dtype)
        .at[reps.reshape(-1)]
        .add(jnp.broadcast_to(w[:, :, None], reps.shape).reshape(-1))[:G]
    )
    touched_weight = (
        jnp.zeros((num_segments + 1,), params.dtype)
        .at[touched.reshape(-1)]
        .add(jnp.broadcast_to(w[:, :, None], touched.shape).reshape(-1))
    )
    term2 = jnp.exp(normalized) * touched_weight[segment_ids]
    return term1 - term2


def gradient_of_log_q(support: SBNSupport, sbn_parameters, rep: np.ndarray):
    """Single-topology ∇_φ log q(τ) (GradientOfLogQ), for tests."""
    segment_ids = support.segment_ids()
    num_segments = int(segment_ids.max(initial=0)) + 1
    touched = touched_segments_of(support, rep[None])[0]
    # factor 1 and log_f = 0 reduces topology_gradients to grad log q...
    # but multiplicative_factors(0) != 1, so call the core directly.
    params = jnp.asarray(sbn_parameters)
    normalized = probability_normalize_in_log(
        params, jnp.asarray(segment_ids), num_segments
    )
    ext = with_sentinel(normalized)
    reps = jnp.asarray(rep)
    log_rho = jnp.sum(ext[reps], axis=-1)
    log_q = jax.scipy.special.logsumexp(log_rho)
    w = jnp.exp(log_rho - log_q)
    G = params.shape[0]
    term1 = (
        jnp.zeros((G + 1,))
        .at[reps.reshape(-1)]
        .add(jnp.broadcast_to(w[:, None], reps.shape).reshape(-1))[:G]
    )
    tw = (
        jnp.zeros((num_segments + 1,))
        .at[jnp.asarray(touched).reshape(-1)]
        .add(jnp.broadcast_to(w[:, None], touched.shape).reshape(-1))
    )
    term2 = jnp.exp(normalized) * tw[jnp.asarray(segment_ids)]
    return term1 - term2
