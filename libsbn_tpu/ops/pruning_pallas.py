"""Fused Pallas TPU kernel: Felsenstein pruning likelihood + branch gradient.

This is the VMEM-resident formulation designed in docs/performance.md: the
scan engine in ops/pruning.py pays ~390us per sequential step in batched HBM
gathers; here each tree's evolved partials stay in VMEM and the whole
likelihood + linear-time branch gradient (the beagleUpdatePartials /
beagleUpdatePrePartials / beagleCalculateEdgeDerivatives pipeline of
fat_beagle.cpp:119-175) runs as ONE kernel per tree with

  * E-formulation: the buffer holds evolved partials E[n] = P_n M_n, so the
    child "gather" in a combine step is an elementwise product of three
    dynamically-indexed node slabs, and the transition application is a
    STATIC-index (4,4)@(4,PT) MXU dot written to row leaf_count+s (internal
    ids are postorder-linear; see ops/schedule.py);
  * node-major buffers (N+1, 4, PT): the node axis is the UNTILED leading
    dimension, so every dynamic access is a cheap address computation on a
    (1, 4, PT) slab — dynamic *sublane* indexing (the (4, N+1, PT) layout
    tried first) lowers to a slow path and ran no faster than the scan
    engine (21k vs 44k trees/s);
  * no reshape ever touches the minor (lane) dimension and every dot is
    rank 2 — the round-1 Mosaic failure modes ("unsupported shape cast",
    dot_general rank limits) are structurally avoided;
  * dynamic indices come from SMEM (the per-tree post_children schedule);
  * the upward pass (one step per internal node, matching _preorder_pernode)
    fuses the per-edge derivative: when child edge u is formed, its gradient
    row w * (U·Q_scaled E) / (U·E) is written to a per-edge scratch and
    lane-reduced once at the end;
  * trees_per_program T > 1 interleaves T independent trees' recursions in
    one instruction stream: the per-step work is a short chain of small
    vector ops, so a single tree is latency-bound and independent chains
    fill the idle issue slots.

Scope: K = 1 rate category (the bench headline: JC69 + constant sites).
General K falls back to the scan engine. Results match ops/pruning.py's
log_likelihood_and_branch_gradient to float tolerance (same math, same
rescaling scheme).

Shapes: B trees, S = internal-node count combine steps, N1 = node_count + 1
buffer slots (ones slot last), PT = padded pattern count (multiple of 128).
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    sched_ref,  # SMEM (T, S, 3) int32: post_children row per combine step
    freqs_ref,  # SMEM (1, 4)
    q_ref,  # VMEM (4, 4): rate-scaled rate matrix (Q_scaled, K=1)
    P_ref,  # VMEM (T, N1, 4, 4): per-node transition matrices
    tips_ref,  # VMEM (L, 4, PT): leaf tip partials
    w_ref,  # VMEM (1, PT): pattern weights (0 on padding)
    ll_ref,  # out VMEM (T, 1, 1)
    grad_ref,  # out VMEM (T, N1, 1, 1)
    E,  # scratch VMEM (T, N1, 4, PT): evolved partials
    U,  # scratch VMEM (T, N1, 4, PT): upper partials
    G,  # scratch VMEM (T, N1, 1, PT): per-edge weighted gradient rows
    *,
    leaf_count: int,
    root_id: int,
    T: int,
):
    L = leaf_count
    ones_slot = root_id + 1
    n_steps = root_id + 1 - L  # internal node count
    PT = w_ref.shape[1]
    dt = P_ref.dtype
    tiny = jnp.asarray(1e-30, dt)

    def pmat(t, node):
        return P_ref[t, pl.ds(node, 1), :, :][0]  # (4, 4)

    def read(t, ref, node):
        return ref[t, pl.ds(node, 1), :, :][0]  # (4, PT)

    def write(t, ref, node, val):
        ref[t, pl.ds(node, 1), :, :] = val[None]

    # -- init: ones slot is the padding child (inert under row-stochastic P).
    ones_slab = jnp.ones((4, PT), dt)
    for t in range(T):
        write(t, E, ones_slot, ones_slab)

    # -- leaves: E[l] = P_l @ tips[l].
    def leaf_body(l, c):
        tip = tips_ref[pl.ds(l, 1), :, :][0]
        for t in range(T):
            write(t, E, l, jnp.dot(pmat(t, l), tip, preferred_element_type=dt))
        return c

    jax.lax.fori_loop(0, L, leaf_body, 0)

    # -- forward combine steps: step s writes node L + s.
    def fwd_body(s, logscales):
        out = []
        for t in range(T):
            k0 = sched_ref[t, s, 0]
            k1 = sched_ref[t, s, 1]
            k2 = sched_ref[t, s, 2]
            prod = read(t, E, k0) * read(t, E, k1) * read(t, E, k2)  # (4, PT)
            scale = jnp.max(prod, axis=0, keepdims=True)
            scale = jnp.where(scale > 0, scale, jnp.ones_like(scale))
            prod = prod / scale
            write(
                t, E, L + s,
                jnp.dot(pmat(t, L + s), prod, preferred_element_type=dt),
            )
            out.append(logscales[t] + jnp.log(scale))
        return tuple(out)

    logscales = jax.lax.fori_loop(
        0, n_steps, fwd_body, tuple(jnp.zeros((1, PT), dt) for _ in range(T))
    )

    # -- root log-likelihood: bl[root] = 0 so P_root = I and E[root] = M[root].
    for t in range(T):
        Eroot = E[t, root_id : root_id + 1, :, :][0]  # (4, PT), static
        site = jnp.zeros((1, PT), dt)
        for i in range(4):
            site = site + freqs_ref[0, i] * Eroot[i : i + 1, :]
        site = jnp.maximum(site, tiny)
        ll_ref[t, :, :] = jnp.sum(
            w_ref[:] * (jnp.log(site) + logscales[t]), axis=1, keepdims=True
        )

    # -- upward pass + fused edge derivatives; root first (largest id).
    freq_rows = jnp.concatenate(
        [jnp.full((1, PT), freqs_ref[0, i], dt) for i in range(4)], axis=0
    )
    for t in range(T):
        write(t, U, root_id, freq_rows)

    def up_body(step, c):
        node = root_id - step
        s = node - L
        for t in range(T):
            ev_up = jax.lax.dot_general(
                pmat(t, node),
                read(t, U, node),
                (((0,), (0,)), ((), ())),
                preferred_element_type=dt,
            )  # (4, PT) = P_node^T U[node]
            k0 = sched_ref[t, s, 0]
            k1 = sched_ref[t, s, 1]
            k2 = sched_ref[t, s, 2]
            e0 = read(t, E, k0)
            e1 = read(t, E, k1)
            e2 = read(t, E, k2)
            for kid, a, b, ekid in (
                (k0, e1, e2, e0),
                (k1, e0, e2, e1),
                (k2, e0, e1, e2),
            ):
                u = ev_up * a * b  # (4, PT); scales cancel in the ratio
                qe = jnp.dot(q_ref[:], ekid, preferred_element_type=dt)
                denom = jnp.sum(u * ekid, axis=0, keepdims=True)
                num = jnp.sum(u * qe, axis=0, keepdims=True)
                G[t, pl.ds(kid, 1), :, :] = (
                    w_ref[:] * num / jnp.maximum(denom, tiny)
                )[None]
                sc = jnp.max(u, axis=0, keepdims=True)
                sc = jnp.where(sc > 0, sc, jnp.ones_like(sc))
                write(t, U, kid, u / sc)
        return c

    jax.lax.fori_loop(0, n_steps, up_body, 0)

    # One lane reduction over the per-edge rows. Rows never written this tree
    # (the root) carry stale values; the caller slices them away.
    for t in range(T):
        grad_ref[t, :, :, :] = jnp.sum(G[t], axis=2, keepdims=True)


def _default_trees_per_program(B: int) -> int:
    # Measured on v5e (DS1, B=512): T=1 44k trees/s, T=2 25k, T=4 10k — the
    # interleaved streams LOSE to the single chain (VMEM pressure beats the
    # latency hiding), so the default stays 1.
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("leaf_count", "root_id", "interpret", "trees_per_program"),
)
def _pallas_ll_grad(
    post_children, P, Q, tips, freqs, weights, *, leaf_count, root_id,
    interpret, trees_per_program=None,
):
    """post_children: (B, S, 3) int32; P: (B, N1, 4, 4); Q: (4, 4);
    tips: (L, 4, PT); freqs: (1, 4); weights: (1, PT).
    Returns ll (B,), grad (B, N1) — caller slices grad[:, :root_id]."""
    B, S, _ = post_children.shape
    N1 = P.shape[1]
    PT = weights.shape[1]
    L = leaf_count
    dt = P.dtype
    T = trees_per_program or _default_trees_per_program(B)
    assert B % T == 0, (B, T)

    kernel = functools.partial(_kernel, leaf_count=L, root_id=root_id, T=T)
    # The package enables x64 globally (parity needs f64), but Mosaic wants
    # pure-i32 index/loop scalars; trace the kernel with x64 off. (f64 runs
    # interpret-mode only — parity tests — and keeps x64 on.)
    ctx = (
        contextlib.nullcontext()
        if dt == jnp.float64
        else jax.enable_x64(False)
    )
    with ctx:
        ll, grad = pl.pallas_call(
            kernel,
            grid=(B // T,),
            in_specs=[
                pl.BlockSpec(
                    (T, S, 3), lambda b: (b, 0, 0), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec((1, 4), lambda b: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((4, 4), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (T, N1, 4, 4), lambda b: (b, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (L, 4, PT), lambda b: (0, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((1, PT), lambda b: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec(
                    (T, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (T, N1, 1, 1), lambda b: (b, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, 1, 1), dt),
                jax.ShapeDtypeStruct((B, N1, 1, 1), dt),
            ],
            scratch_shapes=[
                pltpu.VMEM((T, N1, 4, PT), dt),
                pltpu.VMEM((T, N1, 4, PT), dt),
                pltpu.VMEM((T, N1, 1, PT), dt),
            ],
            compiler_params=(
                pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
                if T > 1
                else None
            ),
            interpret=interpret,
        )(post_children, freqs, Q, P, tips, weights)
    return ll[:, 0, 0], grad[:, :, 0, 0]


def pad_patterns(tips, weights, multiple: int = 128):
    """Pad the pattern axis to a lane multiple: tips with ones (numerically
    inert), weights with zeros. tips: (L, 4, Pp) -> (L, 4, PT). jnp ops, so
    it traces inside jit (static shapes) and accepts numpy inputs."""
    n_pat = weights.shape[0]
    PT = ((n_pat + multiple - 1) // multiple) * multiple
    if PT == n_pat:
        return tips, weights
    tips = jnp.asarray(tips)
    weights = jnp.asarray(weights)
    tips_p = jnp.concatenate(
        [tips, jnp.ones(tips.shape[:2] + (PT - n_pat,), tips.dtype)], axis=-1
    )
    w_p = jnp.concatenate(
        [weights, jnp.zeros((PT - n_pat,), weights.dtype)]
    )
    return tips_p, w_p


def log_likelihood_and_branch_gradient_pallas(
    post_children, P, Q_scaled, tips, freqs, weights, *, root_id,
    interpret=False, trees_per_program=None,
):
    """Drop-in for ops.pruning.log_likelihood_and_branch_gradient over a
    BATCH of trees, K = 1 only.

    post_children: (B, S, 3) int32; P: (B, N1, 1, 4, 4) or (B, N1, 4, 4);
    Q_scaled: (1, 4, 4) or (4, 4); tips: (L, 4, Pp); freqs: (4,);
    weights: (Pp,). Returns (ll (B,), grad (B, root_id))."""
    P = jnp.asarray(P)
    if P.ndim == 5:
        assert P.shape[2] == 1, "pallas path supports K = 1 only"
        P = P[:, :, 0]
    Q = jnp.asarray(Q_scaled)
    if Q.ndim == 3:
        assert Q.shape[0] == 1, "pallas path supports K = 1 only"
        Q = Q[0]
    leaf_count = tips.shape[0]
    tips_p, w_p = pad_patterns(tips, weights)
    w2 = jnp.asarray(w_p, P.dtype)[None, :]
    f2 = jnp.asarray(freqs, P.dtype)[None, :]
    ll, grad = _pallas_ll_grad(
        jnp.asarray(post_children, jnp.int32),
        P,
        Q.astype(P.dtype),
        jnp.asarray(tips_p, P.dtype),
        f2,
        w2,
        leaf_count=leaf_count,
        root_id=root_id,
        interpret=interpret,
        trees_per_program=trees_per_program,
    )
    return ll, grad[:, :root_id]
