"""Pallas log-likelihood with a custom VJP: the backward kernel emits the
transition-matrix cotangent dP (plus dfreqs/dprops), so EVERY model gradient
— branch lengths, GTR in stick space, Weibull shape, clock rates, node-height
ratios — chains through ordinary JAX AD of P = f(model params), exactly like
the scan engine's custom_vjp (ops/pruning.py _ll_bwd) but at Pallas speed.

Forward: the E-form recursion of ops/pruning_pallas.py (ll only — no upper
pass). Backward: recompute in M-form (residuals would be GBs; remat is the
memory plan), run the upper pass, and for each edge contract
dP[e,k] = (U'_k * w/denom) @ M_k^T over the pattern axis (one lane-contracting
MXU dot per category), where U' carries the category proportions folded in.
Root-slot and ones-slot dP rows are zero (the root's P is never consulted:
bl[root] = 0 keeps E[root] = M[root]).

tips and weights are treated as constants (zero cotangents) — they are data,
not parameters; differentiate via the scan engine if ever needed.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pruning_pallas import _apply_mode


def _x64_ctx(dt):
    return contextlib.nullcontext() if dt == jnp.float64 else jax.enable_x64(False)


# -- forward kernel: E-form, ll only -----------------------------------------
def _fwd_kernel(
    sched_ref, freqs_ref, props_ref, P_ref, tips_ref, w_ref,
    ll_ref, E,
    *, leaf_count: int, root_id: int, K: int, vpu: bool,
):
    L = leaf_count
    ones_slot = root_id + 1
    n_steps = root_id + 1 - L
    PT = w_ref.shape[1]
    R = 4 * K
    dt = P_ref.dtype
    acc = jnp.float32 if dt == jnp.bfloat16 else dt

    def pmat(node, k):
        return P_ref[0, pl.ds(node * K + k, 1), :, :][0]

    def read(ref, node):
        return ref[pl.ds(node, 1), :, :][0]

    def write(ref, node, val):
        ref[pl.ds(node, 1), :, :] = val[None]

    def apply_blocks(node, slab):
        # VPU broadcast-FMA or MXU dot; see pruning_pallas.apply_blocks.
        outs = []
        for k in range(K):
            block = slab[4 * k : 4 * k + 4, :]
            m = pmat(node, k)
            if vpu:
                t01 = m[:, 0:1] * block[0:1, :] + m[:, 1:2] * block[1:2, :]
                t23 = m[:, 2:3] * block[2:3, :] + m[:, 3:4] * block[3:4, :]
                out = t01 + t23
            else:
                out = jnp.dot(m, block, preferred_element_type=acc)
            outs.append(out.astype(dt))
        return outs[0] if K == 1 else jnp.concatenate(outs, axis=0)

    write(E, ones_slot, jnp.ones((R, PT), dt))

    def leaf_body(l, c):
        tip4 = tips_ref[pl.ds(l, 1), :, :][0]
        tip = tip4 if K == 1 else jnp.concatenate([tip4] * K, axis=0)
        write(E, l, apply_blocks(l, tip))
        return c

    jax.lax.fori_loop(0, L, leaf_body, 0)

    def fwd_body(s, logscale):
        k0 = sched_ref[0, s, 0]
        k1 = sched_ref[0, s, 1]
        k2 = sched_ref[0, s, 2]
        prod = read(E, k0) * read(E, k1) * read(E, k2)
        scale = jnp.max(prod, axis=0, keepdims=True)
        scale = jnp.where(scale > 0, scale, jnp.ones_like(scale))
        write(E, L + s, apply_blocks(L + s, prod / scale))
        return logscale + jnp.log(scale)

    logscale = jax.lax.fori_loop(0, n_steps, fwd_body, jnp.zeros((1, PT), dt))

    Eroot = E[root_id : root_id + 1, :, :][0]
    site = jnp.zeros((1, PT), dt)
    for k in range(K):
        for i in range(4):
            site = site + (props_ref[0, k] * freqs_ref[0, i]) * Eroot[
                4 * k + i : 4 * k + i + 1, :
            ]
    site = jnp.maximum(site, jnp.asarray(1e-30, dt))
    ll_ref[0, :, :] = jnp.sum(
        w_ref[:] * (jnp.log(site) + logscale), axis=1, keepdims=True
    )


# -- backward kernel: M-form recompute + upper pass + dP ---------------------
def _bwd_kernel(
    sched_ref, freqs_ref, props_ref, P_ref, PT_ref, tips_ref, w_ref,
    dP_ref,  # out (1, N1*K, 4, 4)
    dfreqs_ref,  # out (1, 4, 1)
    dprops_ref,  # out (1, K, 1)
    M, E, U,
    *, leaf_count: int, root_id: int, K: int, vpu: bool,
):
    L = leaf_count
    ones_slot = root_id + 1
    n_steps = root_id + 1 - L
    PT = w_ref.shape[1]
    R = 4 * K
    dt = P_ref.dtype
    acc = jnp.float32 if dt == jnp.bfloat16 else dt
    tiny = jnp.asarray(1e-30, dt)

    def pmat(node, k):
        return P_ref[0, pl.ds(node * K + k, 1), :, :][0]

    def pmat_t(node, k):
        return PT_ref[0, pl.ds(node * K + k, 1), :, :][0]

    def read(ref, node):
        return ref[pl.ds(node, 1), :, :][0]

    def write(ref, node, val):
        ref[pl.ds(node, 1), :, :] = val[None]

    def apply_blocks(node, slab, transpose=False):
        # VPU broadcast-FMA or MXU dot; see pruning_pallas.apply_blocks.
        outs = []
        for k in range(K):
            block = slab[4 * k : 4 * k + 4, :]
            if vpu:
                m = pmat_t(node, k) if transpose else pmat(node, k)
                t01 = m[:, 0:1] * block[0:1, :] + m[:, 1:2] * block[1:2, :]
                t23 = m[:, 2:3] * block[2:3, :] + m[:, 3:4] * block[3:4, :]
                out = t01 + t23
            elif transpose:
                out = jax.lax.dot_general(
                    pmat(node, k), block, (((0,), (0,)), ((), ())),
                    preferred_element_type=acc,
                )
            else:
                out = jnp.dot(pmat(node, k), block, preferred_element_type=acc)
            outs.append(out.astype(dt))
        return outs[0] if K == 1 else jnp.concatenate(outs, axis=0)

    # Forward in M-form: M rows are rescaled partials, E rows their evolved
    # images (E[n] = P_n M_n), both needed by the backward contractions.
    ones_slab = jnp.ones((R, PT), dt)
    write(M, ones_slot, ones_slab)
    write(E, ones_slot, ones_slab)

    def leaf_body(l, c):
        tip4 = tips_ref[pl.ds(l, 1), :, :][0]
        tip = tip4 if K == 1 else jnp.concatenate([tip4] * K, axis=0)
        write(M, l, tip)
        write(E, l, apply_blocks(l, tip))
        return c

    jax.lax.fori_loop(0, L, leaf_body, 0)

    def fwd_body(s, c):
        k0 = sched_ref[0, s, 0]
        k1 = sched_ref[0, s, 1]
        k2 = sched_ref[0, s, 2]
        prod = read(E, k0) * read(E, k1) * read(E, k2)
        scale = jnp.max(prod, axis=0, keepdims=True)
        scale = jnp.where(scale > 0, scale, jnp.ones_like(scale))
        prod = prod / scale
        node = L + s
        write(M, node, prod)
        write(E, node, apply_blocks(node, prod))
        return c

    jax.lax.fori_loop(0, n_steps, fwd_body, 0)

    # Root-based cotangents. site here is the rescaled site likelihood; the
    # rescale factors cancel in w/site just as in _ll_bwd's ratios.
    Mroot = M[root_id : root_id + 1, :, :][0]
    site = jnp.zeros((1, PT), dt)
    for k in range(K):
        for i in range(4):
            site = site + (props_ref[0, k] * freqs_ref[0, i]) * Mroot[
                4 * k + i : 4 * k + i + 1, :
            ]
    w_over_site = w_ref[:] / jnp.maximum(site, tiny)
    dfq = []
    for i in range(4):
        row = jnp.zeros((1, PT), dt)
        for k in range(K):
            row = row + props_ref[0, k] * Mroot[4 * k + i : 4 * k + i + 1, :]
        dfq.append(jnp.sum(row * w_over_site, axis=1, keepdims=True))
    dfreqs_ref[0, :, :] = jnp.concatenate(dfq, axis=0)  # (4, 1)
    dpr = []
    for k in range(K):
        row = jnp.zeros((1, PT), dt)
        for i in range(4):
            row = row + freqs_ref[0, i] * Mroot[4 * k + i : 4 * k + i + 1, :]
        dpr.append(jnp.sum(row * w_over_site, axis=1, keepdims=True))
    dprops_ref[0, :, :] = jnp.concatenate(dpr, axis=0)  # (K, 1)

    # Upper pass with props folded in; dP per edge as it forms.
    freq_rows = jnp.concatenate(
        [
            jnp.full((1, PT), props_ref[0, k] * freqs_ref[0, i], dt)
            for k in range(K)
            for i in range(4)
        ],
        axis=0,
    )
    write(U, root_id, freq_rows)

    def up_body(t, c):
        node = root_id - t
        s = node - L
        ev_up = apply_blocks(node, read(U, node), transpose=True)
        k0 = sched_ref[0, s, 0]
        k1 = sched_ref[0, s, 1]
        k2 = sched_ref[0, s, 2]
        e0 = read(E, k0)
        e1 = read(E, k1)
        e2 = read(E, k2)
        for kid, a, b, ekid in (
            (k0, e1, e2, e0),
            (k1, e0, e2, e1),
            (k2, e0, e1, e2),
        ):
            u = ev_up * a * b  # (R, PT)
            denom = jnp.sum(u * ekid, axis=0, keepdims=True)
            uw = u * (w_ref[:] / jnp.maximum(denom, tiny))
            mkid = read(M, kid)
            for k in range(K):
                # dP[kid,k] = (U'w)_k @ M_k^T, contracting the pattern axis.
                dP_ref[0, pl.ds(kid * K + k, 1), :, :] = jax.lax.dot_general(
                    uw[4 * k : 4 * k + 4, :],
                    mkid[4 * k : 4 * k + 4, :],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=acc,
                ).astype(dt)[None]
            sc = jnp.max(u, axis=0, keepdims=True)
            sc = jnp.where(sc > 0, sc, jnp.ones_like(sc))
            write(U, kid, u / sc)
        return c

    jax.lax.fori_loop(0, n_steps, up_body, 0)

    # The root row is never written; the ones slot collects garbage from the
    # pad children. Both are structurally zero (gp_dag-style convention:
    # their P is the identity at bl = 0 and is not a parameter).
    zero44 = jnp.zeros((1, 4, 4), dt)
    for k in range(K):
        dP_ref[0, pl.ds(root_id * K + k, 1), :, :] = zero44
        dP_ref[0, pl.ds(ones_slot * K + k, 1), :, :] = zero44


def _specs(B, S, N1, K, L, PT, with_pt):
    """with_pt: include the transposed-P input (backward kernel only —
    the forward kernel never reads it, and shipping it doubled the
    forward pass's P-matrix bandwidth for nothing)."""
    in_specs = [
        pl.BlockSpec((1, S, 3), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 4), lambda b: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, K), lambda b: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(
            (1, N1 * K, 4, 4), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
    ]
    if with_pt:
        in_specs.append(
            pl.BlockSpec(
                (1, N1 * K, 4, 4), lambda b: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    in_specs += [
        pl.BlockSpec((L, 4, PT), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, PT), lambda b: (0, 0), memory_space=pltpu.VMEM),
    ]
    return in_specs


@functools.partial(
    jax.jit, static_argnames=("leaf_count", "root_id", "interpret", "vpu")
)
def _fwd_call(post_children, P2, tips, freqs, props, weights, *, leaf_count,
              root_id, interpret, vpu):
    B, S, _ = post_children.shape
    K = props.shape[1]
    N1 = P2.shape[1] // K
    PT = weights.shape[1]
    L = leaf_count
    dt = P2.dtype
    kernel = functools.partial(
        _fwd_kernel, leaf_count=L, root_id=root_id, K=K, vpu=vpu
    )
    with _x64_ctx(dt):
        (ll,) = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=_specs(B, S, N1, K, L, PT, with_pt=False),
            out_specs=[
                pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[jax.ShapeDtypeStruct((B, 1, 1), dt)],
            scratch_shapes=[pltpu.VMEM((N1, 4 * K, PT), dt)],
            interpret=interpret,
        )(post_children, freqs, props, P2, tips, weights)
    return ll[:, 0, 0]


@functools.partial(
    jax.jit, static_argnames=("leaf_count", "root_id", "interpret", "vpu")
)
def _bwd_call(post_children, P2, tips, freqs, props, weights, *, leaf_count,
              root_id, interpret, vpu):
    B, S, _ = post_children.shape
    K = props.shape[1]
    N1 = P2.shape[1] // K
    PT = weights.shape[1]
    L = leaf_count
    dt = P2.dtype
    kernel = functools.partial(
        _bwd_kernel, leaf_count=L, root_id=root_id, K=K, vpu=vpu
    )
    P2T = jnp.swapaxes(P2, -1, -2)
    with _x64_ctx(dt):
        dP, dfreqs, dprops = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=_specs(B, S, N1, K, L, PT, with_pt=True),
            out_specs=[
                pl.BlockSpec(
                    (1, N1 * K, 4, 4), lambda b: (b, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 4, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, K, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, N1 * K, 4, 4), dt),
                jax.ShapeDtypeStruct((B, 4, 1), dt),
                jax.ShapeDtypeStruct((B, K, 1), dt),
            ],
            scratch_shapes=[
                pltpu.VMEM((N1, 4 * K, PT), dt),
                pltpu.VMEM((N1, 4 * K, PT), dt),
                pltpu.VMEM((N1, 4 * K, PT), dt),
            ],
            interpret=interpret,
        )(post_children, freqs, props, P2, P2T, tips, weights)
    return dP, dfreqs[:, :, 0], dprops[:, :, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def log_likelihoods_pallas(
    post_children, P, freqs, props, tips, weights, leaf_count, root_id,
    interpret=False,
):
    """(B,) log likelihoods. P: (B, N1, K, 4, 4); freqs: (4,); props: (K,);
    tips: (L, 4, PT) ones-padded; weights: (PT,) zero-padded (pad with
    ops.pruning_pallas.pad_patterns). Differentiable in P, freqs, props —
    tips/weights/schedules get zero cotangents (they are data)."""
    B, N1, K = P.shape[:3]
    return _fwd_call(
        post_children, P.reshape(B, N1 * K, 4, 4), tips,
        freqs[None, :].astype(P.dtype), props[None, :].astype(P.dtype),
        weights[None, :].astype(P.dtype),
        leaf_count=leaf_count, root_id=root_id, interpret=interpret,
        vpu=_apply_mode(P.dtype),
    )


def _llp_fwd(post_children, P, freqs, props, tips, weights, leaf_count,
             root_id, interpret):
    ll = log_likelihoods_pallas(
        post_children, P, freqs, props, tips, weights, leaf_count, root_id,
        interpret,
    )
    return ll, (post_children, P, freqs, props, tips, weights)


def _llp_bwd(leaf_count, root_id, interpret, res, g):
    post_children, P, freqs, props, tips, weights = res
    B, N1, K = P.shape[:3]
    dP2, dfreqs_b, dprops_b = _bwd_call(
        post_children, P.reshape(B, N1 * K, 4, 4), tips,
        freqs[None, :].astype(P.dtype), props[None, :].astype(P.dtype),
        weights[None, :].astype(P.dtype),
        leaf_count=leaf_count, root_id=root_id, interpret=interpret,
        vpu=_apply_mode(P.dtype),
    )
    gb = g[:, None, None, None]
    dP = (dP2 * gb).reshape(B, N1, K, 4, 4)
    dfreqs = jnp.sum(dfreqs_b * g[:, None], axis=0).astype(freqs.dtype)
    dprops = jnp.sum(dprops_b * g[:, None], axis=0).astype(props.dtype)
    zero_pc = np.zeros(post_children.shape, dtype=jax.dtypes.float0)
    return (
        zero_pc, dP, dfreqs, dprops,
        jnp.zeros_like(tips), jnp.zeros_like(weights),
    )


log_likelihoods_pallas.defvjp(_llp_fwd, _llp_bwd)
