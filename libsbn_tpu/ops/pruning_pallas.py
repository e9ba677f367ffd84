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
  * node-major buffers (N+1, 4K, PT): the node axis is the UNTILED leading
    dimension, so every dynamic access is a cheap address computation on a
    (1, 4K, PT) slab — dynamic *sublane* indexing (the state-major layout
    tried first) lowers to a slow path and ran no faster than the scan
    engine (21k vs 44k trees/s on DS1);
  * K rate categories stack on the sublane axis (rows 4k+i); categories
    never mix inside the recursion, so each step applies K block dots, and
    the category proportions fold into the root upper partial so the
    per-edge derivative contraction is a plain row reduction;
  * no reshape ever touches the minor (lane) dimension and every dot is
    rank 2 — the round-1 Mosaic failure modes ("unsupported shape cast",
    dot_general rank limits) are structurally avoided;
  * dynamic indices come from SMEM (the per-tree post_children schedule);
  * the upward pass (one step per internal node, matching _preorder_pernode)
    fuses the per-edge derivative: when child edge u is formed, its gradient
    row w * (U·Q_scaled E) / (U·E) is written to a per-edge scratch and
    lane-reduced once at the end.

Works for any 4-state substitution model and category count (JC69/GTR ×
constant/Weibull): the model enters only through the per-node transition
matrices, the stationary freqs, the category props, and the rate-scaled
derivative matrices. Results match ops/pruning.py's
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    sched_ref,  # SMEM (1, S, 3) int32: post_children row per combine step
    freqs_ref,  # SMEM (1, 4)
    props_ref,  # SMEM (1, K): rate-category proportions
    q_ref,  # VMEM (K, 4, 4): rate-scaled rate matrices (Q * r_k)
    P_ref,  # VMEM (1, N1*K, 4, 4): transition matrices, row node*K + k
    PT_ref,  # VMEM (1, N1*K, 4, 4): transposed transition matrices
    tips_ref,  # VMEM (L, 4, PT): leaf tip partials
    w_ref,  # VMEM (1, PT): pattern weights (0 on padding)
    ll_ref,  # out VMEM (1, 1, 1, 1): this (tree, tile) partial ll
    grad_ref,  # out VMEM (1, 1, N1, 1): this (tree, tile) partial gradient
    E,  # scratch VMEM (N1, 4K, PT): evolved partials
    U,  # scratch VMEM (N1, 4K, PT): upper partials (props folded in)
    G,  # scratch VMEM (N1, 1, PT): per-edge weighted gradient rows
    *,
    leaf_count: int,
    root_id: int,
    K: int,
    vpu: bool,
):
    L = leaf_count
    ones_slot = root_id + 1
    n_steps = root_id + 1 - L  # internal node count
    PT = w_ref.shape[1]
    R = 4 * K  # slab rows
    dt = P_ref.dtype
    # bf16 slabs keep partials/dots in bf16 (memory + MXU), but scales,
    # logscale accumulation, derivative ratios, and outputs stay f32:
    # Mosaic rejects bf16 compares, and a ~1e4-magnitude log-likelihood in
    # bf16 would lose ~30 units.
    cdt = jnp.float32 if dt == jnp.bfloat16 else dt
    tiny = jnp.asarray(1e-30, cdt)

    def pmat(node, k):
        return P_ref[0, pl.ds(node * K + k, 1), :, :][0]  # (4, 4)

    def pmat_t(node, k):
        return PT_ref[0, pl.ds(node * K + k, 1), :, :][0]  # (4, 4), P^T

    def read(ref, node):
        return ref[pl.ds(node, 1), :, :][0]  # (R, PT)

    def write(ref, node, val):
        ref[pl.ds(node, 1), :, :] = val[None]

    # Mosaic requires 32-bit matmul accumulators (bf16 inputs accumulate f32).
    acc = jnp.float32 if dt == jnp.bfloat16 else dt

    def apply_blocks(mats_of_k, slab, transpose=False):
        """Per-category 4x4 transition applies on the K row blocks of a slab.

        Two lowerings (docs/performance.md round-3 measurements):
        * vpu=True (f32 default): broadcast FMAs — out[i,:] = sum_j
          m[i,j]*slab[j,:] as (4,1)x(1,PT) products, pairwise-summed. Exact
          f32, no MXU passes: Mosaic supports only DEFAULT (1-pass bf16,
          fails the parity gate by ~96 LL units) or HIGHEST (6-pass, 28%
          slower than this) for dots, and a 4-row dot uses 4/128 MXU rows
          anyway. Callers pass the transposed matrices for transpose mode.
        * vpu=False: MXU dots at the trace-time matmul precision (bf16
          paths, and the accuracy fallback via LIBSBN_TPU_PALLAS_APPLY=mxu).
        """
        outs = []
        for k in range(K):
            block = slab[4 * k : 4 * k + 4, :]
            m = mats_of_k(k)
            if vpu:
                t01 = m[:, 0:1] * block[0:1, :] + m[:, 1:2] * block[1:2, :]
                t23 = m[:, 2:3] * block[2:3, :] + m[:, 3:4] * block[3:4, :]
                out = t01 + t23
            elif transpose:
                out = jax.lax.dot_general(
                    m, block, (((0,), (0,)), ((), ())),
                    preferred_element_type=acc,
                )
            else:
                out = jnp.dot(m, block, preferred_element_type=acc)
            outs.append(out.astype(dt))
        return outs[0] if K == 1 else jnp.concatenate(outs, axis=0)

    # -- init: ones slot is the padding child (inert under row-stochastic P).
    write(E, ones_slot, jnp.ones((R, PT), dt))

    # -- leaves: E[l] = P_l @ tips[l], per category.
    def leaf_body(l, c):
        tip4 = tips_ref[pl.ds(l, 1), :, :][0]  # (4, PT)
        tip = tip4 if K == 1 else jnp.concatenate([tip4] * K, axis=0)
        write(E, l, apply_blocks(lambda k: pmat(l, k), tip))
        return c

    jax.lax.fori_loop(0, L, leaf_body, 0)

    # -- forward combine steps: step s writes node L + s.
    def fwd_body(s, logscale):
        k0 = sched_ref[0, s, 0]
        k1 = sched_ref[0, s, 1]
        k2 = sched_ref[0, s, 2]
        prod = read(E, k0) * read(E, k1) * read(E, k2)  # (R, PT)
        scale = jnp.max(prod.astype(cdt), axis=0, keepdims=True)
        scale = jnp.where(scale > 0, scale, jnp.ones_like(scale))
        prod = (prod.astype(cdt) / scale).astype(dt)
        node = L + s
        write(E, node, apply_blocks(lambda k: pmat(node, k), prod))
        return logscale + jnp.log(scale)

    logscale = jax.lax.fori_loop(
        0, n_steps, fwd_body, jnp.zeros((1, PT), cdt)
    )

    # -- root log-likelihood: bl[root] = 0 so P_root = I and E[root] = M[root].
    Eroot = E[root_id : root_id + 1, :, :][0].astype(cdt)  # (R, PT), static
    site = jnp.zeros((1, PT), cdt)
    for k in range(K):
        for i in range(4):
            site = site + (props_ref[0, k] * freqs_ref[0, i]) * Eroot[
                4 * k + i : 4 * k + i + 1, :
            ]
    site = jnp.maximum(site, tiny)
    ll_ref[0, 0, :, :] = jnp.sum(
        w_ref[:] * (jnp.log(site) + logscale), axis=1, keepdims=True
    )

    # -- upward pass + fused edge derivatives; root first (largest id).
    # U[root][4k+i] = props_k * freqs_i: folding props in makes the final
    # contraction a plain row sum (categories propagate independently).
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
        ev_up = apply_blocks(
            (lambda k: pmat_t(node, k)) if vpu else (lambda k: pmat(node, k)),
            read(U, node), transpose=True,
        )  # (R, PT) = P_node^T U[node] per category
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
            u = ev_up * a * b  # (R, PT); scales cancel in the ratio
            qe = apply_blocks(lambda k: q_ref[k], ekid)
            denom = jnp.sum((u * ekid).astype(cdt), axis=0, keepdims=True)
            num = jnp.sum((u * qe).astype(cdt), axis=0, keepdims=True)
            G[pl.ds(kid, 1), :, :] = (
                w_ref[:] * num / jnp.maximum(denom, tiny)
            )[None]
            sc = jnp.max(u.astype(cdt), axis=0, keepdims=True)
            sc = jnp.where(sc > 0, sc, jnp.ones_like(sc))
            write(U, kid, (u.astype(cdt) / sc).astype(dt))
        return c

    jax.lax.fori_loop(0, n_steps, up_body, 0)

    # One lane reduction over the per-edge rows. Rows never written this tree
    # (the root) carry stale values; the caller slices them away.
    grad_ref[0, 0, :, :] = jnp.sum(G[:], axis=2)


@functools.partial(
    jax.jit,
    static_argnames=("leaf_count", "root_id", "tile", "interpret", "vpu"),
)
def _pallas_ll_grad(
    post_children, P, Q, tips, freqs, props, weights, *, leaf_count, root_id,
    tile, interpret, vpu,
):
    """post_children: (B, S, 3) int32; P: (B, N1, K, 4, 4); Q: (K, 4, 4);
    tips: (L, 4, PT); freqs: (1, 4); props: (1, K); weights: (1, PT).
    Returns ll (B,), grad (B, N1) — caller slices grad[:, :root_id].

    The pattern axis tiles across the grid's second dimension (each tile's
    recursion is independent; per-tile ll/grad partials are summed outside),
    so VMEM holds (N1, 4K, tile) slabs instead of the full pattern width —
    this is what admits large-taxa × K-category × long-alignment workloads
    (e.g. 69 taxa × Weibull+4 × 1k patterns needs 18 MB untiled)."""
    B, S, _ = post_children.shape
    _, N1, K = P.shape[:3]
    PT = weights.shape[1]
    T = PT // tile
    L = leaf_count
    dt = P.dtype
    cdt = jnp.float32 if dt == jnp.bfloat16 else dt
    P2 = P.reshape(B, N1 * K, 4, 4)
    P2T = jnp.swapaxes(P2, -1, -2)

    kernel = functools.partial(
        _kernel, leaf_count=L, root_id=root_id, K=K, vpu=vpu
    )
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
            grid=(B, T),
            in_specs=[
                pl.BlockSpec(
                    (1, S, 3), lambda b, t: (b, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (1, 4), lambda b, t: (0, 0), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec(
                    (1, K), lambda b, t: (0, 0), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec(
                    (K, 4, 4), lambda b, t: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, N1 * K, 4, 4), lambda b, t: (b, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, N1 * K, 4, 4), lambda b, t: (b, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (L, 4, tile), lambda b, t: (0, 0, t),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, tile), lambda b, t: (0, t), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, 1, 1, 1), lambda b, t: (b, t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, N1, 1), lambda b, t: (b, t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, T, 1, 1), cdt),
                jax.ShapeDtypeStruct((B, T, N1, 1), cdt),
            ],
            scratch_shapes=[
                pltpu.VMEM((N1, 4 * K, tile), dt),
                pltpu.VMEM((N1, 4 * K, tile), dt),
                pltpu.VMEM((N1, 1, tile), cdt),
            ],
            interpret=interpret,
        )(post_children, freqs, props, Q, P2, P2T, tips, weights)
    return ll[:, :, 0, 0].sum(axis=1), grad[:, :, :, 0].sum(axis=1)


def _auto_tile(N1, K, L, PT, itemsize, budget=12 * 2**20):
    """Largest 128-multiple divisor of PT whose VMEM working set fits."""
    per_lane = (2 * N1 * 4 * K + N1 + 4 * L + 4) * itemsize
    m = PT // 128
    divisors = sorted((d for d in range(1, m + 1) if m % d == 0), reverse=True)
    for d in divisors:
        if d * 128 * per_lane <= budget:
            return d * 128
    return 128


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


def _apply_mode(dtype, apply=None):
    """Resolve the kernel apply lowering: 'vpu' (exact-f32 broadcast FMAs,
    the fast default) or 'mxu' (dots at the trace-time matmul precision).
    bf16 slabs always use MXU dots (their f32 accumulators beat bf16 VPU
    products). Env override: LIBSBN_TPU_PALLAS_APPLY."""
    import os

    if dtype == jnp.bfloat16:
        return False
    mode = apply or os.environ.get("LIBSBN_TPU_PALLAS_APPLY", "vpu")
    assert mode in ("vpu", "mxu"), mode
    return mode == "vpu"


def log_likelihood_and_branch_gradient_pallas(
    post_children, P, Q_scaled, tips, freqs, weights, *, root_id,
    props=None, interpret=False, trees_per_program=None, tile=None,
    apply=None,
):
    """Drop-in for ops.pruning.log_likelihood_and_branch_gradient over a
    BATCH of trees.

    post_children: (B, S, 3) int32; P: (B, N1, K, 4, 4) or (B, N1, 4, 4)
    (K = 1); Q_scaled: (K, 4, 4) or (4, 4); tips: (L, 4, Pp); freqs: (4,);
    props: (K,) category proportions (default uniform/[1] for K = 1);
    weights: (Pp,). Returns (ll (B,), grad (B, root_id))."""
    del trees_per_program  # measured slower than one tree per program
    P = jnp.asarray(P)
    if P.ndim == 4:
        P = P[:, :, None]
    Q = jnp.asarray(Q_scaled)
    if Q.ndim == 2:
        Q = Q[None]
    K = P.shape[2]
    assert Q.shape[0] == K, (Q.shape, K)
    if props is None:
        props = jnp.full((K,), 1.0 / K, P.dtype) if K > 1 else jnp.ones((1,), P.dtype)
    leaf_count = tips.shape[0]
    tips_p, w_p = pad_patterns(tips, weights)
    if tile is None:
        tile = _auto_tile(
            P.shape[1], K, leaf_count, w_p.shape[0], jnp.dtype(P.dtype).itemsize
        )
    cdt = jnp.float32 if P.dtype == jnp.bfloat16 else P.dtype
    w2 = jnp.asarray(w_p, cdt)[None, :]
    f2 = jnp.asarray(freqs, cdt)[None, :]
    pr2 = jnp.asarray(props, cdt)[None, :]
    ll, grad = _pallas_ll_grad(
        jnp.asarray(post_children, jnp.int32),
        P,
        Q.astype(P.dtype),
        jnp.asarray(tips_p, P.dtype),
        f2,
        pr2,
        w2,
        leaf_count=leaf_count,
        root_id=root_id,
        tile=tile,
        interpret=interpret,
        vpu=_apply_mode(P.dtype, apply),
    )
    return ll, grad[:, :root_id]


def log_likelihood_and_branch_gradient_pallas_sharded(
    mesh, post_children, P, Q_scaled, tips, freqs, weights, *, root_id,
    props=None, interpret=False, axis="dp",
):
    """Mesh-parallel wrapper: shard the tree batch over ``axis`` with
    shard_map (Pallas kernels are per-device programs — XLA cannot
    auto-partition a custom call, so the batch split is explicit). Model
    constants replicate; outputs come back dp-sharded."""
    from jax.sharding import PartitionSpec as PSpec

    def local(pc, P_loc):
        return log_likelihood_and_branch_gradient_pallas(
            pc, P_loc, Q_scaled, tips, freqs, weights, root_id=root_id,
            props=props, interpret=interpret,
        )

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(PSpec(axis), PSpec(axis)),
        out_specs=(PSpec(axis), PSpec(axis)),
        check_vma=False,
    )
    return f(jnp.asarray(post_children, jnp.int32), jnp.asarray(P))
