"""Fused Pallas TPU kernels for the GP engine: PLV population + branch sweep.

The XLA populate path (`GPEngine._populate_impl`) runs the DAG's rootward +
leafward recursions as two `lax.scan`s over padded level tensors; on the
tunneled v5e that costs ~2.3 ms per level in dispatch/fusion overhead
(fluA: 66 levels -> 153 ms) even though each level touches only a few
hundred KB. Here the ENTIRE population pass — the reference's
`GPDAG::PopulatePLVs` program (gp_dag.cpp:218-263) executed op-by-op by
`GPEngine::ProcessOperations` (gp_engine.cpp:167-171) — runs as ONE
VMEM-resident kernel:

  * the DAG's level schedules flatten into two homogeneous edge streams
    (rootward, leafward), each a `fori_loop` whose step does ONE
    accumulate (dest += q·P·src, a static-shape (4,4)@(4,PT) MXU dot)
    and a predicated node-finish fused onto the last in-edge;
  * paired PLVs pack as 2N-row slabs — PH = [phat; phattilde],
    RB = [r; rtilde] — so the side/rotation choice is row arithmetic in
    the instruction stream, not a branch;
  * the node axis is the UNTILED leading dim (the layout rule from
    ops/pruning_pallas.py): every dynamic access is a cheap (1, 4, PT)
    address computation;
  * rescaling is per-(node, pattern): log-scale rows (1, PT) accumulate by
    max-aligned log-sum-exp (both exponents <= 0), the continuous analog of
    the reference's integer rescaling counts (gp_engine.cpp:288-324); the
    XLA engine's per-node scalar scales and these rows differ only in which
    constant is factored out, so likelihood rows and marginals agree to
    float tolerance;
  * transition matrices P(b) for every GPCSP are precomputed OUTSIDE the
    kernel (one small (E,4,4) batched matexp) — the kernel only contracts.

The pattern axis tiles across the grid (each tile's recursion is
independent), so VMEM holds ~8 (N..2N, 4, tile) slabs — ~6 MB at N=137,
tile=256 — and longer alignments scale by adding grid steps.

The branch sweep kernel runs the same vectorized golden-section search as
`GPEngine._optimize_impl` but inside one kernel program: for JC69 the
per-edge objective collapses to -Σ w·log(A + e^{-4b/3}·B), so the kernel
holds only the per-edge (A, B) rows and the whole 70-iteration search is
VPU work with no per-iteration dispatch (the XLA `fori_loop` pays ~370 us
per iteration in launch overhead on TPU: 26 ms -> <1 ms).
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30  # log-scale "empty" sentinel: exp(NEG - m) underflows to 0


def build_edge_streams(engine):
    """Flatten the level schedules into two (T, 5) int32 streams.

    Rootward rows: (dest_row in PH, src node, gpcsp, finish_flag, node).
      dest_row = parent + rotated·N (phat vs phattilde half of PH).
    Leafward rows: (dest node in rhat, src_row in RB, gpcsp, finish_flag,
      node). src_row = parent + rotated·N (r vs rtilde half of RB).
    finish_flag marks the LAST in-edge of each node at its level (all of a
    node's in-edges live in one level; see subsplit_dag.level_schedules)."""
    N = engine.dag.node_count()

    def stream(levels, rootward):
        rows = []
        for level in levels:
            order = np.lexsort(
                (level["gpcsp"], level["parent" if rootward else "child"])
            )
            pa = level["parent"][order]
            ch = level["child"][order]
            rot = level["rotated"][order]
            g = level["gpcsp"][order]
            key = pa if rootward else ch
            last = np.r_[key[1:] != key[:-1], True]
            for i in range(len(order)):
                if rootward:
                    rows.append(
                        (pa[i] + (N if rot[i] else 0), ch[i], g[i],
                         int(last[i]), pa[i])
                    )
                else:
                    rows.append(
                        (ch[i], pa[i] + (N if rot[i] else 0), g[i],
                         int(last[i]), ch[i])
                    )
        return np.asarray(rows, dtype=np.int32).reshape(-1, 5)

    roots = np.stack(
        [engine.root_ids.astype(np.int32),
         engine.root_gpcsps.astype(np.int32)], axis=1
    )
    return (
        stream(engine.rootward_levels, True),
        stream(engine.leafward_levels, False),
        roots,
    )


def _kernel(
    rw_ref,  # SMEM (T_rw, 5) int32 rootward stream
    lw_ref,  # SMEM (T_lw, 5) int32 leafward stream
    roots_ref,  # SMEM (R, 2) int32 (root node, root gpcsp)
    q_ref,  # SMEM (1, E)
    P_ref,  # VMEM (E, 4, 4)
    tips_ref,  # VMEM (L, 4, PT)
    p_ref,  # out (N, 4, PT)
    PH_ref,  # out (2N, 4, PT): rows [0,N) phat, [N,2N) phattilde
    rhat_ref,  # out (N, 4, PT)
    RB_ref,  # out (2N, 4, PT): rows [0,N) r, [N,2N) rtilde
    lsp_ref,  # out (N, 1, PT)
    lsPH_ref,  # out (2N, 1, PT)
    lsrhat_ref,  # out (N, 1, PT)
    lsRB_ref,  # out (2N, 1, PT)
    *,
    n_rw: int,
    n_lw: int,
    n_roots: int,
):
    N, _, PT = p_ref.shape
    L = tips_ref.shape[0]
    dt = p_ref.dtype
    neg = jnp.asarray(NEG, dt)

    def read(ref, n):
        return ref[pl.ds(n, 1), :, :][0]  # (4, PT) or (1, PT)

    def write(ref, n, val):
        ref[pl.ds(n, 1), :, :] = val[None]

    # -- init: leaves hold tip partials at scale 0; accumulators empty.
    p_ref[pl.ds(0, L), :, :] = tips_ref[:, :, :]
    p_ref[pl.ds(L, N - L), :, :] = jnp.zeros((N - L, 4, PT), dt)
    PH_ref[:, :, :] = jnp.zeros((2 * N, 4, PT), dt)
    rhat_ref[:, :, :] = jnp.zeros((N, 4, PT), dt)
    RB_ref[:, :, :] = jnp.zeros((2 * N, 4, PT), dt)
    lsp_ref[:, :, :] = jnp.zeros((N, 1, PT), dt)
    lsPH_ref[:, :, :] = jnp.full((2 * N, 1, PT), neg, dt)
    lsrhat_ref[:, :, :] = jnp.full((N, 1, PT), neg, dt)
    lsRB_ref[:, :, :] = jnp.zeros((2 * N, 1, PT), dt)

    acc = jnp.float32 if dt == jnp.bfloat16 else dt

    def evolve(g, src):
        """q[g] · P[g] @ src — one static-shape (4,4)@(4,PT) dot."""
        Pm = P_ref[pl.ds(g, 1), :, :][0]
        return q_ref[0, g] * jnp.dot(
            Pm, src, preferred_element_type=acc
        ).astype(dt)

    def accumulate(buf_ref, ls_ref, row, contrib, ls_c):
        """buf[row] += contrib at scale ls_c, max-aligned (exponents <= 0)."""
        cur = read(buf_ref, row)
        ls_cur = read(ls_ref, row)
        m = jnp.maximum(ls_cur, ls_c)
        write(
            buf_ref, row,
            cur * jnp.exp(ls_cur - m) + contrib * jnp.exp(ls_c - m),
        )
        write(ls_ref, row, m)

    def finish(dst_ref, lsdst_ref, row, prod, ls_sum):
        """dst[row] = prod / max_states(prod); log-scale absorbs the max."""
        scale = jnp.max(prod, axis=0, keepdims=True)  # (1, PT)
        scale = jnp.where(scale > 0, scale, jnp.ones_like(scale))
        write(dst_ref, row, prod / scale)
        write(lsdst_ref, row, ls_sum + jnp.log(scale))

    def finish_r(node):
        rh = read(rhat_ref, node)
        ls_rh = read(lsrhat_ref, node)
        # r = rhat ∘ phattilde (PH row node+N); rtilde = rhat ∘ phat.
        finish(
            RB_ref, lsRB_ref, node, rh * read(PH_ref, node + N),
            ls_rh + read(lsPH_ref, node + N),
        )
        finish(
            RB_ref, lsRB_ref, node + N, rh * read(PH_ref, node),
            ls_rh + read(lsPH_ref, node),
        )

    # -- rootward: phat/phattilde accumulation, p finish on last in-edge.
    def rw_body(t, carry):
        dest = rw_ref[t, 0]
        src = rw_ref[t, 1]
        g = rw_ref[t, 2]
        fin = rw_ref[t, 3]
        node = rw_ref[t, 4]
        accumulate(
            PH_ref, lsPH_ref, dest, evolve(g, read(p_ref, src)),
            read(lsp_ref, src),
        )

        @pl.when(fin == 1)
        def _():
            finish(
                p_ref, lsp_ref, node,
                read(PH_ref, node) * read(PH_ref, node + N),
                read(lsPH_ref, node) + read(lsPH_ref, node + N),
            )

        return carry

    jax.lax.fori_loop(0, n_rw, rw_body, 0)

    # -- rootsplit seeds: rhat = 0.25·q (SetToStationaryDistribution).
    def root_body(i, carry):
        node = roots_ref[i, 0]
        g = roots_ref[i, 1]
        write(rhat_ref, node, jnp.full((4, PT), 0.25, dt) * q_ref[0, g])
        write(lsrhat_ref, node, jnp.zeros((1, PT), dt))
        finish_r(node)
        return carry

    jax.lax.fori_loop(0, n_roots, root_body, 0)

    # -- leafward: rhat accumulation, r/rtilde finish on last in-edge.
    def lw_body(t, carry):
        dest = lw_ref[t, 0]
        src = lw_ref[t, 1]
        g = lw_ref[t, 2]
        fin = lw_ref[t, 3]
        accumulate(
            rhat_ref, lsrhat_ref, dest, evolve(g, read(RB_ref, src)),
            read(lsRB_ref, src),
        )

        @pl.when(fin == 1)
        def _():
            finish_r(dest)

        return carry

    jax.lax.fori_loop(0, n_lw, lw_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("node_count", "pattern_count", "tile", "interpret"),
)
def _populate_pallas(
    rw, lw, roots, q, P, tips, *, node_count, pattern_count, tile, interpret
):
    """rw/lw: (T, 5) int32; roots: (R, 2); q: (E,); P: (E, 4, 4);
    tips: (L, 4, PT padded). Returns the 12-entry PLV dict trimmed to
    `pattern_count` patterns."""
    E = q.shape[0]
    L, _, PT = tips.shape
    N = node_count
    dt = P.dtype
    num_tiles = PT // tile

    kernel = functools.partial(
        _kernel, n_rw=rw.shape[0], n_lw=lw.shape[0], n_roots=roots.shape[0]
    )
    plv = lambda t: (0, 0, t)  # noqa: E731
    smem = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda t: tuple(0 for _ in shape), memory_space=pltpu.SMEM
    )
    ctx = (
        contextlib.nullcontext()
        if dt == jnp.float64
        else jax.enable_x64(False)
    )
    with ctx:
        outs = pl.pallas_call(
            kernel,
            grid=(num_tiles,),
            in_specs=[
                smem(rw.shape),
                smem(lw.shape),
                smem(roots.shape),
                smem((1, E)),
                pl.BlockSpec((E, 4, 4), lambda t: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 4, tile), plv, memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((N, 4, tile), plv, memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * N, 4, tile), plv, memory_space=pltpu.VMEM),
                pl.BlockSpec((N, 4, tile), plv, memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * N, 4, tile), plv, memory_space=pltpu.VMEM),
                pl.BlockSpec((N, 1, tile), plv, memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * N, 1, tile), plv, memory_space=pltpu.VMEM),
                pl.BlockSpec((N, 1, tile), plv, memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * N, 1, tile), plv, memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N, 4, PT), dt),
                jax.ShapeDtypeStruct((2 * N, 4, PT), dt),
                jax.ShapeDtypeStruct((N, 4, PT), dt),
                jax.ShapeDtypeStruct((2 * N, 4, PT), dt),
                jax.ShapeDtypeStruct((N, 1, PT), dt),
                jax.ShapeDtypeStruct((2 * N, 1, PT), dt),
                jax.ShapeDtypeStruct((N, 1, PT), dt),
                jax.ShapeDtypeStruct((2 * N, 1, PT), dt),
            ],
            interpret=interpret,
        )(rw, lw, roots, q[None, :], P, tips)
    p, PH, rhat, RB, lsp, lsPH, lsrhat, lsRB = outs
    S = pattern_count
    return {
        "p": p[:, :, :S],
        "phat": PH[:N, :, :S],
        "phattilde": PH[N:, :, :S],
        "rhat": rhat[:, :, :S],
        "r": RB[:N, :, :S],
        "rtilde": RB[N:, :, :S],
        "ls_p": lsp[:, 0, :S],
        "ls_phat": lsPH[:N, 0, :S],
        "ls_phattilde": lsPH[N:, 0, :S],
        "ls_rhat": lsrhat[:, 0, :S],
        "ls_r": lsRB[:N, 0, :S],
        "ls_rtilde": lsRB[N:, 0, :S],
    }


def populate_plvs_pallas(engine, bl, q, interpret=False, tile=None):
    """Drop-in for GPEngine._populate_impl on TPU: returns the same PLV dict
    but with per-(node, pattern) log-scales (shape (N, S) instead of (N,));
    every consumer broadcasts either form (see engine._likelihood_rows_impl)."""
    from .engine import _jc69_transition

    if getattr(engine, "_pallas_streams", None) is None:
        # Cache as NUMPY: this can run under a jit trace (the device-side
        # ascent loop), where jnp constants would leak tracers.
        engine._pallas_streams = build_edge_streams(engine)
    rw, lw, roots = engine._pallas_streams
    S = engine.patterns
    PT = ((S + 127) // 128) * 128
    if tile is None:
        tile = min(PT, 512)
    PT = ((PT + tile - 1) // tile) * tile
    tips = jnp.asarray(engine.tips, bl.dtype)
    # Pad patterns with ones (numerically inert; trimmed before return).
    if PT != S:
        tips = jnp.concatenate(
            [tips, jnp.ones(tips.shape[:2] + (PT - S,), bl.dtype)], axis=-1
        )
    P = _jc69_transition(bl)
    return _populate_pallas(
        rw,
        lw,
        roots,
        q,
        P,
        tips,
        node_count=engine.dag.node_count(),
        pattern_count=S,
        tile=tile,
        interpret=interpret,
    )


# -- branch-length sweep -----------------------------------------------------

def _sweep_kernel(A_ref, B_ref, w_ref, cur_ref, out_ref, *, iters, lo, hi):
    """Vectorized golden-section over all edges, entirely in-kernel.

    A/B: (E, PT) per-edge JC69 likelihood decomposition rows; w: (1, PT);
    cur: (E, 1) current log branch lengths. out: (E, 1) new log-bl with
    reject-if-worse (gp_engine.cpp BrentOptimization semantics)."""
    A = A_ref[:, :]
    B = B_ref[:, :]
    w = w_ref[:, :]
    dt = A.dtype

    def obj(lb):  # (E, 1) -> (E, 1)
        e = jnp.exp(jnp.asarray(-4.0 / 3.0, dt) * jnp.exp(lb))
        return -jnp.sum(jnp.log(A + e * B) * w, axis=1, keepdims=True)

    cur = cur_ref[:, :]
    fcur = obj(cur)
    invphi = jnp.asarray((np.sqrt(5.0) - 1.0) / 2.0, dt)
    a = jnp.full_like(cur, lo)
    b = jnp.full_like(cur, hi)
    c = b - invphi * (b - a)
    d = a + invphi * (b - a)
    fc = obj(c)
    fd = obj(d)

    def body(_, st):
        a, b, c, d, fc, fd = st
        left = fc < fd
        b2 = jnp.where(left, d, b)
        a2 = jnp.where(left, a, c)
        c2 = b2 - invphi * (b2 - a2)
        d2 = a2 + invphi * (b2 - a2)
        return a2, b2, c2, d2, obj(c2), obj(d2)

    a, b, c, d, fc, fd = jax.lax.fori_loop(
        0, iters, body, (a, b, c, d, fc, fd)
    )
    best = jnp.where(fc < fd, c, d)
    fbest = jnp.minimum(fc, fd)
    out_ref[:, :] = jnp.where(fbest < fcur, best, cur)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _optimize_pallas(plvs, bl, e_parent, e_child, e_rot, e_gpcsp, weights,
                     *, interpret):
    from .engine import GOLDEN_ITERS, MAX_LOG_BL, MIN_LOG_BL

    dt = bl.dtype
    rot = e_rot
    r_plv = jnp.where(
        rot[:, None, None], plvs["rtilde"][e_parent], plvs["r"][e_parent]
    )
    p_plv = plvs["p"][e_child]
    D = jnp.einsum("eis,eis->es", r_plv, p_plv)
    A = 0.25 * jnp.sum(r_plv, axis=1) * jnp.sum(p_plv, axis=1)
    B = D - A
    E, S = A.shape
    Ep = ((E + 7) // 8) * 8
    PT = ((S + 127) // 128) * 128
    # Pad: A=1, B=0 rows/lanes are inert under log (w=0 on padded lanes).
    A = jnp.pad(A, ((0, Ep - E), (0, PT - S)), constant_values=1.0)
    B = jnp.pad(B, ((0, Ep - E), (0, PT - S)))
    w = jnp.pad(jnp.asarray(weights, dt), (0, PT - S))[None, :]
    cur = jnp.pad(jnp.log(bl[e_gpcsp]), (0, Ep - E))[:, None]

    kernel = functools.partial(
        _sweep_kernel, iters=GOLDEN_ITERS, lo=MIN_LOG_BL, hi=MAX_LOG_BL
    )
    ctx = (
        contextlib.nullcontext()
        if dt == jnp.float64
        else jax.enable_x64(False)
    )
    with ctx:
        new_log = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Ep, 1), dt),
            interpret=interpret,
        )(A, B, w, cur)
    return bl.at[e_gpcsp].set(jnp.exp(new_log[:E, 0]))


def optimize_sweep_pallas(engine, plvs, bl, interpret=False):
    return _optimize_pallas(
        plvs,
        bl,
        jnp.asarray(engine.e_parent),
        jnp.asarray(engine.e_child),
        jnp.asarray(engine.e_rot),
        jnp.asarray(engine.e_gpcsp),
        jnp.asarray(engine.weights, bl.dtype),
        interpret=interpret,
    )
