"""Fused Pallas TPU kernel for GP PLV population.

The XLA populate path (`GPEngine._populate_impl`) runs the DAG's rootward +
leafward recursions as two `lax.scan`s over padded level tensors; on the
tunneled v5e that costs ~2.3 ms per level in dispatch/fusion overhead
(fluA: 66 levels -> 153 ms) even though each level touches only a few
hundred KB. Here the ENTIRE population pass — the reference's
`GPDAG::PopulatePLVs` program (gp_dag.cpp:218-263) executed op-by-op by
`GPEngine::ProcessOperations` (gp_engine.cpp:167-171) — runs as ONE
VMEM-resident kernel:

  * the DAG's level schedules flatten into a single instruction stream
    (kind, a, b, gpcsp) interpreted by a `fori_loop` with `pl.when`
    branches: accumulate-edge ops (phat/phattilde/rhat += q·P·src) and
    finish-node ops (p = phat∘phattilde etc.), in dependency order;
  * PLV slabs live in VMEM with the node axis as the UNTILED leading dim
    (the layout rule from ops/pruning_pallas.py), so each dynamic access is
    a cheap (1, 4, PT) address computation and each evolve is one
    STATIC-shape (4,4)@(4,PT) MXU dot;
  * rescaling is per-(node, pattern): log-scale rows (1, PT) accumulate by
    max-aligned log-sum-exp (both exponents <= 0), the continuous analog of
    the reference's integer rescaling counts (gp_engine.cpp:288-324); the
    XLA engine's per-node scalar scales and these per-pattern rows differ
    only in which constant is factored out, so likelihood rows and
    marginals agree to float tolerance;
  * transition matrices P(b) for every GPCSP are precomputed OUTSIDE the
    kernel (one small (E,4,4) batched matexp) — the kernel only contracts.

The pattern axis tiles across the grid (each tile's recursion is
independent), so VMEM holds 12 (N, 4, tile) + (N, 1, tile) slabs — ~6 MB at
N=137, tile=256 — and longer alignments scale by adding grid steps.

Instruction kinds:
  0  phat[a]      += q[g]·P[g]@p[b]        (sorted-side rootward edge)
  1  phattilde[a] += q[g]·P[g]@p[b]        (rotated-side rootward edge)
  2  finish p[a] = norm(phat[a]∘phattilde[a])
  3  rhat[a]      += q[g]·P[g]@r[b]        (leafward edge, sorted parent)
  4  rhat[a]      += q[g]·P[g]@rtilde[b]   (leafward edge, rotated parent)
  5  finish r[a] = norm(rhat[a]∘phattilde[a]), rtilde[a] = norm(rhat[a]∘phat[a])
  6  rhat[a] = 0.25·q[g]  (rootsplit seed, SetToStationaryDistribution)
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


def build_instruction_stream(engine) -> np.ndarray:
    """Flatten the engine's level schedules into one (T, 4) int32 stream."""
    instr = []
    for level in engine.rootward_levels:
        for pa, ch, rot, g in zip(
            level["parent"], level["child"], level["rotated"], level["gpcsp"]
        ):
            instr.append((1 if rot else 0, pa, ch, g))
        for node in np.unique(level["parent"]):
            instr.append((2, node, 0, 0))
    for root_id, root_g in zip(engine.root_ids, engine.root_gpcsps):
        instr.append((6, root_id, 0, root_g))
        instr.append((5, root_id, 0, 0))
    for level in engine.leafward_levels:
        for pa, ch, rot, g in zip(
            level["parent"], level["child"], level["rotated"], level["gpcsp"]
        ):
            instr.append((4 if rot else 3, ch, pa, g))
        for node in np.unique(level["child"]):
            instr.append((5, node, 0, 0))
    return np.asarray(instr, dtype=np.int32)


def _kernel(
    instr_ref,  # SMEM (T, 4) int32
    q_ref,  # SMEM (1, E)
    P_ref,  # VMEM (E, 4, 4)
    tips_ref,  # VMEM (L, 4, PT)
    p_ref, phat_ref, phattilde_ref, rhat_ref, r_ref, rtilde_ref,  # (N,4,PT)
    lsp_ref, lsphat_ref, lsphattilde_ref, lsrhat_ref, lsr_ref, lsrtilde_ref,
    *,
    n_instr: int,
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
    zeros = jnp.zeros((N, 4, PT), dt)
    phat_ref[:, :, :] = zeros
    phattilde_ref[:, :, :] = zeros
    rhat_ref[:, :, :] = zeros
    r_ref[:, :, :] = zeros
    rtilde_ref[:, :, :] = zeros
    ls0 = jnp.zeros((N, 1, PT), dt)
    lsneg = jnp.full((N, 1, PT), neg, dt)
    lsp_ref[:, :, :] = ls0
    lsphat_ref[:, :, :] = lsneg
    lsphattilde_ref[:, :, :] = lsneg
    lsrhat_ref[:, :, :] = lsneg
    lsr_ref[:, :, :] = ls0
    lsrtilde_ref[:, :, :] = ls0

    acc = jnp.float32 if dt == jnp.bfloat16 else dt

    def evolve(g, src):
        """q[g] · P[g] @ src — one static-shape (4,4)@(4,PT) dot."""
        Pm = P_ref[pl.ds(g, 1), :, :][0]
        return q_ref[0, g] * jnp.dot(Pm, src, preferred_element_type=acc
                                     ).astype(dt)

    def accumulate(buf_ref, ls_ref, a, contrib, ls_c):
        """buf[a] += contrib at scale ls_c, max-aligned (exponents <= 0)."""
        cur = read(buf_ref, a)
        ls_cur = read(ls_ref, a)
        m = jnp.maximum(ls_cur, ls_c)
        write(
            buf_ref, a,
            cur * jnp.exp(ls_cur - m) + contrib * jnp.exp(ls_c - m),
        )
        write(ls_ref, a, m)

    def finish(dst_ref, lsdst_ref, a, prod, ls_sum):
        """dst[a] = prod / max_states(prod); log-scale absorbs the max."""
        scale = jnp.max(prod, axis=0, keepdims=True)  # (1, PT)
        scale = jnp.where(scale > 0, scale, jnp.ones_like(scale))
        write(dst_ref, a, prod / scale)
        write(lsdst_ref, a, ls_sum + jnp.log(scale))

    def body(t, carry):
        k = instr_ref[t, 0]
        a = instr_ref[t, 1]
        b = instr_ref[t, 2]
        g = instr_ref[t, 3]

        @pl.when(k == 0)
        def _():
            accumulate(
                phat_ref, lsphat_ref, a, evolve(g, read(p_ref, b)),
                read(lsp_ref, b),
            )

        @pl.when(k == 1)
        def _():
            accumulate(
                phattilde_ref, lsphattilde_ref, a, evolve(g, read(p_ref, b)),
                read(lsp_ref, b),
            )

        @pl.when(k == 2)
        def _():
            finish(
                p_ref, lsp_ref, a,
                read(phat_ref, a) * read(phattilde_ref, a),
                read(lsphat_ref, a) + read(lsphattilde_ref, a),
            )

        @pl.when(k == 3)
        def _():
            accumulate(
                rhat_ref, lsrhat_ref, a, evolve(g, read(r_ref, b)),
                read(lsr_ref, b),
            )

        @pl.when(k == 4)
        def _():
            accumulate(
                rhat_ref, lsrhat_ref, a, evolve(g, read(rtilde_ref, b)),
                read(lsrtilde_ref, b),
            )

        @pl.when(k == 5)
        def _():
            rh = read(rhat_ref, a)
            ls_rh = read(lsrhat_ref, a)
            finish(
                r_ref, lsr_ref, a, rh * read(phattilde_ref, a),
                ls_rh + read(lsphattilde_ref, a),
            )
            finish(
                rtilde_ref, lsrtilde_ref, a, rh * read(phat_ref, a),
                ls_rh + read(lsphat_ref, a),
            )

        @pl.when(k == 6)
        def _():
            write(rhat_ref, a, jnp.full((4, PT), 0.25, dt) * q_ref[0, g])
            write(lsrhat_ref, a, jnp.zeros((1, PT), dt))

        return carry

    jax.lax.fori_loop(0, n_instr, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("node_count", "pattern_count", "tile", "interpret"),
)
def _populate_pallas(
    instr, q, P, tips, *, node_count, pattern_count, tile, interpret
):
    """instr: (T, 4) int32; q: (E,); P: (E, 4, 4); tips: (L, 4, PT padded).
    Returns the 12-entry PLV dict trimmed to `pattern_count` patterns."""
    T = instr.shape[0]
    E = q.shape[0]
    L, _, PT = tips.shape
    N = node_count
    dt = P.dtype
    num_tiles = PT // tile

    kernel = functools.partial(_kernel, n_instr=T)
    plv = lambda t: (0, 0, t)  # noqa: E731
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
                pl.BlockSpec((T, 4), lambda t: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, E), lambda t: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((E, 4, 4), lambda t: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 4, tile), plv, memory_space=pltpu.VMEM),
            ],
            out_specs=(
                [pl.BlockSpec((N, 4, tile), plv, memory_space=pltpu.VMEM)] * 6
                + [pl.BlockSpec((N, 1, tile), plv, memory_space=pltpu.VMEM)]
                * 6
            ),
            out_shape=(
                [jax.ShapeDtypeStruct((N, 4, PT), dt)] * 6
                + [jax.ShapeDtypeStruct((N, 1, PT), dt)] * 6
            ),
            interpret=interpret,
        )(instr, q[None, :], P, tips)
    names = (
        "p", "phat", "phattilde", "rhat", "r", "rtilde",
        "ls_p", "ls_phat", "ls_phattilde", "ls_rhat", "ls_r", "ls_rtilde",
    )
    S = pattern_count
    out = {}
    for name, buf in zip(names, outs):
        buf = buf[:, :, :S]
        out[name] = buf[:, 0, :] if name.startswith("ls_") else buf
    return out


def populate_plvs_pallas(engine, bl, q, interpret=False, tile=None):
    """Drop-in for GPEngine._populate_impl on TPU: returns the same PLV dict
    but with per-(node, pattern) log-scales (shape (N, S) instead of (N,));
    every consumer broadcasts either form (see engine._bcast)."""
    from .engine import _jc69_transition

    if getattr(engine, "_pallas_instr", None) is None:
        engine._pallas_instr = jnp.asarray(build_instruction_stream(engine))
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
        engine._pallas_instr,
        q,
        P,
        tips,
        node_count=engine.dag.node_count(),
        pattern_count=S,
        tile=tile,
        interpret=interpret,
    )
