"""JC69-structured fused pruning kernel: likelihood + branch gradient.

The generic kernel (ops/pruning_pallas.py) applies arbitrary 4x4
transition matrices. Under JC69 — the production substitution model of
every benchmark workload here and in the reference (vip/benchmark.py,
src/unrooted_sbn_instance.hpp DS1 tests) — the matrix has closed form

    P(t) = e I + (1 - e)/4 J,   e = exp(-4t/3),  J = all-ones,

and the whole kernel collapses algebraically (docs/performance.md):

  * apply: P v = e v + (1-e)/4 (sum_i v_i)  — one 4-row sum + two
    broadcast FMAs instead of a 4x4 contraction; P^T = P, so the upward
    pass uses the same form;
  * column sums are conserved (P doubly stochastic), so the per-node
    row-sums S_E[n] needed later are the (already computed) pre-apply
    sums — free;
  * the rate-matrix apply disappears: with Q = (4/3)(J/4 - I),
      num_k = u_k . (r_k Q E_k) = r_k [ (1/3) S_u,k S_E,k - (4/3) d_k ],
    where d_k = u_k . E_k is the per-category denominator term — the
    edge-gradient needs only row sums and the u.E product, no Q apply;
  * the root contraction is (1/4) sum_k props_k S_E,k[root];
  * no 4x4 transition matrices are built at all — the caller passes the
    scalar e per (node, category), computed in f64 (BASELINE.md
    precision policy), killing the P-construction einsum from the
    pipeline.

Rescaling uses row sums (any positive per-(tree,pattern) factor is a
valid scale; sums come free here) instead of the generic kernel's max.

Works for JC69 x {constant, Weibull+K} x any rootedness; GTR uses the
generic kernel. Semantics parity: ops/pruning.py's
log_likelihood_and_branch_gradient (same values to f32 tolerance).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pruning_pallas import pad_patterns


def _auto_tile_jc(N1, K, L, PT, scratch_lane_floats, budget=12 * 2**20):
    """Largest 128-multiple divisor of PT whose VMEM working set fits.
    scratch_lane_floats: per-lane floats of THIS kernel's scratch buffers
    (the fused grad kernel and the VJP backward differ — the generic
    formula undercounted the backward's M+E+U by ~1.6x)."""
    per_lane = (scratch_lane_floats + 4 * L + 8) * 4
    m = PT // 128
    divisors = sorted(
        (d for d in range(1, m + 1) if m % d == 0), reverse=True
    )
    for d in divisors:
        if d * 128 * per_lane <= budget:
            return d * 128
    return 128


def _shared_ops(ea_ref, K):
    """Closure bundle shared by the three kernels (ea lookup, slab
    read/write, per-category row sums, the closed-form JC69 apply)."""
    quarter = jnp.float32(0.25)

    def ea(node, k):
        return ea_ref[0, 0, node * K + k]  # scalar

    def read(ref, node):
        return ref[pl.ds(node, 1), :, :][0]  # (4K, PT)

    def write(ref, node, val):
        ref[pl.ds(node, 1), :, :] = val[None]

    def rowsum4(slab, k):
        return jnp.sum(slab[4 * k : 4 * k + 4, :], axis=0, keepdims=True)

    def apply_node(node, slab, rsums):
        """P_node(slab) per category; rsums: list of K (1, PT) row sums."""
        outs = []
        for k in range(K):
            e = ea(node, k)
            outs.append(
                e * slab[4 * k : 4 * k + 4, :]
                + ((1.0 - e) * quarter) * rsums[k]
            )
        return outs[0] if K == 1 else jnp.concatenate(outs, axis=0)

    return ea, read, write, rowsum4, apply_node


def _forward_pass(ops, sched_ref, tips_ref, E, ES, *, L, root_id, K, PT,
                  M=None):
    """The shared forward recursion: ones-slot init, leaf applies, and the
    combine loop with ALTERNATE-STEP rescaling (any positive
    per-(tree,pattern) factor is a valid scale; one unscaled level cannot
    leave f32 range since post-scale values are <= 1 and products of
    three are <= 1 — the next scaled step's row sum absorbs the
    magnitude, halving the where/reciprocal/log chain).

    Stores evolved partials E, per-node per-category row sums ES (equal
    to the pre-apply sums by double stochasticity) and — when M is given
    (the backward kernel's rematerialization) — the pre-apply partials at
    the SAME scale as E, which keeps every downstream ratio
    scale-invariant. Returns the (1, PT) logscale."""
    ea, read, write, rowsum4, apply_node = ops
    dt = jnp.float32
    ones_slot = root_id + 1
    n_steps = root_id + 1 - L
    R = 4 * K
    ones_slab = jnp.ones((R, PT), dt)
    write(E, ones_slot, ones_slab)
    if M is not None:
        write(M, ones_slot, ones_slab)
    ES[pl.ds(ones_slot, 1), :, :] = jnp.full((1, K, PT), 4.0, dt)

    def leaf_body(l, c):
        tip4 = tips_ref[pl.ds(l, 1), :, :][0]  # (4, PT)
        rt = jnp.sum(tip4, axis=0, keepdims=True)  # (1, PT)
        tip = tip4 if K == 1 else jnp.concatenate([tip4] * K, axis=0)
        if M is not None:
            write(M, l, tip)
        write(E, l, apply_node(l, tip, [rt] * K))
        ES[pl.ds(l, 1), :, :] = (
            rt[None] if K == 1 else jnp.concatenate([rt] * K, axis=0)[None]
        )
        return c

    jax.lax.fori_loop(0, L, leaf_body, 0)

    def fwd_body_at(s, logscale, do_scale):
        k0 = sched_ref[0, s, 0]
        k1 = sched_ref[0, s, 1]
        k2 = sched_ref[0, s, 2]
        prod = read(E, k0) * read(E, k1) * read(E, k2)  # (R, PT)
        rsums = [rowsum4(prod, k) for k in range(K)]
        node = L + s
        if do_scale:
            scale = rsums[0] if K == 1 else functools.reduce(jnp.add, rsums)
            scale = jnp.where(scale > 0, scale, jnp.ones_like(scale))
            inv = 1.0 / scale
            # Apply on the unscaled product, then scale once on the way
            # out (P is linear, so P(prod) * inv == P(prod * inv)).
            write(E, node, apply_node(node, prod, rsums) * inv)
            if M is not None:
                write(M, node, prod * inv)
            rsums = [r * inv for r in rsums]
            logscale = logscale + jnp.log(scale)
        else:
            write(E, node, apply_node(node, prod, rsums))
            if M is not None:
                write(M, node, prod)
        ES[pl.ds(node, 1), :, :] = (
            rsums[0][None]
            if K == 1
            else jnp.concatenate(rsums, axis=0)[None]
        )
        return logscale

    def fwd_pair(i, logscale):
        logscale = fwd_body_at(2 * i, logscale, do_scale=False)
        return fwd_body_at(2 * i + 1, logscale, do_scale=True)

    logscale = jax.lax.fori_loop(
        0, n_steps // 2, fwd_pair, jnp.zeros((1, PT), dt)
    )
    if n_steps % 2:
        logscale = fwd_body_at(n_steps - 1, logscale, do_scale=True)
    return logscale


def _root_site(ES, props_ref, root_id, K, PT):
    """(1, PT) scaled site likelihoods: (1/4) sum_k props_k S_E,k[root]."""
    quarter = jnp.float32(0.25)
    es_root = ES[pl.ds(root_id, 1), :, :][0]  # (K, PT)
    site = jnp.zeros((1, PT), jnp.float32)
    for k in range(K):
        site = site + (props_ref[0, k] * quarter) * es_root[k : k + 1, :]
    return jnp.maximum(site, jnp.float32(1e-30))


def _u_root_rows(props_ref, K, PT):
    """U[root] rows: props_k / 4 (freqs folded; rows of each category sum
    with the others to exactly 1)."""
    quarter = jnp.float32(0.25)
    if K == 1:
        return jnp.full((4, PT), props_ref[0, 0] * quarter, jnp.float32)
    return jnp.concatenate(
        [
            jnp.full((4, PT), props_ref[0, k] * quarter, jnp.float32)
            for k in range(K)
        ],
        axis=0,
    )


def _evolve_up(ops, U, node, K):
    """P^T U[node] = P U[node] (JC69 symmetric). K=1 exploits that U rows
    sum to EXACTLY 1 by construction (each write divides by its own row
    sum; U[root] = 4 x 1/4): the row-sum operand is the scalar 1."""
    ea, read, write, rowsum4, apply_node = ops
    un = read(U, node)
    if K == 1:
        e = ea(node, 0)
        return un, e * un + ((1.0 - e) * jnp.float32(0.25))
    return un, apply_node(node, un, [rowsum4(un, k) for k in range(K)])



def _kernel(
    sched_ref,  # SMEM (1, S, 3) int32
    ea_ref,  # SMEM (1, 1, N1*K) f32: e = exp(-4 b r / 3) per node*K + k
    rates_ref,  # SMEM (1, K): category rates
    props_ref,  # SMEM (1, K): category proportions
    tips_ref,  # VMEM (L, 4, PT)
    w_ref,  # VMEM (1, PT)
    ll_ref,  # out VMEM (1, 1, 1, 1)
    grad_ref,  # out VMEM (1, 1, N1, 1)
    E,  # scratch VMEM (N1, 4K, PT): evolved partials
    ES,  # scratch VMEM (N1, K, PT): per-category row sums of E
    U,  # scratch VMEM (N1, 4K, PT): upper partials (props folded)
    G,  # scratch VMEM (N1, 1, PT): per-edge weighted gradient rows
    *,
    leaf_count: int,
    root_id: int,
    K: int,
):
    L = leaf_count
    n_steps = root_id + 1 - L
    PT = w_ref.shape[1]
    dt = jnp.float32
    tiny = jnp.asarray(1e-30, dt)
    ops = _shared_ops(ea_ref, K)
    ea, read, write, rowsum4, apply_node = ops

    logscale = _forward_pass(
        ops, sched_ref, tips_ref, E, ES, L=L, root_id=root_id, K=K, PT=PT
    )
    site = _root_site(ES, props_ref, root_id, K, PT)
    ll_ref[0, 0, :, :] = jnp.sum(
        w_ref[:] * (jnp.log(site) + logscale), axis=1, keepdims=True
    )

    # -- upward pass + fused edge derivatives (props folded into U).
    write(U, root_id, _u_root_rows(props_ref, K, PT))
    third = jnp.asarray(1.0 / 3.0, dt)
    four_thirds = jnp.asarray(4.0 / 3.0, dt)

    def up_body(t, c):
        node = root_id - t
        s = node - L
        _, ev_up = _evolve_up(ops, U, node, K)
        k0 = sched_ref[0, s, 0]
        k1 = sched_ref[0, s, 1]
        k2 = sched_ref[0, s, 2]
        e0 = read(E, k0)
        e1 = read(E, k1)
        e2 = read(E, k2)
        m01 = e0 * e1
        m02 = e0 * e2
        m12 = e1 * e2
        # Shared denominators: u_c * E_c = ev_up * e0 * e1 * e2 =: T for
        # every kid c, so one T and its per-category row sums d_k serve
        # all three edges (the generic kernel computes them 3x).
        T = ev_up * (m01 * e2)
        d = [rowsum4(T, k) for k in range(K)]
        denom = d[0] if K == 1 else functools.reduce(jnp.add, d)
        winv = w_ref[:] / jnp.maximum(denom, tiny)
        for kid, mab in ((k0, m12), (k1, m02), (k2, m01)):
            u = ev_up * mab  # (R, PT); scales cancel in the ratio
            se = ES[pl.ds(kid, 1), :, :][0]  # (K, PT)
            num = jnp.zeros((1, PT), dt)
            su = None
            for k in range(K):
                su_k = rowsum4(u, k)
                su = su_k if su is None else su + su_k
                num = num + rates_ref[0, k] * (
                    third * (su_k * se[k : k + 1, :]) - four_thirds * d[k]
                )
            G[pl.ds(kid, 1), :, :] = (winv * num)[None]
            sc = jnp.where(su > 0, su, jnp.ones_like(su))
            write(U, kid, u / sc)
        return c

    jax.lax.fori_loop(0, n_steps, up_body, 0)

    grad_ref[0, 0, :, :] = jnp.sum(G[:], axis=2)


@functools.partial(
    jax.jit, static_argnames=("leaf_count", "root_id", "tile", "interpret")
)
def _pallas_jc_ll_grad(
    post_children, ea, rates, props, tips, weights, *, leaf_count, root_id,
    tile, interpret,
):
    """ea: (B, N1*K) f32; tips: (L, 4, PT); weights: (1, PT).
    Returns (ll (B,), grad (B, N1))."""
    B, S, _ = post_children.shape
    NK = ea.shape[2]
    K = rates.shape[1]
    N1 = NK // K
    PT = weights.shape[1]
    T = PT // tile
    L = leaf_count

    kernel = functools.partial(_kernel, leaf_count=L, root_id=root_id, K=K)
    ctx = jax.enable_x64(False)
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
                    (1, 1, NK), lambda b, t: (b, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (1, K), lambda b, t: (0, 0), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec(
                    (1, K), lambda b, t: (0, 0), memory_space=pltpu.SMEM
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
                jax.ShapeDtypeStruct((B, T, 1, 1), jnp.float32),
                jax.ShapeDtypeStruct((B, T, N1, 1), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((N1, 4 * K, tile), jnp.float32),
                pltpu.VMEM((N1, K, tile), jnp.float32),
                pltpu.VMEM((N1, 4 * K, tile), jnp.float32),
                pltpu.VMEM((N1, 1, tile), jnp.float32),
            ],
            interpret=interpret,
        )(post_children, ea, rates, props, tips, weights)
    return ll[:, :, 0, 0].sum(axis=1), grad[:, :, :, 0].sum(axis=1)


def exp_factors(bl_padded, rates):
    """e = exp(-4 b r / 3) per (tree, node, category), exp in f64
    (BASELINE.md precision policy). bl_padded: (B, N+1); rates: (K,).
    Returns (B, (N+1)*K) f32."""
    t = (
        jnp.asarray(bl_padded, jnp.float64)[:, :, None]
        * jnp.asarray(rates, jnp.float64)[None, None, :]
    )
    e = jnp.exp(-4.0 / 3.0 * t).astype(jnp.float32)
    return e.reshape(e.shape[0], -1)


def log_likelihood_and_branch_gradient_pallas_jc69(
    post_children, bl_padded, tips, weights, *, root_id, rates=None,
    props=None, interpret=False, tile=None,
):
    """JC69 drop-in for log_likelihood_and_branch_gradient_pallas: takes
    branch lengths directly (no transition matrices anywhere).

    post_children: (B, S, 3) int32; bl_padded: (B, N+1) with the ones-slot
    zero appended (root slot 0 for unrooted trees); tips: (L, 4, Pp);
    rates/props: (K,) Weibull category rates/proportions (default
    constant-rate). Returns (ll (B,), grad (B, root_id))."""
    if rates is None:
        rates = jnp.ones((1,), jnp.float32)
    if props is None:
        K0 = rates.shape[0]
        props = jnp.full((K0,), 1.0 / K0, jnp.float32)
    rates = jnp.asarray(rates, jnp.float32)
    props = jnp.asarray(props, jnp.float32)
    K = rates.shape[0]
    leaf_count = tips.shape[0]
    tips_p, w_p = pad_patterns(tips, weights)
    N1 = bl_padded.shape[1]
    if tile is None:
        tile = _auto_tile_jc(
            N1, K, leaf_count, w_p.shape[0],
            2 * N1 * 4 * K + N1 * K + N1,
        )
    ea = exp_factors(bl_padded, rates)[:, None, :]
    ll, grad = _pallas_jc_ll_grad(
        jnp.asarray(post_children, jnp.int32),
        ea,
        rates[None, :],
        props[None, :],
        jnp.asarray(tips_p, jnp.float32),
        jnp.asarray(w_p, jnp.float32)[None, :],
        leaf_count=leaf_count,
        root_id=root_id,
        tile=tile,
        interpret=interpret,
    )
    return ll, grad[:, :root_id]


# -- LL-only forward + d(ll)/d(ea) backward (custom VJP) ---------------------
# The JC69 analog of pruning_pallas_vjp: the backward kernel emits the
# cotangent of the per-(node, category) exponential factors e = exp(-4br/3)
# instead of full 4x4 dP blocks — with P = eI + (1-e)/4 J,
#   d ll / d e_{n,k} = sum_p [ (uw . M)_k - (1/4) rowsum4(uw)_k S_M,k ],
# (uw = u w / denom, M the pre-apply partials, S_M their row sums, which
# equal the stored S_E by double stochasticity). Branch-length, clock-rate,
# height-ratio and Weibull-shape gradients then chain through
# exp_factors/props by ordinary AD outside the kernel.


def _fwd_ll_kernel(
    sched_ref, ea_ref, props_ref, tips_ref, w_ref, ll_ref, E, ES,
    *, leaf_count: int, root_id: int, K: int,
):
    PT = w_ref.shape[1]
    ops = _shared_ops(ea_ref, K)
    logscale = _forward_pass(
        ops, sched_ref, tips_ref, E, ES, L=leaf_count, root_id=root_id,
        K=K, PT=PT,
    )
    site = _root_site(ES, props_ref, root_id, K, PT)
    ll_ref[0, 0, :, :] = jnp.sum(
        w_ref[:] * (jnp.log(site) + logscale), axis=1, keepdims=True
    )


def _bwd_dea_kernel(
    sched_ref, ea_ref, props_ref, tips_ref, w_ref,
    dea_ref,  # out (1, 1, N1*K, 1)
    dprops_ref,  # out (1, 1, K, 1)
    M, E, ES, U,
    *, leaf_count: int, root_id: int, K: int,
):
    L = leaf_count
    ones_slot = root_id + 1
    n_steps = root_id + 1 - L
    PT = w_ref.shape[1]
    dt = jnp.float32
    tiny = jnp.asarray(1e-30, dt)
    quarter = jnp.asarray(0.25, dt)
    ops = _shared_ops(ea_ref, K)
    ea, read, write, rowsum4, apply_node = ops

    # Forward recompute in M-form (residuals would be huge; remat). M
    # shares E's (alternate-step) scale, so every ratio below is
    # scale-invariant.
    _forward_pass(
        ops, sched_ref, tips_ref, E, ES, L=L, root_id=root_id, K=K, PT=PT,
        M=M,
    )

    # dprops from the root: dprops_k = sum_p (w/site) (1/4) S_M,k[root].
    es_root = ES[pl.ds(root_id, 1), :, :][0]  # (K, PT)
    site = _root_site(ES, props_ref, root_id, K, PT)
    w_over_site = w_ref[:] / site
    dpr = [
        jnp.sum(quarter * es_root[k : k + 1, :] * w_over_site, axis=1,
                keepdims=True)
        for k in range(K)
    ]
    dprops_ref[0, 0, :, :] = (
        dpr[0] if K == 1 else jnp.concatenate(dpr, axis=0)
    )

    # Upper pass, emitting dea per edge as it forms.
    write(U, root_id, _u_root_rows(props_ref, K, PT))

    def up_body(t, c):
        node = root_id - t
        s = node - L
        _, ev_up = _evolve_up(ops, U, node, K)
        k0 = sched_ref[0, s, 0]
        k1 = sched_ref[0, s, 1]
        k2 = sched_ref[0, s, 2]
        e0 = read(E, k0)
        e1 = read(E, k1)
        e2 = read(E, k2)
        m01 = e0 * e1
        m02 = e0 * e2
        m12 = e1 * e2
        T = ev_up * (m01 * e2)
        d = [rowsum4(T, k) for k in range(K)]
        denom = d[0] if K == 1 else functools.reduce(jnp.add, d)
        winv = w_ref[:] / jnp.maximum(denom, tiny)
        for kid, mab in ((k0, m12), (k1, m02), (k2, m01)):
            u = ev_up * mab
            uw = u * winv
            mkid = read(M, kid)
            um = uw * mkid
            es = ES[pl.ds(kid, 1), :, :][0]  # (K, PT) = S_M by conservation
            des = []
            su_total = None
            for k in range(K):
                suw = rowsum4(uw, k)
                su_k = rowsum4(u, k)
                su_total = su_k if su_total is None else su_total + su_k
                val = rowsum4(um, k) - quarter * (suw * es[k : k + 1, :])
                des.append(jnp.sum(val, axis=1, keepdims=True))  # (1,1)
            dea_ref[0, 0, pl.ds(kid * K, K), :] = (
                des[0] if K == 1 else jnp.concatenate(des, axis=0)
            )
            sc = jnp.where(su_total > 0, su_total, jnp.ones_like(su_total))
            write(U, kid, u / sc)
        return c

    jax.lax.fori_loop(0, n_steps, up_body, 0)

    # Root and ones-slot rows are not parameters.
    zero = jnp.zeros((K, 1), dt)
    dea_ref[0, 0, pl.ds(root_id * K, K), :] = zero
    dea_ref[0, 0, pl.ds(ones_slot * K, K), :] = zero


def _jc_specs(B, S, NK, L, K, tile):
    return [
        pl.BlockSpec((1, S, 3), lambda b, t: (b, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, NK), lambda b, t: (b, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, K), lambda b, t: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(
            (L, 4, tile), lambda b, t: (0, 0, t), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((1, tile), lambda b, t: (0, t), memory_space=pltpu.VMEM),
    ]


@functools.partial(
    jax.jit, static_argnames=("leaf_count", "root_id", "tile", "interpret")
)
def _fwd_ll_call(post_children, ea, props, tips, weights, *, leaf_count,
                 root_id, tile, interpret):
    B, S, _ = post_children.shape
    NK = ea.shape[2]
    K = props.shape[1]
    N1 = NK // K
    PT = weights.shape[1]
    T = PT // tile
    L = leaf_count
    kernel = functools.partial(
        _fwd_ll_kernel, leaf_count=L, root_id=root_id, K=K
    )
    with jax.enable_x64(False):
        (ll,) = pl.pallas_call(
            kernel,
            grid=(B, T),
            in_specs=_jc_specs(B, S, NK, L, K, tile),
            out_specs=[
                pl.BlockSpec(
                    (1, 1, 1, 1), lambda b, t: (b, t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_shape=[jax.ShapeDtypeStruct((B, T, 1, 1), jnp.float32)],
            scratch_shapes=[
                pltpu.VMEM((N1, 4 * K, tile), jnp.float32),
                pltpu.VMEM((N1, K, tile), jnp.float32),
            ],
            interpret=interpret,
        )(post_children, ea, props, tips, weights)
    return ll[:, :, 0, 0].sum(axis=1)


@functools.partial(
    jax.jit, static_argnames=("leaf_count", "root_id", "tile", "interpret")
)
def _bwd_dea_call(post_children, ea, props, tips, weights, *, leaf_count,
                  root_id, tile, interpret):
    B, S, _ = post_children.shape
    NK = ea.shape[2]
    K = props.shape[1]
    N1 = NK // K
    PT = weights.shape[1]
    T = PT // tile
    L = leaf_count
    kernel = functools.partial(
        _bwd_dea_kernel, leaf_count=L, root_id=root_id, K=K
    )
    with jax.enable_x64(False):
        dea, dprops = pl.pallas_call(
            kernel,
            grid=(B, T),
            in_specs=_jc_specs(B, S, NK, L, K, tile),
            out_specs=[
                pl.BlockSpec(
                    (1, 1, NK, 1), lambda b, t: (b, t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, K, 1), lambda b, t: (b, t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, T, NK, 1), jnp.float32),
                jax.ShapeDtypeStruct((B, T, K, 1), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((N1, 4 * K, tile), jnp.float32),
                pltpu.VMEM((N1, 4 * K, tile), jnp.float32),
                pltpu.VMEM((N1, K, tile), jnp.float32),
                pltpu.VMEM((N1, 4 * K, tile), jnp.float32),
            ],
            interpret=interpret,
        )(post_children, ea, props, tips, weights)
    return dea[..., 0].sum(axis=1), dprops[..., 0].sum(axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _ll_jc(post_children, ea, props, data, leaf_count, root_id, tile,
           interpret):
    """(B,) log likelihoods from exponential factors. ea: (B, 1, N1*K);
    props: (1, K); data = (tips (L,4,PT), weights (1,PT)) constants."""
    tips, weights = data
    return _fwd_ll_call(
        post_children, ea, props, tips, weights, leaf_count=leaf_count,
        root_id=root_id, tile=tile, interpret=interpret,
    )


def _ll_jc_fwd(post_children, ea, props, data, leaf_count, root_id, tile,
               interpret):
    ll = _ll_jc(
        post_children, ea, props, data, leaf_count, root_id, tile, interpret
    )
    return ll, (post_children, ea, props, data)


def _ll_jc_bwd(leaf_count, root_id, tile, interpret, res, g):
    post_children, ea, props, data = res
    tips, weights = data
    dea, dprops = _bwd_dea_call(
        post_children, ea, props, tips, weights, leaf_count=leaf_count,
        root_id=root_id, tile=tile, interpret=interpret,
    )
    zero_pc = np.zeros(post_children.shape, dtype=jax.dtypes.float0)
    return (
        zero_pc,
        (dea * g[:, None])[:, None, :],
        jnp.sum(dprops * g[:, None], axis=0)[None, :].astype(props.dtype),
        None,
    )


_ll_jc.defvjp(_ll_jc_fwd, _ll_jc_bwd)


def log_likelihoods_pallas_jc69(
    post_children, bl_padded, tips, weights, *, leaf_count, root_id,
    rates=None, props=None, interpret=False, tile=None,
):
    """(B,) JC69 log likelihoods, differentiable in bl_padded, rates and
    props by AD through exp_factors + the dea custom VJP — the matrix-free
    replacement for pruning_pallas_vjp.log_likelihoods_pallas on JC69
    models (rooted time trees, VI steps). tips/weights must already be
    pattern-padded (pad_patterns)."""
    if rates is None:
        rates = jnp.ones((1,), jnp.float32)
    if props is None:
        K0 = rates.shape[0]
        props = jnp.full((K0,), 1.0 / K0, jnp.float32)
    rates = jnp.asarray(rates, jnp.float32)
    props = jnp.asarray(props, jnp.float32)
    K = rates.shape[0]
    N1 = bl_padded.shape[1]
    PT = weights.shape[0]
    if tile is None:
        tile = _auto_tile_jc(
            N1, K, leaf_count, PT, 3 * N1 * 4 * K + N1 * K
        )
    ea = exp_factors(bl_padded, rates)[:, None, :]
    return _ll_jc(
        jnp.asarray(post_children, jnp.int32),
        ea,
        props[None, :],
        (
            jnp.asarray(tips, jnp.float32),
            jnp.asarray(weights, jnp.float32)[None, :],
        ),
        leaf_count,
        root_id,
        tile,
        interpret,
    )


def log_likelihood_and_branch_gradient_pallas_jc69_sharded(
    mesh, post_children, bl_padded, tips, weights, *, root_id, rates=None,
    props=None, interpret=False, axis="dp",
):
    """Mesh-parallel JC69 kernel: shard the tree batch over ``axis`` with
    shard_map (Pallas custom calls are per-device programs, so the batch
    split is explicit — same contract as the generic sharded wrapper)."""
    from jax.sharding import PartitionSpec as PSpec

    def local(pc, bl_loc):
        return log_likelihood_and_branch_gradient_pallas_jc69(
            pc, bl_loc, tips, weights, root_id=root_id, rates=rates,
            props=props, interpret=interpret,
        )

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(PSpec(axis), PSpec(axis)),
        out_specs=(PSpec(axis), PSpec(axis)),
        check_vma=False,
    )
    return f(
        jnp.asarray(post_children, jnp.int32),
        jnp.asarray(bl_padded, jnp.float32),
    )
