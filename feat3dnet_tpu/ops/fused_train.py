"""Fused training-mode tower kernels: ConvBN pre-pool segments, fwd+bwd.

The r4 train-step anatomy (docs/BENCHMARKS.md, probe_towers_anatomy)
measured the f32 detector+descriptor towers at 18.6 ms/step against a
4.1 ms matmul skeleton: the 14.5 ms overhead is BN passes (6.8 ms) +
saved-activation HBM traffic + elementwise streams. XLA cannot fuse
training BN into the matmuls (batch moments are global), and the
backward pass re-reads ~2 GiB of saved activations per step
((B·M·ns, 256) alone is 604 MB).

This module rebuilds the pre-pool tower segments (behavior spec:
reference models/feat3dnet.py:99-151 detection MLP + maxpool and
pointnet_sa_module's MLP -> pool-concat -> MLP2, TF slim conv2d + EMA
BN) as a multi-pass Pallas pipeline that never materializes an
inter-layer activation in HBM:

  forward   one stats pass per conv: recompute the tower prefix
            tile-by-tile in VMEM (folded BN affines of the already-
            finalized convs), accumulate the new conv's masked
            per-channel sum/sumsq across the sequential grid, finalize
            the BN affine in XLA (tiny (C,) math); then one final pass
            recomputing everything + the slot max-pool.
  backward  a top pass that re-derives the pool routing (bit-identical
            recompute => exact tie masks) and accumulates the top
            conv's BN-backward reductions (sum dz, sum dz*xhat); then
            one pass per conv, top-down, computing dW/db (grid-
            accumulated in VMEM), the propagated cotangent do_{l-1}
            (streamed bf16 — the only HBM tensor the pipeline touches
            besides the input), and the NEXT conv's BN-backward
            reductions one pass ahead (so each conv's global m1/m2 are
            finalized before its apply pass).

Tower structure is a static PLAN: ("conv", relu) entries consuming one
(W, b, gamma, beta) quad each, plus ("poolcat",) — the descriptor's
h := concat([h, broadcast(slotmax(h))], lanes) (pointnet_sa_module's
pool-concat). A final slot max-pool always follows the last conv.
  detector:   (("conv", True),) * len(detector_mlp)
  descriptor: (("conv", True),) * len(mlp) + (("poolcat",),)
              + (("conv", relu),) * len(mlp2)   [last relu=False]

Why recompute-from-x instead of saving activations: the tower prefix
costs far fewer MACs than the top conv, every pass re-executes the
identical instruction sequence (same shapes, same kernel ops) so
recomputed values are bit-identical across passes — which makes the
relu masks and the max-pool tie masks exact — and the pipeline's total
HBM traffic drops to the (ns, G, 3) input + the bf16 cotangents.

Numerical semantics: f32 matmuls and f32 BN statistics; structurally
identical to flax.linen.BatchNorm training mode (biased variance, eps
inside rsqrt, moments over every non-channel axis; the loss
differentiates THROUGH the batch moments). Differences from the XLA
path: accumulation order of the global reductions, and bf16 rounding
of the inter-layer cotangents (grads only — mirrors the rounding the
shipped `residual_dtype=bfloat16` mode applies at its squash points).
Max-pool backward (final and poolcat) splits cotangents EVENLY among
ties — the same chooser rule as jax's reduce_max vjp, load-bearing
under repeat-pad neighborhoods (padded slots are exact copies of a
real slot and always tie with it).

Layout: slot-major (ns, G, C) — each grid step owns every slot of a
cluster tile, so pools are in-kernel loops over 2-D slices and every
intermediate stays strictly 2-D (the Mosaic unroll rule, CLAUDE.md).

x layouts: the original "slot_major" (ns, G, 3) input block is lane-
padded 3->128 (42x) and — because every pass recomputes from x — that
padding is RE-STREAMED from HBM in all ~2n+2 passes (~300 MB/pass at
paper shapes; the same tax the r4 extract roofline measured on the
(M, ns, 3) grouped tensor). The "t8" layout stores x transposed and
lane-dense as (ns*8, Gp) f32, rows s*8+c with channels c>=cin zeroed —
the exact layout the backward's dx output already used — cutting the
per-pass x stream 16x. In-kernel, conv 0 consumes it as ns per-slot
(8, ct)^T @ (8, C1) matmuls (zero-padded W0 rows contribute exactly 0),
so no lane-3 array ever exists on the t8 path. The t8 epilogue/prolog
transposes run once in XLA, not per pass.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array
Plan = Tuple[Tuple, ...]

_VMEM = 100 * 1024 * 1024


def detector_plan(n_convs: int) -> Plan:
    return (("conv", True),) * n_convs


def descriptor_plan(n_pre: int, n_mid: int) -> Plan:
    mids = tuple(("conv", i < n_mid - 1) for i in range(n_mid))
    return (("conv", True),) * n_pre + (("poolcat",),) + mids


def plan_conv_widths(plan: Plan, widths: Tuple[int, ...], cin: int
                     ) -> List[Tuple[int, int]]:
    """Per conv: (input width, output width) implied by the plan."""
    out, c, j = [], cin, 0
    for op in plan:
        if op[0] == "poolcat":
            c = 2 * c
        else:
            out.append((c, widths[j]))
            c = widths[j]
            j += 1
    return out


def _row_mask(ns: int, ct: int, tile: Array, g_total: int) -> Array:
    """(ns*ct, 1) f32: 1.0 where the row's cluster index is < g_total."""
    g_local = jax.lax.broadcasted_iota(jnp.int32, (ns * ct, 1), 0) % ct
    return (g_local + tile * ct < g_total).astype(jnp.float32)


def _mm(a: Array, b: Array) -> Array:
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _mm_tn(a: Array, b: Array) -> Array:
    """a^T @ b without an explicit transpose: (R, Ca),(R, Cb)->(Ca, Cb)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_nt(a: Array, b: Array) -> Array:
    """a @ b^T without an explicit transpose: (R, K),(C, K) -> (R, C)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _accum(ref, i: Array, upd: Array) -> None:
    @pl.when(i == 0)
    def _():
        ref[...] = upd

    @pl.when(i > 0)
    def _():
        ref[...] = ref[...] + upd


def _pool_and_ties(h: Array, ns: int, ct: int) -> Tuple[Array, Array]:
    """Slot max-pool of a (ns*ct, C) tile -> (pool (ct, C), tie count)."""
    pool = h[0:ct, :]
    for s in range(1, ns):
        pool = jnp.maximum(pool, h[s * ct:(s + 1) * ct, :])
    cnt = (h[0:ct, :] == pool).astype(jnp.float32)
    for s in range(1, ns):
        cnt = cnt + (h[s * ct:(s + 1) * ct, :] == pool).astype(jnp.float32)
    return pool, cnt


def _route_pool(h: Array, pool: Array, cnt: Array, dpool: Array,
                ns: int, ct: int) -> Array:
    """Even-split tie routing of dpool (ct, C) -> d_h (ns*ct, C)."""
    unit = dpool / cnt
    rows = []
    for s in range(ns):
        hs = h[s * ct:(s + 1) * ct, :]
        rows.append(jnp.where(hs == pool, unit, 0.0))
    return jnp.concatenate(rows, axis=0)


def _poolcat_fwd(h: Array, ns: int, ct: int) -> Array:
    """h := concat([h, broadcast(slotmax(h))], lanes)."""
    pool, _ = _pool_and_ties(h, ns, ct)
    bcast = jnp.concatenate([pool] * ns, axis=0)
    return jnp.concatenate([h, bcast], axis=1)


def _h0_from_xt(xt: Array, w0p: Array, ns: int, ct: int) -> Array:
    """Conv 0 directly on the t8 input layout: xt (ns*8, ct) tile, rows
    s*8+c with channels c >= cin zeroed; w0p (8, C1) zero-row-padded W0.
    Returns x @ W0 as (ns*ct, C1) — per-slot (8, ct)^T @ (8, C1) matmuls,
    so no lane-3 array is ever materialized (padded rows contribute 0)."""
    rows = []
    for s in range(ns):
        rows.append(_mm_tn(xt[s * 8:(s + 1) * 8, :], w0p))
    return jnp.concatenate(rows, axis=0)


class _Rec:
    """Per-conv forward record on a tile: input h_in, pre-BN y,
    post-activation o, and whether a poolcat directly precedes it.
    h_in is None for conv 0 in t8 mode (consumed from x_ref directly)."""

    __slots__ = ("h_in", "y", "o", "after_poolcat")

    def __init__(self, h_in, y, o, after_poolcat):
        self.h_in, self.y, self.o = h_in, y, o
        self.after_poolcat = after_poolcat


def _run_plan(x_ref, plan: Plan, params, upto_conv: int, ns: int, ct: int,
              xt_mode: bool = False) -> Tuple[Array, List[_Rec]]:
    """Interpret the plan, applying folded convs, until `upto_conv`
    convs are consumed (and every plan op before the next conv).
    Returns (h at that point, per-conv records). With xt_mode, x_ref is
    the (ns*8, ct) t8 tile and conv 0 consumes it via _h0_from_xt
    (params[0]'s W must be the (8, C1) zero-row-padded W0); h is None
    until the first conv runs."""
    h = None if xt_mode else x_ref[...].reshape(ns * ct, x_ref.shape[-1])
    recs: List[_Rec] = []
    j = 0
    after_pc = False
    for op in plan:
        if op[0] == "poolcat":
            # applied even when it directly precedes the stopping conv:
            # the caller needs conv upto_conv's true input
            h = _poolcat_fwd(h, ns, ct)
            after_pc = True
            continue
        if j == upto_conv:
            break
        w, b, a, c = params[j]
        h_in = h
        if h is None:
            y = _h0_from_xt(x_ref[...], w[...], ns, ct) + b[...]
        else:
            y = _mm(h, w[...]) + b[...]
        z = y * a[...] + c[...]
        h = jnp.maximum(z, 0.0) if op[1] else z
        recs.append(_Rec(h_in, y, h, after_pc))
        after_pc = False
        j += 1
    return h, recs


def _n_convs(plan: Plan) -> int:
    return sum(1 for op in plan if op[0] == "conv")


def _plan_index_of_conv(plan: Plan, j: int) -> int:
    c = 0
    for i, op in enumerate(plan):
        if op[0] == "conv":
            if c == j:
                return i
            c += 1
    raise ValueError(j)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _stats_kernel(x_ref, *refs, plan: Plan, j: int, ns: int, ct: int,
                  g_total: int, xt_mode: bool = False):
    """Masked sum/sumsq of conv j's pre-BN output y."""
    i = pl.program_id(0)
    params = [tuple(refs[4 * l:4 * l + 4]) for l in range(j)]
    w_new, b_new = refs[4 * j], refs[4 * j + 1]
    stats_ref = refs[4 * j + 2]

    h, _ = _run_plan(x_ref, plan, params, j, ns, ct, xt_mode)
    if h is None:   # xt_mode, j == 0: conv 0 is the conv under statistics
        y = _h0_from_xt(x_ref[...], w_new[...], ns, ct) + b_new[...]
    else:
        y = _mm(h, w_new[...]) + b_new[...]
    ym = y * _row_mask(ns, ct, i, g_total)
    s = jnp.sum(ym, axis=0, keepdims=True)
    q = jnp.sum(ym * ym, axis=0, keepdims=True)
    upd = jnp.concatenate(
        [s, q, jnp.zeros((6, y.shape[-1]), jnp.float32)], axis=0)
    _accum(stats_ref, i, upd)


def _final_kernel(x_ref, *refs, plan: Plan, ns: int, ct: int,
                  xt_mode: bool = False):
    """Full recompute + final slot max-pool -> (ct, C_top) tile."""
    n = _n_convs(plan)
    params = [tuple(refs[4 * l:4 * l + 4]) for l in range(n)]
    out_ref = refs[4 * n]
    h, _ = _run_plan(x_ref, plan, params, n, ns, ct, xt_mode)
    pool, _ = _pool_and_ties(h, ns, ct)
    out_ref[...] = pool


def _bwdstats_top_kernel(x_ref, *refs, plan: Plan, ns: int, ct: int,
                         xt_mode: bool = False):
    """Route dpooled through the final pool ties; accumulate the top
    conv's (sum dz, sum dz*xhat)."""
    i = pl.program_id(0)
    n = _n_convs(plan)
    params = [tuple(refs[4 * l:4 * l + 4]) for l in range(n)]
    k = 4 * n
    mu_ref, isig_ref, dpool_ref, out_ref = refs[k], refs[k + 1], \
        refs[k + 2], refs[k + 3]

    h, recs = _run_plan(x_ref, plan, params, n, ns, ct, xt_mode)
    top = recs[-1]
    relu = plan[_plan_index_of_conv(plan, n - 1)][1]
    xhat = (top.y - mu_ref[0:1, :]) * isig_ref[0:1, :]

    pool, cnt = _pool_and_ties(h, ns, ct)
    do = _route_pool(h, pool, cnt, dpool_ref[...], ns, ct)
    if relu:
        w, b, a, c = params[-1]
        z = top.y * a[...] + c[...]
        dz = jnp.where(z > 0.0, do, 0.0)
    else:
        dz = do
    s1 = jnp.sum(dz, axis=0, keepdims=True)
    s2 = jnp.sum(dz * xhat, axis=0, keepdims=True)
    upd = jnp.concatenate(
        [s1, s2, jnp.zeros((6, s1.shape[-1]), jnp.float32)], axis=0)
    _accum(out_ref, i, upd)


def _bwd_kernel(x_ref, *refs, plan: Plan, j: int, ns: int, ct: int,
                g_total: int, cin: int, cot_dtype=jnp.bfloat16,
                xt_mode: bool = False):
    """Backward apply pass for conv j (0-indexed; top = n_convs-1).

    Input refs, in order:
      folded params (w, b, a, c) for convs 0..j;
      mu_j, isig_j (1, C_j);
      the cotangent source: the dpooled (ct, C_j) block if j is top,
      else the streamed bf16 do_j (ns, ct, C_j) block;
      bncoef_j (8, C_j): rows 0/1/2 = m1, m2, gamma/sigma;
      if j > 0: mu_{j-1}, isig_{j-1}.
    Output refs:
      dW_j (C_in_j, C_j) grid-accumulated; db_j (8, C_j) row 0;
      if j > 0: do_{j-1} bf16 (ns, ct, C_{j-1}) block (poolcat between
      j-1 and j already backpropagated) + bwdstats_{j-1} (8, C_{j-1})
      accumulated; else: dx (ns*8, ct) block, rows s*8+c.
    """
    i = pl.program_id(0)
    n = _n_convs(plan)
    params = [tuple(refs[4 * l:4 * l + 4]) for l in range(j + 1)]
    k = 4 * (j + 1)
    mu_ref, isig_ref = refs[k], refs[k + 1]
    src_ref = refs[k + 2]
    bncoef_ref = refs[k + 3]
    k += 4
    if j > 0:
        mu_p_ref, isig_p_ref = refs[k], refs[k + 1]
        k += 2
    dw_ref, db_ref = refs[k], refs[k + 1]
    k += 2

    top = j == n - 1
    pidx = _plan_index_of_conv(plan, j)
    relu = plan[pidx][1]

    h, recs = _run_plan(x_ref, plan, params, j + 1, ns, ct, xt_mode)
    rec = recs[-1]
    xhat = (rec.y - mu_ref[0:1, :]) * isig_ref[0:1, :]
    w_j, b_j, a_j, c_j = params[-1]

    if top:
        pool, cnt = _pool_and_ties(h, ns, ct)
        do = _route_pool(h, pool, cnt, src_ref[...], ns, ct)
    else:
        do = src_ref[...].reshape(ns * ct, rec.y.shape[-1]).astype(
            jnp.float32)

    if relu:
        z = rec.y * a_j[...] + c_j[...]
        dz = jnp.where(z > 0.0, do, 0.0)
    else:
        dz = do
    m1 = bncoef_ref[0:1, :]
    m2 = bncoef_ref[1:2, :]
    ga_sig = bncoef_ref[2:3, :]
    # mask PAD clusters: their dz is zero (zero dpool / zero propagated
    # cotangent) but the global BN-backward correction terms -m1 -xhat*m2
    # are not — without the mask pads would contaminate dW/db/dx
    dy = ga_sig * (dz - m1 - xhat * m2) * _row_mask(ns, ct, i, g_total)

    if rec.h_in is None:   # xt_mode conv 0: dW from the t8 tile directly
        xt = x_ref[...]
        dw_upd = _mm(xt[0:8, :], dy[0:ct, :])
        for s in range(1, ns):
            dw_upd = dw_upd + _mm(xt[s * 8:(s + 1) * 8, :],
                                  dy[s * ct:(s + 1) * ct, :])
    else:
        dw_upd = _mm_tn(rec.h_in, dy)
    db_upd = jnp.concatenate(
        [jnp.sum(dy, axis=0, keepdims=True),
         jnp.zeros((7, dy.shape[-1]), jnp.float32)], axis=0)
    _accum(dw_ref, i, dw_upd)
    _accum(db_ref, i, db_upd)

    if j > 0:
        do_out_ref, bst_ref = refs[k], refs[k + 1]
        dcat = _mm_nt(dy, w_j[...])                 # (ns*ct, C_in_j)
        prev = recs[-2]
        if rec.after_poolcat:
            # conv j's input was concat([o_{j-1}, bcast(slotmax)]):
            # split lanes, reduce the broadcast branch over slots,
            # route it through the poolcat ties, add the direct branch
            cprev = prev.o.shape[-1]
            d_direct = dcat[:, :cprev]
            d_bcast = dcat[:, cprev:]
            dpool2 = d_bcast[0:ct, :]
            for s in range(1, ns):
                dpool2 = dpool2 + d_bcast[s * ct:(s + 1) * ct, :]
            pool2, cnt2 = _pool_and_ties(prev.o, ns, ct)
            do_prev = d_direct + _route_pool(prev.o, pool2, cnt2, dpool2,
                                             ns, ct)
        else:
            do_prev = dcat
        do_prev_bf = do_prev.astype(cot_dtype)
        do_out_ref[...] = do_prev_bf.reshape(ns, ct, do_prev.shape[-1])

        relu_p = plan[_plan_index_of_conv(plan, j - 1)][1]
        xhat_p = (prev.y - mu_p_ref[0:1, :]) * isig_p_ref[0:1, :]
        dop = do_prev_bf.astype(jnp.float32)
        if relu_p:
            w_p, b_p, a_p, c_p = params[-2]
            z_p = prev.y * a_p[...] + c_p[...]
            dz_p = jnp.where(z_p > 0.0, dop, 0.0)
        else:
            dz_p = dop
        s1 = jnp.sum(dz_p, axis=0, keepdims=True)
        s2 = jnp.sum(dz_p * xhat_p, axis=0, keepdims=True)
        upd = jnp.concatenate(
            [s1, s2, jnp.zeros((6, s1.shape[-1]), jnp.float32)], axis=0)
        _accum(bst_ref, i, upd)
    else:
        dx_ref = refs[k]
        # dx^T = W_0 @ dy^T, lane-dense (C_in, ns*ct). In xt_mode w_j is
        # already the (8, C1) zero-row-padded W0, so dxt's padded rows
        # are exactly zero and slot blocks write through unmodified.
        dxt = jax.lax.dot_general(
            w_j[...], dy, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        for s in range(ns):
            blk = dxt[:, s * ct:(s + 1) * ct]        # (C_in, ct)
            if not xt_mode:
                blk = jnp.concatenate(
                    [blk, jnp.zeros((8 - cin, ct), jnp.float32)], axis=0)
            dx_ref[s * 8:(s + 1) * 8, :] = blk


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------


def _finalize_stats(stats: Array, count, gamma: Array, beta: Array,
                    eps: float, axis_name: Optional[str]):
    """(8, C) sum/sumsq -> (mean, var, a, c, inv_sigma); z = y*a + c
    (y already includes the conv bias). With axis_name, moments are
    GLOBAL across the data-parallel axis (flax cross-replica BN)."""
    s, q = stats[0], stats[1]
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
        q = jax.lax.psum(q, axis_name)
        count = count * jax.lax.psum(1.0, axis_name)
    mean = s / count
    var = jnp.maximum(q / count - mean * mean, 0.0)
    inv_sigma = jax.lax.rsqrt(var + eps)
    a = gamma * inv_sigma
    c = beta - a * mean
    return mean, var, a, c, inv_sigma


def _row(v: Array) -> Array:
    return v.reshape(1, -1)


def _folded_ops(flat_params, folded, upto):
    ops = []
    for l in range(upto):
        w, b, _, _ = flat_params[4 * l:4 * l + 4]
        a, c = folded[l]
        ops += [w, _row(b), _row(a), _row(c)]
    return ops


def _pad_w0(flat_params: Tuple[Array, ...], cin: int) -> Tuple[Array, ...]:
    """t8 mode: zero-row-pad W0 (cin, C1) -> (8, C1) once, in XLA, so
    every kernel sees the padded operand (padded rows contribute 0)."""
    w0 = flat_params[0]
    w0p = jnp.concatenate(
        [w0, jnp.zeros((8 - cin, w0.shape[1]), w0.dtype)], axis=0)
    return (w0p,) + tuple(flat_params[1:])


def _fwd_impl(x_sm: Array, flat_params: Tuple[Array, ...], plan: Plan,
              widths: Tuple[int, ...], ns: int, g_total: int, eps: float,
              ct: int, interpret: bool, axis_name: Optional[str],
              xt_mode: bool = False, cin: Optional[int] = None):
    n = _n_convs(plan)
    gp = x_sm.shape[1]
    tiles = gp // ct
    if xt_mode:
        cin = int(cin)
        flat_params = _pad_w0(flat_params, cin)
        x_spec = pl.BlockSpec((ns * 8, ct), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    else:
        cin = x_sm.shape[2]
        x_spec = pl.BlockSpec((ns, ct, cin), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
    count = float(ns * g_total)
    grid = (tiles,)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    cp = pltpu.CompilerParams(vmem_limit_bytes=_VMEM)

    folded, means, vars_, isigs = [], [], [], []
    for j in range(n):
        w, b, g, be = flat_params[4 * j:4 * j + 4]
        prev_ops = _folded_ops(flat_params, folded, j)
        stats = pl.pallas_call(
            partial(_stats_kernel, plan=plan, j=j, ns=ns, ct=ct,
                    g_total=g_total, xt_mode=xt_mode),
            grid=grid,
            in_specs=[x_spec] + [vm] * (len(prev_ops) + 2),
            out_specs=pl.BlockSpec((8, widths[j]), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, widths[j]), jnp.float32),
            compiler_params=cp,
            interpret=interpret,
        )(x_sm, *prev_ops, w, _row(b))
        mean, var, a, c, isig = _finalize_stats(stats, count, g, be, eps,
                                                axis_name)
        means.append(mean)
        vars_.append(var)
        isigs.append(isig)
        folded.append((a, c))

    all_ops = _folded_ops(flat_params, folded, n)
    pooled = pl.pallas_call(
        partial(_final_kernel, plan=plan, ns=ns, ct=ct, xt_mode=xt_mode),
        grid=grid,
        in_specs=[x_spec] + [vm] * len(all_ops),
        out_specs=pl.BlockSpec((ct, widths[-1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gp, widths[-1]), jnp.float32),
        compiler_params=cp,
        interpret=interpret,
    )(x_sm, *all_ops)
    return pooled, means, vars_, folded, isigs


def _bwd_impl(x_sm, flat_params, dpooled, means, folded, isigs, plan: Plan,
              widths: Tuple[int, ...], ns: int, g_total: int, eps: float,
              ct: int, interpret: bool, axis_name: Optional[str],
              cot_dtype=jnp.bfloat16, xt_mode: bool = False,
              cin: Optional[int] = None):
    n = _n_convs(plan)
    gp = x_sm.shape[1]
    tiles = gp // ct
    if xt_mode:
        cin_true = int(cin)
        cin = 8   # kernels see the padded W0/dW; sliced back below
        flat_params = _pad_w0(flat_params, cin_true)
        x_spec = pl.BlockSpec((ns * 8, ct), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    else:
        cin = cin_true = x_sm.shape[2]
        x_spec = pl.BlockSpec((ns, ct, cin), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
    count = float(ns * g_total)
    if axis_name is not None:
        count = count * jax.lax.psum(1.0, axis_name)
    grid = (tiles,)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    cp = pltpu.CompilerParams(vmem_limit_bytes=_VMEM)
    conv_io = plan_conv_widths(plan, widths, cin)
    top = n - 1

    dpool_spec = pl.BlockSpec((ct, widths[top]), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    all_ops = _folded_ops(flat_params, folded, n)
    bst = pl.pallas_call(
        partial(_bwdstats_top_kernel, plan=plan, ns=ns, ct=ct,
                xt_mode=xt_mode),
        grid=grid,
        in_specs=[x_spec] + [vm] * (len(all_ops) + 2) + [dpool_spec],
        out_specs=pl.BlockSpec((8, widths[top]), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, widths[top]), jnp.float32),
        compiler_params=cp,
        interpret=interpret,
    )(x_sm, *all_ops, _row(means[top]), _row(isigs[top]), dpooled)

    dparams = [None] * n
    do_src, do_spec = dpooled, dpool_spec
    dx_sm = None
    for j in range(n - 1, -1, -1):
        w, b, g, be = flat_params[4 * j:4 * j + 4]
        if axis_name is not None:
            bst = jax.lax.psum(bst, axis_name)
        m1 = bst[0] / count
        m2 = bst[1] / count
        bncoef = jnp.concatenate(
            [_row(m1), _row(m2), _row(g * isigs[j]),
             jnp.zeros((5, widths[j]), jnp.float32)], axis=0)

        ops = [x_sm] + _folded_ops(flat_params, folded, j + 1) + [
            _row(means[j]), _row(isigs[j]), do_src, bncoef]
        in_specs = [x_spec] + [vm] * (4 * (j + 1) + 2) + [do_spec, vm]
        if j > 0:
            ops += [_row(means[j - 1]), _row(isigs[j - 1])]
            in_specs += [vm, vm]

        c_in = conv_io[j][0]
        out_shapes = [jax.ShapeDtypeStruct((c_in, widths[j]), jnp.float32),
                      jax.ShapeDtypeStruct((8, widths[j]), jnp.float32)]
        out_specs = [pl.BlockSpec((c_in, widths[j]), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((8, widths[j]), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)]
        if j > 0:
            cl = widths[j - 1]
            out_shapes += [
                jax.ShapeDtypeStruct((ns, gp, cl), cot_dtype),
                jax.ShapeDtypeStruct((8, cl), jnp.float32)]
            out_specs += [
                pl.BlockSpec((ns, ct, cl), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, cl), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)]
        else:
            out_shapes.append(jax.ShapeDtypeStruct((ns * 8, gp),
                                                   jnp.float32))
            out_specs.append(pl.BlockSpec((ns * 8, ct), lambda i: (0, i),
                                          memory_space=pltpu.VMEM))

        outs = pl.pallas_call(
            partial(_bwd_kernel, plan=plan, j=j, ns=ns, ct=ct,
                    g_total=g_total, cin=cin, cot_dtype=cot_dtype,
                    xt_mode=xt_mode),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            compiler_params=cp,
            interpret=interpret,
        )(*ops)
        dw, db8 = outs[0], outs[1]
        if axis_name is not None:
            dw = jax.lax.psum(dw, axis_name)
            db8 = jax.lax.psum(db8, axis_name)
            # dgamma/dbeta come from bst, already psum'd above
        if xt_mode and j == 0:
            dw = dw[:cin_true]   # drop the zero-padded W0 rows
        # dgamma = sum dz*xhat, dbeta = sum dz — free from the reductions
        dparams[j] = (dw, db8[0], bst[1], bst[0])
        if j > 0:
            do_src, bst = outs[2], outs[3]
            cl = widths[j - 1]
            do_spec = pl.BlockSpec((ns, ct, cl), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)
        else:
            dx_t = outs[2]                            # (ns*8, gp)
            if xt_mode:
                dx_sm = dx_t   # cotangent in the t8 input layout itself
            else:
                dx_sm = dx_t.reshape(ns, 8, gp)[:, :cin, :].transpose(0, 2, 1)

    dflat = []
    for j in range(n):
        dflat += list(dparams[j])
    return dx_sm, tuple(dflat)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12))
def tower_prepool_fused(x_sm: Array, flat_params: Tuple[Array, ...],
                        plan: Plan, widths: Tuple[int, ...], ns: int,
                        g_total: int, eps: float = 1e-3, ct: int = 128,
                        interpret: bool = False, axis_name=None,
                        cot_dtype=jnp.bfloat16, x_layout: str = "slot_major",
                        cin: Optional[int] = None):
    """Fused training-mode ConvBN tower + slot max-pool.

    x_sm: with x_layout="slot_major", (ns, Gp, C_in) slot-major grouped
    offsets; with x_layout="t8", the lane-dense (ns*8, Gp) transposed
    layout (rows s*8+c, channels c >= cin zeroed — see module docstring;
    `cin` must then be given). Gp % ct == 0 either way (pad clusters are
    masked out of every statistic; their pooled rows are garbage — slice
    to g_total).
    flat_params: per conv (W (Cin,Cout), b, gamma, beta), flat tuple in
    plan order. plan: see detector_plan / descriptor_plan.
    axis_name: data-parallel mesh axis for GLOBAL batch moments (flax
    cross-replica BN parity) — both forward moments and the backward
    reductions are psum'd.

    Returns (pooled (Gp, C_top), (batch_means, batch_vars) per conv for
    the EMA batch_stats update). The loss differentiates through the
    batch moments (flax BatchNorm training semantics); the stats outputs
    themselves are non-differentiable (EMA updates are stop-grad).
    """
    pooled, means, vars_, _, _ = _fwd_impl(
        x_sm, flat_params, plan, widths, ns, g_total, eps, ct, interpret,
        axis_name, xt_mode=(x_layout == "t8"), cin=cin)
    return pooled, (tuple(means), tuple(vars_))


def _vjp_fwd(x_sm, flat_params, plan, widths, ns, g_total, eps, ct,
             interpret, axis_name, cot_dtype, x_layout, cin):
    pooled, means, vars_, folded, isigs = _fwd_impl(
        x_sm, flat_params, plan, widths, ns, g_total, eps, ct, interpret,
        axis_name, xt_mode=(x_layout == "t8"), cin=cin)
    res = (x_sm, flat_params, tuple(means), tuple(folded), tuple(isigs))
    return (pooled, (tuple(means), tuple(vars_))), res


def _vjp_bwd(plan, widths, ns, g_total, eps, ct, interpret, axis_name,
             cot_dtype, x_layout, cin, res, cts):
    x_sm, flat_params, means, folded, isigs = res
    dpooled, _ = cts
    dx_sm, dflat = _bwd_impl(
        x_sm, flat_params, dpooled, list(means), list(folded), list(isigs),
        plan, widths, ns, g_total, eps, ct, interpret, axis_name, cot_dtype,
        xt_mode=(x_layout == "t8"), cin=cin)
    return dx_sm, dflat


tower_prepool_fused.defvjp(_vjp_fwd, _vjp_bwd)


def convbn_maxpool_fused(x_sm: Array, flat_params: Tuple[Array, ...],
                         widths: Tuple[int, ...], ns: int, g_total: int,
                         eps: float = 1e-3, ct: int = 128,
                         interpret: bool = False, cot_dtype=jnp.bfloat16,
                         x_layout: str = "slot_major",
                         cin: Optional[int] = None):
    """Plain relu-ConvBN chain + pool (the detector pre-pool segment)."""
    return tower_prepool_fused(x_sm, flat_params, detector_plan(len(widths)),
                               widths, ns, g_total, eps, ct, interpret,
                               None, cot_dtype, x_layout, cin)


def pack_x_t8(x_sm: Array) -> Array:
    """(ns, Gp, cin) slot-major -> the (ns*8, Gp) t8 layout (rows s*8+c,
    channels c >= cin zeroed)."""
    ns, gp, cin = x_sm.shape
    xt = jnp.transpose(x_sm, (0, 2, 1))
    return jnp.pad(xt, ((0, 0), (0, 8 - cin), (0, 0))).reshape(ns * 8, gp)


def unpack_dx_t8(dx_t: Array, ns: int, cin: int) -> Array:
    """Inverse of pack_x_t8 for the t8-layout x cotangent."""
    gp = dx_t.shape[1]
    return dx_t.reshape(ns, 8, gp)[:, :cin, :].transpose(0, 2, 1)


# ---------------------------------------------------------------------------
# test reference
# ---------------------------------------------------------------------------


def reference_tower(x_sm: Array, flat_params, plan: Plan, widths, ns: int,
                    g_total: int, eps: float = 1e-3):
    """Pure-jnp reference (flax-equivalent math): slot-major (ns, G, C_in)
    -> (pooled (G, C_top), (means, vars))."""
    h = x_sm[:, :g_total, :]
    means, vars_, j = [], [], 0
    for op in plan:
        if op[0] == "poolcat":
            pooled = jnp.max(h, axis=0, keepdims=True)
            h = jnp.concatenate(
                [h, jnp.broadcast_to(pooled, h.shape)], axis=-1)
            continue
        w, b, g, be = flat_params[4 * j:4 * j + 4]
        y = jnp.einsum("sgc,cd->sgd", h, w) + b
        mean = jnp.mean(y, axis=(0, 1))
        var = jnp.mean(jnp.square(y), axis=(0, 1)) - jnp.square(mean)
        xhat = (y - mean) * jax.lax.rsqrt(var + eps)
        z = g * xhat + be
        h = jax.nn.relu(z) if op[1] else z
        means.append(mean)
        vars_.append(var)
        j += 1
    return jnp.max(h, axis=0), (tuple(means), tuple(vars_))


def reference_convbn_maxpool(x_sm: Array, flat_params, widths, ns: int,
                             g_total: int, eps: float = 1e-3):
    return reference_tower(x_sm, flat_params, detector_plan(len(widths)),
                           widths, ns, g_total, eps)
