"""Fused training-mode tower kernels: ConvBN pre-pool segment, fwd+bwd.

The r4 train-step anatomy (docs/BENCHMARKS.md, probe_towers_anatomy)
measured the f32 detector+descriptor towers at 18.6 ms/step against a
4.1 ms matmul skeleton: the 14.5 ms overhead is BN passes (6.8 ms) +
saved-activation HBM traffic + elementwise streams. XLA cannot fuse
training BN into the matmuls (batch moments are global), and the
backward pass re-reads ~2 GiB of saved activations per step
((B·M·ns, 256) alone is 604 MB).

This module rebuilds the pre-pool tower segment (behavior spec:
reference models/feat3dnet.py:99-127 detection MLP + maxpool, TF
slim conv2d + EMA BN) as a multi-pass Pallas pipeline that never
materializes an inter-layer activation in HBM:

  forward   one stats pass per layer: recompute the tower prefix
            tile-by-tile in VMEM (folded BN affines of the already-
            finalized layers), accumulate the new layer's masked
            per-channel sum/sumsq across the sequential grid, finalize
            the BN affine in XLA (tiny (C,) math); then one final pass
            recomputing everything + the slot max-pool.
  backward  a top pass that re-derives the pool routing (bit-identical
            recompute => exact tie masks) and accumulates the top
            layer's BN-backward reductions (sum dz, sum dz*xhat); then
            one pass per layer, top-down, computing dW/db (grid-
            accumulated in VMEM), the propagated cotangent do_{l-1}
            (stored bf16 — the only HBM tensor the pipeline streams),
            and the NEXT layer's BN-backward reductions one pass ahead
            (so each layer's global m1/m2 are finalized before its
            apply pass).

Why recompute-from-x instead of saving activations: the tower prefix
costs c1+c2 « c3 MACs, every pass re-executes the identical instruction
sequence (same shapes, same kernels) so recomputed values are
bit-identical across passes — which makes the relu masks and the
max-pool tie masks exact — and the pipeline's total HBM traffic drops
to the (ns, G, 3) input + the bf16 cotangents.

Numerical semantics: f32 matmuls and f32 BN statistics; structurally
identical to flax.linen.BatchNorm training mode (biased variance, eps
inside rsqrt, moments over every non-channel axis; the loss
differentiates THROUGH the batch moments). Differences from the XLA
path: accumulation order of the global reductions, and bf16 rounding
of the inter-layer cotangents (grads only — mirrors the rounding the
shipped `residual_dtype=bfloat16` mode applies at its squash points).
Max-pool backward splits cotangents EVENLY among ties — the same
chooser rule as jax's reduce_max vjp, load-bearing under repeat-pad
neighborhoods (padded slots are exact copies of a real slot and always
tie with it).

Layout: slot-major (ns, G, C) — each grid step owns every slot of a
cluster tile, so pools are in-kernel loops over 2-D slices and every
intermediate stays strictly 2-D (the Mosaic unroll rule, CLAUDE.md).
The only lane-padded block is the (ns, ct, 3) input (42x VMEM pad on
~100 KB logical — transient).
"""
from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_VMEM = 100 * 1024 * 1024


def _row_mask(ns: int, ct: int, tile: Array, g_total: int) -> Array:
    """(ns*ct, 1) f32: 1.0 where the row's cluster index < g_total."""
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


def _prefix(x_ref, params, upto: int, ns: int, ct: int
            ) -> Tuple[List[Array], List[Array]]:
    """Recompute layers 1..upto on the tile. params[l] = (w, b, a, c)
    refs (folded affine: z = y*a + c, y = h@w + b). Returns (ys, os)
    with os[0] = the 2-D input."""
    h = x_ref[...].reshape(ns * ct, x_ref.shape[-1])
    ys, os_ = [], [h]
    for l in range(upto):
        w, b, a, c = params[l]
        y = _mm(h, w[...]) + b[...]
        h = jnp.maximum(y * a[...] + c[...], 0.0)
        ys.append(y)
        os_.append(h)
    return ys, os_


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
    """Even-split tie routing of dpool (ct, C) -> do (ns*ct, C)."""
    unit = dpool / cnt
    rows = []
    for s in range(ns):
        hs = h[s * ct:(s + 1) * ct, :]
        rows.append(jnp.where(hs == pool, unit, 0.0))
    return jnp.concatenate(rows, axis=0)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _stats_kernel(x_ref, *refs, n_prev: int, ns: int, ct: int, g_total: int):
    """Masked sum/sumsq of layer (n_prev+1)'s pre-BN output y."""
    i = pl.program_id(0)
    params = [tuple(refs[4 * l:4 * l + 4]) for l in range(n_prev)]
    w_new, b_new = refs[4 * n_prev], refs[4 * n_prev + 1]
    stats_ref = refs[4 * n_prev + 2]

    _, os_ = _prefix(x_ref, params, n_prev, ns, ct)
    y = _mm(os_[-1], w_new[...]) + b_new[...]
    ym = y * _row_mask(ns, ct, i, g_total)
    s = jnp.sum(ym, axis=0, keepdims=True)
    q = jnp.sum(ym * ym, axis=0, keepdims=True)
    upd = jnp.concatenate(
        [s, q, jnp.zeros((6, y.shape[-1]), jnp.float32)], axis=0)
    _accum(stats_ref, i, upd)


def _final_kernel(x_ref, *refs, n_layers: int, ns: int, ct: int):
    """Full recompute + slot max-pool -> (ct, C_L) pooled tile."""
    params = [tuple(refs[4 * l:4 * l + 4]) for l in range(n_layers)]
    out_ref = refs[4 * n_layers]
    _, os_ = _prefix(x_ref, params, n_layers, ns, ct)
    pool, _ = _pool_and_ties(os_[-1], ns, ct)
    out_ref[...] = pool


def _bwdstats_top_kernel(x_ref, *refs, n_layers: int, ns: int, ct: int):
    """Pool-route dpooled to the top layer; accumulate (sum dz,
    sum dz*xhat) of the top layer."""
    i = pl.program_id(0)
    params = [tuple(refs[4 * l:4 * l + 4]) for l in range(n_layers)]
    k = 4 * n_layers
    mu_ref, isig_ref, dpool_ref, out_ref = refs[k], refs[k + 1], \
        refs[k + 2], refs[k + 3]

    ys, os_ = _prefix(x_ref, params, n_layers, ns, ct)
    h = os_[-1]
    w, b, a, c = params[-1]
    xhat = (ys[-1] - mu_ref[0:1, :]) * isig_ref[0:1, :]
    z = ys[-1] * a[...] + c[...]

    pool, cnt = _pool_and_ties(h, ns, ct)
    do = _route_pool(h, pool, cnt, dpool_ref[...], ns, ct)
    dz = jnp.where(z > 0.0, do, 0.0)
    s1 = jnp.sum(dz, axis=0, keepdims=True)
    s2 = jnp.sum(dz * xhat, axis=0, keepdims=True)
    upd = jnp.concatenate(
        [s1, s2, jnp.zeros((6, s1.shape[-1]), jnp.float32)], axis=0)
    _accum(out_ref, i, upd)


def _bwd_kernel(x_ref, *refs, ell: int, ns: int, ct: int, top: bool,
                cin: int, g_total: int, cot_dtype=jnp.bfloat16):
    """Backward apply pass for layer `ell` (1-indexed).

    Input refs, in order:
      folded params (w, b, a, c) for layers 1..ell;
      mu_ell, isig_ell (1, C_ell);
      the cotangent source: dpooled (ct, C) block if top, else the
      saved bf16 do_ell (ns, ct, C_ell) block;
      bncoef_ell (8, C_ell): rows 0/1/2 = m1, m2, gamma/sigma;
      if ell > 1: mu_{ell-1}, isig_{ell-1}.
    Output refs:
      dW_ell (C_{ell-1}, C_ell) accumulated; db_ell (8, C_ell) row 0;
      if ell > 1: do_{ell-1} bf16 (ns, ct, C_{ell-1}) block +
      bwdstats_{ell-1} (8, C_{ell-1}) accumulated;
      else: dx (ns*8, ct) block, rows s*8+c = dx[slot s, :, coord c].
    """
    i = pl.program_id(0)
    params = [tuple(refs[4 * l:4 * l + 4]) for l in range(ell)]
    k = 4 * ell
    mu_ref, isig_ref = refs[k], refs[k + 1]
    src_ref = refs[k + 2]
    bncoef_ref = refs[k + 3]
    k += 4
    if ell > 1:
        mu_p_ref, isig_p_ref = refs[k], refs[k + 1]
        k += 2
    dw_ref, db_ref = refs[k], refs[k + 1]
    k += 2

    ys, os_ = _prefix(x_ref, params, ell, ns, ct)
    w_l, b_l, a_l, c_l = params[-1]
    y_l = ys[-1]
    xhat = (y_l - mu_ref[0:1, :]) * isig_ref[0:1, :]
    z = y_l * a_l[...] + c_l[...]

    if top:
        h = os_[-1]
        pool, cnt = _pool_and_ties(h, ns, ct)
        do = _route_pool(h, pool, cnt, src_ref[...], ns, ct)
    else:
        do = src_ref[...].reshape(ns * ct, z.shape[-1]).astype(jnp.float32)

    m1 = bncoef_ref[0:1, :]
    m2 = bncoef_ref[1:2, :]
    ga_sig = bncoef_ref[2:3, :]
    dz = jnp.where(z > 0.0, do, 0.0)
    # mask PAD clusters: their dz is zero (zero dpool / zero propagated
    # cotangent) but the global BN-backward correction terms -m1 -xhat*m2
    # are not — without the mask pads would contaminate dW/db/dx
    dy = ga_sig * (dz - m1 - xhat * m2) * _row_mask(ns, ct, i, g_total)

    dw_upd = _mm_tn(os_[-2], dy)
    db_row = jnp.sum(dy, axis=0, keepdims=True)
    db_upd = jnp.concatenate(
        [db_row, jnp.zeros((7, dy.shape[-1]), jnp.float32)], axis=0)
    _accum(dw_ref, i, dw_upd)
    _accum(db_ref, i, db_upd)

    if ell > 1:
        do_out_ref, bst_ref = refs[k], refs[k + 1]
        do_prev = _mm_nt(dy, w_l[...])                   # (ns*ct, C_{l-1})
        do_prev_bf = do_prev.astype(cot_dtype)
        do_out_ref[...] = do_prev_bf.reshape(ns, ct, do_prev.shape[-1])

        w_p, b_p, a_p, c_p = params[-2]
        xhat_p = (ys[-2] - mu_p_ref[0:1, :]) * isig_p_ref[0:1, :]
        z_p = ys[-2] * a_p[...] + c_p[...]
        dz_p = jnp.where(z_p > 0.0, do_prev_bf.astype(jnp.float32), 0.0)
        s1 = jnp.sum(dz_p, axis=0, keepdims=True)
        s2 = jnp.sum(dz_p * xhat_p, axis=0, keepdims=True)
        upd = jnp.concatenate(
            [s1, s2, jnp.zeros((6, s1.shape[-1]), jnp.float32)], axis=0)
        _accum(bst_ref, i, upd)
    else:
        dx_ref = refs[k]
        # dx^T = W_1 @ dy^T, lane-dense (C_in, ns*ct)
        dxt = jax.lax.dot_general(
            w_l[...], dy, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        for s in range(ns):
            blk = dxt[:, s * ct:(s + 1) * ct]            # (C_in, ct)
            blk8 = jnp.concatenate(
                [blk, jnp.zeros((8 - cin, ct), jnp.float32)], axis=0)
            dx_ref[s * 8:(s + 1) * 8, :] = blk8


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------


def _finalize_stats(stats: Array, count: float, gamma: Array, beta: Array,
                    eps: float):
    """(8, C) sum/sumsq -> (mean, var, a, c, inv_sigma); z = y*a + c
    (y already includes the conv bias)."""
    s, q = stats[0], stats[1]
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


@partial(jax.jit, static_argnames=("widths", "ns", "g_total", "eps", "ct",
                                   "interpret"))
def _fwd_impl(x_sm: Array, flat_params: Tuple[Array, ...],
              widths: Tuple[int, ...], ns: int, g_total: int, eps: float,
              ct: int, interpret: bool):
    n_layers = len(widths)
    gp = x_sm.shape[1]
    tiles = gp // ct
    cin = x_sm.shape[2]
    count = float(ns * g_total)
    grid = (tiles,)
    x_spec = pl.BlockSpec((ns, ct, cin), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    cp = pltpu.CompilerParams(vmem_limit_bytes=_VMEM)

    folded, means, vars_, isigs = [], [], [], []
    for l in range(n_layers):
        w, b, g, be = flat_params[4 * l:4 * l + 4]
        prev_ops = _folded_ops(flat_params, folded, l)
        stats = pl.pallas_call(
            partial(_stats_kernel, n_prev=l, ns=ns, ct=ct, g_total=g_total),
            grid=grid,
            in_specs=[x_spec] + [vm] * (len(prev_ops) + 2),
            out_specs=pl.BlockSpec((8, widths[l]), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, widths[l]), jnp.float32),
            compiler_params=cp,
            interpret=interpret,
        )(x_sm, *prev_ops, w, _row(b))
        mean, var, a, c, isig = _finalize_stats(stats, count, g, be, eps)
        means.append(mean)
        vars_.append(var)
        isigs.append(isig)
        folded.append((a, c))

    all_ops = _folded_ops(flat_params, folded, n_layers)
    pooled = pl.pallas_call(
        partial(_final_kernel, n_layers=n_layers, ns=ns, ct=ct),
        grid=grid,
        in_specs=[x_spec] + [vm] * len(all_ops),
        out_specs=pl.BlockSpec((ct, widths[-1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gp, widths[-1]), jnp.float32),
        compiler_params=cp,
        interpret=interpret,
    )(x_sm, *all_ops)
    return pooled, means, vars_, folded, isigs


@partial(jax.jit, static_argnames=("widths", "ns", "g_total", "eps", "ct",
                                   "interpret", "cot_dtype"))
def _bwd_impl(x_sm, flat_params, dpooled, means, folded, isigs,
              widths: Tuple[int, ...], ns: int, g_total: int, eps: float,
              ct: int, interpret: bool, cot_dtype=jnp.bfloat16):
    n_layers = len(widths)
    gp = x_sm.shape[1]
    tiles = gp // ct
    cin = x_sm.shape[2]
    count = float(ns * g_total)
    grid = (tiles,)
    x_spec = pl.BlockSpec((ns, ct, cin), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    cp = pltpu.CompilerParams(vmem_limit_bytes=_VMEM)
    top = n_layers - 1

    dpool_spec = pl.BlockSpec((ct, widths[top]), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    all_ops = _folded_ops(flat_params, folded, n_layers)
    bst = pl.pallas_call(
        partial(_bwdstats_top_kernel, n_layers=n_layers, ns=ns, ct=ct),
        grid=grid,
        in_specs=[x_spec] + [vm] * (len(all_ops) + 2) + [dpool_spec],
        out_specs=pl.BlockSpec((8, widths[top]), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, widths[top]), jnp.float32),
        compiler_params=cp,
        interpret=interpret,
    )(x_sm, *all_ops, _row(means[top]), _row(isigs[top]), dpooled)

    dparams = [None] * n_layers
    do_src, do_spec = dpooled, dpool_spec
    dx_sm = None
    for l in range(n_layers - 1, -1, -1):
        w, b, g, be = flat_params[4 * l:4 * l + 4]
        m1 = bst[0] / count
        m2 = bst[1] / count
        bncoef = jnp.concatenate(
            [_row(m1), _row(m2), _row(g * isigs[l]),
             jnp.zeros((5, widths[l]), jnp.float32)], axis=0)

        ops = [x_sm] + _folded_ops(flat_params, folded, l + 1) + [
            _row(means[l]), _row(isigs[l]), do_src, bncoef]
        in_specs = [x_spec] + [vm] * (4 * (l + 1) + 2) + [do_spec, vm]
        if l > 0:
            ops += [_row(means[l - 1]), _row(isigs[l - 1])]
            in_specs += [vm, vm]

        c_prev = widths[l - 1] if l > 0 else cin
        out_shapes = [jax.ShapeDtypeStruct((c_prev, widths[l]), jnp.float32),
                      jax.ShapeDtypeStruct((8, widths[l]), jnp.float32)]
        out_specs = [pl.BlockSpec((c_prev, widths[l]), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((8, widths[l]), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)]
        if l > 0:
            out_shapes += [
                jax.ShapeDtypeStruct((ns, gp, widths[l - 1]), cot_dtype),
                jax.ShapeDtypeStruct((8, widths[l - 1]), jnp.float32)]
            out_specs += [
                pl.BlockSpec((ns, ct, widths[l - 1]), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, widths[l - 1]), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)]
        else:
            out_shapes.append(jax.ShapeDtypeStruct((ns * 8, gp),
                                                   jnp.float32))
            out_specs.append(pl.BlockSpec((ns * 8, ct), lambda i: (0, i),
                                          memory_space=pltpu.VMEM))

        outs = pl.pallas_call(
            partial(_bwd_kernel, ell=l + 1, ns=ns, ct=ct,
                    top=l == n_layers - 1, cin=cin, g_total=g_total,
                    cot_dtype=cot_dtype),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            compiler_params=cp,
            interpret=interpret,
        )(*ops)
        # dgamma = sum dz*xhat, dbeta = sum dz — free from the reductions
        dparams[l] = (outs[0], outs[1][0], bst[1], bst[0])
        if l > 0:
            do_src, bst = outs[2], outs[3]
            cl = widths[l - 1]
            do_spec = pl.BlockSpec((ns, ct, cl), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)
        else:
            dx_t = outs[2]                                # (ns*8, gp)
            dx_sm = dx_t.reshape(ns, 8, gp)[:, :cin, :].transpose(0, 2, 1)

    dflat = []
    for l in range(n_layers):
        dflat += list(dparams[l])
    return dx_sm, tuple(dflat)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def convbn_maxpool_fused(x_sm: Array, flat_params: Tuple[Array, ...],
                         widths: Tuple[int, ...], ns: int, g_total: int,
                         eps: float = 1e-3, ct: int = 128,
                         interpret: bool = False,
                         cot_dtype=jnp.bfloat16):
    """Fused training-mode ConvBN tower + slot max-pool.

    x_sm: (ns, Gp, C_in) slot-major grouped offsets, Gp % ct == 0
    (pad clusters masked out of every statistic; their pooled rows are
    garbage — slice to g_total).
    flat_params: per layer (W (Cin,Cout), b, gamma, beta), flat tuple.

    Returns (pooled (Gp, C_L), (batch_means, batch_vars) per layer for
    the EMA batch_stats update). The loss differentiates through the
    batch moments (flax BatchNorm training semantics); the stats outputs
    themselves are non-differentiable (EMA updates are stop-grad).
    """
    pooled, means, vars_, _, _ = _fwd_impl(
        x_sm, flat_params, widths, ns, g_total, eps, ct, interpret)
    return pooled, (tuple(means), tuple(vars_))


def _vjp_fwd(x_sm, flat_params, widths, ns, g_total, eps, ct, interpret,
             cot_dtype):
    pooled, means, vars_, folded, isigs = _fwd_impl(
        x_sm, flat_params, widths, ns, g_total, eps, ct, interpret)
    res = (x_sm, flat_params, tuple(means), tuple(folded), tuple(isigs))
    return (pooled, (tuple(means), tuple(vars_))), res


def _vjp_bwd(widths, ns, g_total, eps, ct, interpret, cot_dtype, res,
             cts):
    x_sm, flat_params, means, folded, isigs = res
    dpooled, _ = cts
    dx_sm, dflat = _bwd_impl(
        x_sm, flat_params, dpooled, list(means), list(folded), list(isigs),
        widths, ns, g_total, eps, ct, interpret, cot_dtype)
    return dx_sm, dflat


convbn_maxpool_fused.defvjp(_vjp_fwd, _vjp_bwd)


def reference_convbn_maxpool(x_sm: Array, flat_params, widths, ns: int,
                             g_total: int, eps: float = 1e-3):
    """Pure-jnp reference (flax-equivalent math) for tests: slot-major
    (ns, G, C_in) -> (pooled (G, C_L), (means, vars))."""
    h = x_sm[:, :g_total, :]
    means, vars_ = [], []
    for l in range(len(widths)):
        w, b, g, be = flat_params[4 * l:4 * l + 4]
        y = jnp.einsum("sgc,cd->sgd", h, w) + b
        mean = jnp.mean(y, axis=(0, 1))
        var = jnp.mean(jnp.square(y), axis=(0, 1)) - jnp.square(mean)
        xhat = (y - mean) * jax.lax.rsqrt(var + eps)
        h = jax.nn.relu(g * xhat + be)
        means.append(mean)
        vars_.append(var)
    return jnp.max(h, axis=0), (tuple(means), tuple(vars_))
