"""Batched fused ball query for training shapes (Pallas).

An alternative to the dense ball query (ops/neighborhoods.py) for the
training shapes (18 clouds × 4096 pts × 512 centers × ns 64) that runs
the whole selection in VMEM instead of the XLA counting formulation's
(B·M, N, ns) broadcast. Standalone it is slightly faster than the dense
op (9.1 vs 10.2 ms chained, r3 v5e); INSIDE the fused train step it is
slightly slower (see use_fused_ball_query) because XLA fuses the counting
compare-reduce into the step well — so it is opt-in. Kept on-chip-gated
(scripts/verify_on_chip.py) as the building block for shapes where VMEM
residency wins:

  1. distances (N, tc) per center-tile — the whole cloud stays resident;
  2. the reference's "first nsample in index order" selection
     (tf_grouping_g.cu:3-52) is a PREFIX RANK over the in-ball mask in
     original index order: pos[n] = #in-ball among points 0..n. Computed
     chunk-wise with lower-triangular-ones matmuls (MXU) and a running
     per-center fill count — no sort, no Morton, exact by construction;
  3. slot routing rides the MXU: for a chunk of slots, the one-hot columns
     P[n, s·tc+c] = (pos[n, c] == s+1) are lane-concatenated into one
     (N, SC·tc) matrix and contracted against [x|y|z|index] rows in a
     single (4, N) @ (N, SC·tc) matmul.

Everything is strictly 2-D inside the kernel (Mosaic unrolls >2-D
elementwise ops over every leading dim — see ops/hash_grid.py).

The public wrapper returns (idx, cnt) with the exact ops.ball_query
contract (first-ns by index, repeat-pad first in-ball, per-center nearest
fallback for empty balls via the chunked helper), so callers keep the
differentiable `group_points` gather for coordinates — gradients w.r.t.
the cloud flow exactly as on the dense path.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from feat3dnet_tpu.ops.hash_grid import _FAR_CENTER, _nearest_valid_chunked

Array = jax.Array

_LC = 512     # prefix-rank chunk rows (tri-ones matmul size)
_SC = 8       # slots routed per MXU matmul


def _bq_batch_kernel(pts_ref, ptsT_ref, ctrT_ref, out_ref,
                     *, r2: float, n: int, tc: int, ns: int):
    pts = pts_ref[0]                                     # (N, 4)
    ptsT = ptsT_ref[0]                                   # (8, N): x|y|z|idx|0…
    ctrT = ctrT_ref[0]                                   # (8, tc)

    d2 = jnp.zeros((n, tc), jnp.float32)
    for d in range(3):
        dd = pts[:, d:d + 1] - ctrT[d:d + 1, :]          # (N, tc)
        d2 = d2 + dd * dd
    ib = (d2 < r2).astype(jnp.float32)                   # (N, tc)

    # inclusive prefix count down the (sublane) point axis, chunked
    lc = min(_LC, n)
    tri = (jax.lax.broadcasted_iota(jnp.int32, (lc, lc), 0)
           >= jax.lax.broadcasted_iota(jnp.int32, (lc, lc), 1)
           ).astype(jnp.float32)                         # tri[i, j] = j <= i
    fill = jnp.zeros((1, tc), jnp.float32)
    pos_chunks = []
    for k in range(n // lc):
        chunk = ib[k * lc:(k + 1) * lc]                  # (lc, tc)
        csum = jnp.dot(tri, chunk, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        pos_chunks.append((csum + fill) * chunk)         # 0 off-ball
        fill = fill + csum[lc - 1:lc, :]
    pos = jnp.concatenate(pos_chunks, axis=0)            # (N, tc)
    # row 4 (the first zero row of ptsT), slot-0 columns, carries the
    # per-center count — Mosaic wants >= 8 payload rows anyway
    out_ref[0, 4:5, 0:tc] = fill

    # slot routing: SC slots per (8, N) @ (N, SC·tc) matmul
    for s0 in range(0, ns, _SC):
        sc = min(_SC, ns - s0)
        cols = [(jnp.abs(pos - (s0 + q + 1.0)) < 0.5).astype(jnp.float32)
                for q in range(sc)]
        p_mat = jnp.concatenate(cols, axis=1) if sc > 1 else cols[0]
        out_chunk = jnp.dot(ptsT[:4], p_mat,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)  # (4, sc·tc)
        out_ref[0, 0:4, s0 * tc:(s0 + sc) * tc] = out_chunk


@partial(jax.jit, static_argnames=("radius", "nsample", "tile", "interpret"))
def _bq_batch_raw(xyz: Array, centers: Array, radius: float, nsample: int,
                  tile: int = 128, interpret: Optional[bool] = None
                  ) -> Tuple[Array, Array]:
    """(B, N, 3) clouds + (B, M, 3) centers -> (key (B, M, ns) f32 original
    indices (0 where the slot is unfilled), cnt (B, M) f32 true counts)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, _ = xyz.shape
    m = centers.shape[1]
    tc = tile
    ns = nsample
    pad_n = -n % min(_LC, max(n, 8))
    np_ = n + pad_n
    pad_m = -m % tc
    mp = m + pad_m
    tiles = mp // tc
    r2 = float(radius) ** 2

    x = jnp.pad(xyz.astype(jnp.float32), ((0, 0), (0, pad_n), (0, 0)),
                constant_values=2.0 * _FAR_CENTER)   # pads never in-ball
    iota = jnp.broadcast_to(
        jnp.arange(np_, dtype=jnp.float32)[None, :, None], (b, np_, 1))
    pts = jnp.concatenate([x, iota], axis=2)             # (B, Np, 4)
    # row payloads padded to 8 (Mosaic block constraint: the second-to-last
    # block dim must be divisible by 8 or equal the array dim)
    ptsT = jnp.concatenate(
        [jnp.swapaxes(pts, 1, 2),
         jnp.zeros((b, 4, np_), jnp.float32)], axis=1)   # (B, 8, Np)
    c = jnp.pad(centers.astype(jnp.float32), ((0, 0), (0, pad_m), (0, 0)),
                constant_values=_FAR_CENTER)
    ctrT = jnp.concatenate(
        [jnp.swapaxes(c, 1, 2),
         jnp.zeros((b, 5, mp), jnp.float32)], axis=1)    # (B, 8, Mp)

    out = pl.pallas_call(
        partial(_bq_batch_kernel, r2=r2, n=np_, tc=tc, ns=ns),
        grid=(b, tiles),
        in_specs=[
            pl.BlockSpec((1, np_, 4), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, np_), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tc), lambda bi, i: (bi, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, ns * tc), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 8 * tiles, ns * tc), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pts, ptsT, ctrT)

    # (B, 8·tiles, ns·tc): row-block i holds [x|y|z|idx|cnt|0…], columns
    # s·tc+c. Only the idx channel and the count row are consumed (coords
    # are re-gathered by callers through the differentiable group_points);
    # keep the layout shuffle in XLA where reshapes are free.
    blocks = out.reshape(b, tiles, 8, ns, tc)
    key = jnp.swapaxes(blocks[:, :, 3], 2, 3).reshape(b, mp, ns)[:, :m]
    cnt = blocks[:, :, 4, 0, :].reshape(b, mp)[:, :m]
    return key, cnt


def ball_query_fused(
    xyz: Array, centers: Array, radius: float, nsample: int,
    tile: int = 128, interpret: Optional[bool] = None,
) -> Tuple[Array, Array]:
    """Drop-in ops.ball_query for batched training shapes (no valid_mask,
    scalar radius): (idx (B, M, ns) int32, cnt (B, M) int32), index-exact
    vs the reference CUDA semantics (repeat-pad + nearest fallback)."""
    b, m = centers.shape[:2]
    ns = nsample
    key, cnt_raw = _bq_batch_raw(xyz, centers, float(radius), nsample,
                                 tile=tile, interpret=interpret)
    cnt = jnp.minimum(cnt_raw, ns).astype(jnp.int32)     # reference pts_cnt
    slot = jnp.arange(ns, dtype=jnp.int32)
    filled = slot[None, None, :] < cnt[..., None]        # (B, M, ns)
    idx = jnp.where(filled, key, key[..., 0:1])          # repeat-pad first
    idx = idx.astype(jnp.int32)

    # per-center nearest fallback for empty balls, compiled as a cond so it
    # costs nothing when every ball is non-empty (always true when centers
    # are cloud points, e.g. FPS output)
    need = jnp.any(cnt == 0)

    def with_fallback(idx):
        nearest = jax.vmap(lambda cc, xx: _nearest_valid_chunked(cc, xx)
                           )(centers, xyz).astype(jnp.int32)   # (B, M)
        return jnp.where((cnt == 0)[..., None], nearest[..., None], idx)

    idx = jax.lax.cond(need, with_fallback, lambda i: i, idx)
    return idx, cnt


import os as _os

# MEASURED NEGATIVE in-step (benchmarks/bench_step_matrix.py, r3 v5e):
# with the routing matmuls at the exactness-mandatory HIGHEST precision,
# the full train step runs 29.3 ms fused vs 27.2 ms dense (f32) and
# 20.3 vs 18.7 ms (bf16 towers) — XLA fuses the dense counting
# formulation into the step better than the r2 12.7-ms standalone
# attribution suggested (standalone: dense 10.2 ms, fused 9.1 ms, but
# towers fwd+bwd alone are 20.6 ms — see probe_train_breakdown.py).
# The kernel stays available (index-exact, on-chip-gated) for shapes
# where it wins; opt in with F3D_FUSED_BQ=1.
_FUSED_BQ_ENABLED = _os.environ.get("F3D_FUSED_BQ", "0") == "1"


def use_fused_ball_query(xyz: Array, centers: Array, radius, nsample: int,
                         valid_mask) -> bool:
    """Static dispatch test for the fused kernel (mirrors ops/fps.py:55-63):
    opt-in (see _FUSED_BQ_ENABLED), TPU backend, no mask, scalar radius,
    shapes inside the VMEM budget (cloud + (N, tc) intermediates + the
    (N, SC·tc) routing matrix)."""
    return (_FUSED_BQ_ENABLED
            and jax.default_backend() == "tpu"
            and valid_mask is None
            and not hasattr(radius, "ndim")
            and xyz.ndim == 3
            and xyz.shape[1] <= 8192     # (N, SC·tc) routing matrix ≤ 32 MB
            and centers.shape[1] >= 128
            and nsample <= 128)
