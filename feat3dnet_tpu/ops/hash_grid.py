"""Spatially-pruned exact ball query + group (Pallas).

The dense ball query (ops/neighborhoods.py) is VPU-bound at O(M·N·ns)
compare work — 2.3 s for the attention pass over a 131k-point submap. This
module cuts the work by spatial locality while staying INDEX-EXACT vs the
reference CUDA semantics (tf_grouping_g.cu:3-52: per center, the nsample
in-ball points with the smallest ORIGINAL indices — which is what "first
nsample in scan order" selects — repeat-pad with the first in-ball index,
per-center nearest fallback for empty balls):

  1. sort points by the Morton code of their grid cell (cell = radius), so
     blocks of L consecutive points are compact spatial bricks; within each
     block, re-sort by original index (so in-block candidate order is
     original-index order);
  2. a Pallas kernel streams point-blocks per center-tile with an exact
     per-(tile, block) bounding-box distance cull — work only happens where
     geometry allows neighbors;
  3. per center, a running merge buffer holds the ns smallest in-ball
     ORIGINAL indices (+ coords) seen so far; each surviving block is
     merged via rank arithmetic (ascending-key merge: positions computed
     with two broadcast compares and an in-block prefix count) — one-hot
     placement matmuls ride the MXU. No capacity caps: the buffer is
     always the true running top-ns, so saturated balls (cnt > ns — 83% of
     real Oxford/KITTI balls) stay exact.

The Morton cell size does not affect correctness (the bbox cull is exact
geometry); it only tunes block compactness. Invalid points are moved to
+1e9 so they sort to the tail, their blocks' bboxes cull away, and their
distances can never pass the radius test.

Centers must arrive spatially ordered for the culling to pay (sort them
with `sort_centers`, or reuse the cloud's own order — the attention pass
uses centers == sorted points). Outputs are in the given center order.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_FAR = 1.0e9          # coordinate sentinel for invalid points
# invalid-CENTER sentinel: must differ from the invalid-POINT sentinel, or
# a masked center sits at distance 0 from every pad/invalid point and its
# ball "fills" with them (1e9 apart -> d2 = 1e18, never inside any radius)
_FAR_CENTER = 2.0e9
# empty-slot key sentinel: finite (inf would make the one-hot placement
# matmuls produce inf*0 = nan), far above any original index (< 2^24)
_BIG = 1.0e30


def _morton30(c: Array) -> Array:
    """Interleave three 10-bit ints (N, 3) -> 30-bit Morton codes (N,)."""

    def spread(x):
        x = x.astype(jnp.uint32)
        x = (x | (x << 16)) & jnp.uint32(0x030000FF)
        x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249249)
        return x

    return (spread(c[:, 0]) | (spread(c[:, 1]) << 1)
            | (spread(c[:, 2]) << 2)).astype(jnp.int32)


@dataclasses.dataclass
class SortedCloud:
    """Morton-block layout of one cloud (all arrays static-shaped)."""

    pts4: Array       # (Np, 4) f32: xyz (invalid -> 1e9) | original index
    blk_bbox: Array   # (NB, 8) f32: min xyz | max xyz | pad
    orig_idx: Array   # (Np,) int32 original index per sorted position
    inv_perm: Array   # (N,) int32: sorted position of each original point
    block_size: int


def build_sorted_cloud(xyz: Array, valid_mask: Optional[Array] = None,
                       cell_size: float = 2.0, block_size: int = 256
                       ) -> SortedCloud:
    """Morton-sort one (N, 3) cloud into culling blocks (jit-safe)."""
    n = xyz.shape[0]
    L = block_size
    if valid_mask is None:
        valid_mask = jnp.ones((n,), bool)
    # non-finite coords (unsanitized sensor dropout) are treated as
    # invalid — keeps all three builder implementations (device, numpy,
    # native) bit-identical where NaN comparison semantics would diverge
    valid_mask = valid_mask & jnp.all(jnp.isfinite(xyz), axis=-1)
    pts = jnp.where(valid_mask[:, None], xyz.astype(jnp.float32), _FAR)

    finite_min = jnp.min(jnp.where(valid_mask[:, None], pts, _FAR), axis=0)
    cell = jnp.clip(((pts - finite_min) / cell_size), 0, 1023).astype(jnp.int32)
    key = _morton30(cell)
    # invalid points past every real code (Morton < 2^30)
    key = jnp.where(valid_mask, key, jnp.int32(1 << 30))

    order1 = jnp.argsort(key, stable=True).astype(jnp.int32)      # (N,)
    pad = -n % L
    order1 = jnp.pad(order1, (0, pad))                            # pad dups of slot 0
    np_ = n + pad
    # within-block re-sort by ORIGINAL index so in-block candidate order is
    # original-index order (padded tail slots index point 0 but are pushed
    # last within their block by the +n offset and masked via coords below).
    # lexsort instead of a blk*2np_+idx combined key: the combined key
    # overflows int32 past ~524k points (x64 is disabled, so the int64 the
    # numpy mirror uses silently truncates here).
    blk = jnp.arange(np_, dtype=jnp.int32) // L
    pad_flag = jnp.arange(np_, dtype=jnp.int32) >= n
    sub = order1 + jnp.where(pad_flag, jnp.int32(np_), 0)
    order2 = jnp.lexsort((sub, blk)).astype(jnp.int32)
    final_orig = order1[order2]                                   # (Np,)
    sorted_pts = pts[final_orig]                                  # (Np, 3)
    pad2 = pad_flag[order2]
    sorted_pts = jnp.where(pad2[:, None], _FAR, sorted_pts)

    # pad rows would alias original index 0 in the key channel; give them
    # UNIQUE sentinel keys n..np_-1 instead — the merge kernels' rank
    # arithmetic assumes globally unique keys, and duplicate keys make the
    # two merge formulations resolve collisions differently on the
    # (masked-out) invalid-center rows, breaking bitwise A/B tests
    key_chan = jnp.where(pad2, n - 1 + jnp.cumsum(pad2.astype(jnp.int32)),
                         final_orig).astype(jnp.float32)
    pts4 = jnp.concatenate([sorted_pts, key_chan[:, None]], axis=1)

    bmin = jnp.min(sorted_pts.reshape(-1, L, 3), axis=1)
    bmax = jnp.max(sorted_pts.reshape(-1, L, 3), axis=1)
    blk_bbox = jnp.concatenate(
        [bmin, bmax, jnp.zeros((bmin.shape[0], 2), jnp.float32)], axis=1)

    # pad slots alias original index 0 — scatter them to a dummy slot so
    # they cannot clobber inv_perm[0]
    scatter_tgt = jnp.where(pad_flag[order2], jnp.int32(np_), final_orig)
    inv_perm = jnp.zeros((np_ + 1,), jnp.int32).at[scatter_tgt].set(
        jnp.arange(np_, dtype=jnp.int32))[:n]
    return SortedCloud(pts4=pts4, blk_bbox=blk_bbox,
                       orig_idx=final_orig, inv_perm=inv_perm, block_size=L)


def estimate_ball_points(xyz, radius: float) -> float:
    """Host-side density proxy for layout auto-tuning: estimated points
    inside a radius-`radius` ball around a typical point = mean points per
    occupied radius-sized grid cell × (ball volume / cell volume) = 4π/3.

    Measured on the bundled real clouds at radius 2.0 (r3): oxford 16k
    ≈ 92, kitti 29k ≈ 101 (balls saturate at nsample=64 → the 128-pt
    block layout wins −12 %), synthetic 120k submap ≈ 40 (unsaturated →
    256 stays optimal). O(N) numpy + one unique-sort — microseconds next
    to the Morton prep itself."""
    import numpy as np

    xyz = np.asarray(xyz, np.float32)
    finite = np.isfinite(xyz).all(axis=1)
    pts = xyz[finite]
    if pts.shape[0] == 0:
        return 0.0
    cells = np.floor(pts / np.float32(radius)).astype(np.int64)
    key = ((cells[:, 0] * 73856093) ^ (cells[:, 1] * 19349663)
           ^ (cells[:, 2] * 83492791))
    return float(pts.shape[0] / np.unique(key).size * (4.0 * np.pi / 3.0))


def build_sorted_cloud_host(xyz, valid_mask=None, cell_size: float = 2.0,
                            block_size: int = 256,
                            use_native: bool = True) -> SortedCloud:
    """Numpy/native mirror of build_sorted_cloud for host-resident clouds.

    The XLA bitonic sort at >=16k points compiles for tens of minutes on
    the remote TPU compile service; a host sort is microseconds and the
    cloud is on the host anyway at pipeline entry. Produces bit-identical
    layout to the device version (same IEEE ops, both sorts stable) —
    asserted by tests/test_hash_bq.py.

    use_native: prefer the C++ sort+pack (native/morton_pack.cpp) — the
    same layout bit-for-bit (tests/test_native_morton.py), but it releases
    the GIL so extract_many's prep threads scale. Falls back to numpy when
    the library is unavailable."""
    import numpy as np

    if use_native:
        from feat3dnet_tpu.utils.native import morton_pack

        packed = morton_pack(np.asarray(xyz, np.float32), valid_mask,
                             float(cell_size), block_size)
        if packed is not None:
            pts4, blk_bbox, inv_perm = packed
            # pad rows carry unique key sentinels >= n in the key channel;
            # orig_idx mirrors the numpy path's safe-index convention
            # (pad rows alias point 0)
            orig_idx = pts4[:, 3].astype(np.int32)
            orig_idx[orig_idx >= xyz.shape[0]] = 0
            return SortedCloud(pts4=pts4, blk_bbox=blk_bbox,
                               orig_idx=orig_idx,
                               inv_perm=inv_perm, block_size=block_size)

    xyz = np.asarray(xyz, np.float32)
    n = xyz.shape[0]
    L = block_size
    if valid_mask is None:
        valid_mask = np.ones((n,), bool)
    valid_mask = np.asarray(valid_mask, bool) & np.isfinite(xyz).all(axis=1)
    pts = np.where(valid_mask[:, None], xyz, np.float32(_FAR))

    finite_min = np.min(np.where(valid_mask[:, None], pts, np.float32(_FAR)), axis=0)
    cell = np.clip((pts - finite_min) / np.float32(cell_size), 0, 1023).astype(np.int32)

    def spread(x):
        x = x.astype(np.uint32)
        x = (x | (x << 16)) & np.uint32(0x030000FF)
        x = (x | (x << 8)) & np.uint32(0x0300F00F)
        x = (x | (x << 4)) & np.uint32(0x030C30C3)
        x = (x | (x << 2)) & np.uint32(0x09249249)
        return x

    key = (spread(cell[:, 0]) | (spread(cell[:, 1]) << np.uint32(1))
           | (spread(cell[:, 2]) << np.uint32(2))).astype(np.int64)
    key[~valid_mask] = 1 << 30

    order1 = np.argsort(key, kind="stable").astype(np.int32)
    pad = -n % L
    order1 = np.pad(order1, (0, pad))
    np_ = n + pad
    blk = np.arange(np_, dtype=np.int64) // L
    pad_flag = np.arange(np_) >= n
    key2 = blk * (2 * np_) + order1 + np.where(pad_flag, np_, 0)
    order2 = np.argsort(key2, kind="stable")
    final_orig = order1[order2]
    sorted_pts = pts[final_orig]
    pad2 = pad_flag[order2]
    sorted_pts[pad2] = np.float32(_FAR)

    key_chan = final_orig.astype(np.float32)
    key_chan[pad2] = n + np.arange(pad2.sum(), dtype=np.float32)
    pts4 = np.concatenate([sorted_pts, key_chan[:, None]], axis=1)
    bmin = sorted_pts.reshape(-1, L, 3).min(axis=1)
    bmax = sorted_pts.reshape(-1, L, 3).max(axis=1)
    blk_bbox = np.concatenate(
        [bmin, bmax, np.zeros((bmin.shape[0], 2), np.float32)], axis=1)

    inv_perm = np.zeros((np_,), np.int32)
    real = ~pad_flag[order2]
    inv_perm[final_orig[real]] = np.arange(np_, dtype=np.int32)[real]
    return SortedCloud(pts4=pts4, blk_bbox=blk_bbox,
                       orig_idx=final_orig.astype(np.int32),
                       inv_perm=inv_perm[:n], block_size=L)


def _tile_bbox(centers: Array, tile: int) -> Array:
    """(Mp, 3) -> (Mp/T, 8) per-tile bounding boxes."""
    c = centers.reshape(-1, tile, 3)
    return jnp.concatenate(
        [jnp.min(c, axis=1), jnp.max(c, axis=1),
         jnp.zeros((c.shape[0], 2), jnp.float32)], axis=1)


def _block_hitmask(tbox: Array, blk_bbox: Array, r2: float,
                   block_mask: Optional[Array] = None) -> Array:
    """Exact bbox-to-bbox gap test, vectorized in XLA, bit-packed for SMEM.

    tbox: (Ti, 8) center-tile bboxes; blk_bbox: (NB, 8) point-block bboxes.
    Returns (Ti, ceil(NB/32)) int32 bitmask — bit j of word j//32 says block
    j's bbox comes within `sqrt(r2)` of the tile's bbox.

    block_mask: optional (Ti, NB) bool ANDed into the hit test. Batched
    multi-cloud extraction packs several clouds into one sorted layout
    with cloud-pure tiles/blocks and passes tile_cloud==block_cloud here,
    which isolates the clouds exactly WITHOUT shifting coordinates
    (shifts would perturb the f32 offsets and break bit-parity with the
    per-cloud extraction).
    """
    nb = blk_bbox.shape[0]
    tiles = tbox.shape[0]
    lo = blk_bbox[None, :, :3] - tbox[:, None, 3:6]          # (Ti, NB, 3)
    hi = tbox[:, None, :3] - blk_bbox[None, :, 3:6]
    gap = jnp.maximum(jnp.maximum(lo, hi), 0.0)
    hit = jnp.sum(gap * gap, axis=-1) < r2                   # (Ti, NB)
    if block_mask is not None:
        hit = hit & block_mask
    nbw = -(-nb // 32)
    hit_p = jnp.pad(hit, ((0, 0), (0, nbw * 32 - nb)))
    bits = jnp.left_shift(jnp.int32(1), jnp.arange(32, dtype=jnp.int32))
    return jnp.sum(
        hit_p.reshape(tiles, nbw, 32).astype(jnp.int32) * bits[None, None, :],
        axis=-1).astype(jnp.int32)                           # (Ti, NBW)


# NOTE (recorded negative): restricting each tile's in-kernel block loop
# to its per-tile [first-hit, last-hit) range (computed like
# _block_hitmask; would cut loop iterations ~4.5× at 120k) requires
# DYNAMIC fori_loop bounds from SMEM — Mosaic's while-loop lowering of a
# dynamic-bound fori made the remote compile exceed 9+ minutes (static
# 0..nb bounds compile in ~7 s). Static bounds + per-iteration bit test
# are the shipped form.


def _init_merge_buffers(topx_ref, topy_ref, topz_ref, topk_ref, cnt_ref,
                        tc: int, ns: int):
    topx_ref[...] = jnp.zeros((tc, ns), jnp.float32)
    topy_ref[...] = jnp.zeros((tc, ns), jnp.float32)
    topz_ref[...] = jnp.zeros((tc, ns), jnp.float32)
    topk_ref[...] = jnp.full((tc, ns), _BIG, jnp.float32)
    cnt_ref[...] = jnp.zeros((tc, 1), jnp.float32)


def _bq_kernel(hit_ref, ctr_ref, ptsT_ref,
               topx_ref, topy_ref, topz_ref, topk_ref, cnt_ref,
               *, r2: float, tc: int, L: int, ns: int):
    """Running exact top-ns merge, restricted to strictly-2D vector ops.

    Mosaic unrolls >2-D elementwise ops over every leading dim; the first
    formulation of this merge (rank one-hots materialized as (TC, ns, L) /
    (TC, ns, ns', 4) tensors) produced IR so large the compile never
    finished (>40 min, shape-independent). This version keeps every
    intermediate (TC, L) or (TC, ns) and expresses the per-slot one-hot
    routing as ns-iteration loops of broadcast compare+FMA — a few hundred
    small 2-D ops, which Mosaic compiles in seconds. The in-block candidate
    rank still rides the MXU via the triangular-ones matmul.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        _init_merge_buffers(topx_ref, topy_ref, topz_ref, topk_ref, cnt_ref,
                            tc, ns)

    # bbox cull decision, precomputed in XLA and bit-packed (SMEM scalar)
    word = hit_ref[i, j // 32]
    hit = ((word >> (j % 32)) & 1) == 1

    @pl.when(hit)
    def _process():
        _merge_block(ctr_ref, ptsT_ref, topx_ref, topy_ref, topz_ref,
                     topk_ref, cnt_ref, r2=r2, tc=tc, L=L, ns=ns)


def _merge_block(ctr_ref, ptsT_ref, topx_ref, topy_ref, topz_ref,
                 topk_ref, cnt_ref, *, r2: float, tc: int, L: int, ns: int):
    """One (center-tile × point-block) step of the running exact merge."""
    ptsT = ptsT_ref[...]                                 # (4, L) rows x|y|z|orig
    ctr = ctr_ref[...]                                   # (TC, 4)
    d2 = jnp.zeros((tc, L), jnp.float32)
    for d in range(3):
        dd = ctr[:, d:d + 1] - ptsT[d:d + 1, :]
        d2 = d2 + dd * dd
    in_ball = d2 < r2                                    # (TC, L)
    korig = ptsT[3:4, :]                                 # (1, L) ascending
    key = jnp.where(in_ball, korig, _BIG)                # (TC, L)
    # Exact whole-block skip: a candidate can only enter center t's
    # buffer if its key beats the buffer's worst entry (topk[:, -1] is
    # _BIG while unfilled, so unfilled buffers always accept). As
    # buffers saturate with small original indices, later Morton
    # blocks (uniformly distributed keys) skip their entire merge.
    worst = topk_ref[:, ns - 1:ns]                       # (TC, 1)
    can_add = jnp.min(key, axis=1, keepdims=True) < worst

    @pl.when(jnp.any(can_add))
    def _merge():
        ib = in_ball.astype(jnp.float32)
        # in-block rank among candidates: inclusive prefix count (MXU)
        tri = (jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
               <= jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
               ).astype(jnp.float32)
        # HIGHEST precision: default TPU matmul precision is bf16, whose
        # 8-bit significand corrupts integer counts above 256 (hash_block
        # may be 512) — found on-chip via the batch_group idx mismatch
        rank_b = jnp.dot(ib, tri, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)

        topx = topx_ref[...]
        topy = topy_ref[...]
        topz = topz_ref[...]
        topk = topk_ref[...]                             # (TC, ns) ascending

        # merged 1-based position of candidate l: #buffer keys smaller
        # + in-block rank (keys are unique original indices)
        smaller_top = jnp.zeros((tc, L), jnp.float32)
        for s in range(ns):
            smaller_top = smaller_top + (
                topk[:, s:s + 1] < key).astype(jnp.float32)
        pos_b = jnp.where(in_ball, smaller_top + rank_b, 0.0)  # (TC, L)

        # route candidates into their merged slots (slots are 1-based;
        # pos 0 = not in ball, pos > ns = past the buffer -> dropped)
        ax, ay, az, ak = [], [], [], []
        for sp in range(ns):
            m = (jnp.abs(pos_b - (sp + 1.0)) < 0.5).astype(jnp.float32)
            ax.append(jnp.sum(m * ptsT[0:1, :], axis=1, keepdims=True))
            ay.append(jnp.sum(m * ptsT[1:2, :], axis=1, keepdims=True))
            az.append(jnp.sum(m * ptsT[2:3, :], axis=1, keepdims=True))
            ak.append(jnp.sum(m * korig, axis=1, keepdims=True))
        addx = jnp.concatenate(ax, axis=1)               # (TC, ns)
        addy = jnp.concatenate(ay, axis=1)
        addz = jnp.concatenate(az, axis=1)
        addk = jnp.concatenate(ak, axis=1)

        # merged 1-based position of buffer entry s: s+1 + #cands with a
        # smaller key. Buffer keys ascend, so that count equals
        # #{in-ball l: smaller_top[l] <= s} (sentinel slots included:
        # smaller_top <= fill <= s always holds there).
        sc_cols = []
        for s in range(ns):
            below = ib * (smaller_top < s + 0.5).astype(jnp.float32)
            sc_cols.append(jnp.sum(below, axis=1, keepdims=True))
        smaller_cand = jnp.concatenate(sc_cols, axis=1)  # (TC, ns)
        slot_iota = jax.lax.broadcasted_iota(
            jnp.int32, (tc, ns), 1).astype(jnp.float32)
        pos_t = slot_iota + 1.0 + smaller_cand           # (TC, ns)

        # route surviving buffer entries to their shifted slots
        keptx = jnp.zeros((tc, ns), jnp.float32)
        kepty = jnp.zeros((tc, ns), jnp.float32)
        keptz = jnp.zeros((tc, ns), jnp.float32)
        keptk = jnp.zeros((tc, ns), jnp.float32)
        for s in range(ns):
            m = (jnp.abs(pos_t[:, s:s + 1] - (slot_iota + 1.0)) < 0.5
                 ).astype(jnp.float32)                   # (TC, ns)
            keptx = keptx + topx[:, s:s + 1] * m
            kepty = kepty + topy[:, s:s + 1] * m
            keptz = keptz + topz[:, s:s + 1] * m
            keptk = keptk + topk[:, s:s + 1] * m

        cnt_new = cnt_ref[...] + jnp.sum(ib, axis=1, keepdims=True)
        # slots past the merged fill level received no one-hot hit and
        # read 0 — restore the sentinel on their key channel
        filled = slot_iota < jnp.minimum(cnt_new, float(ns))   # (TC, ns)
        topx_ref[...] = keptx + addx
        topy_ref[...] = kepty + addy
        topz_ref[...] = keptz + addz
        topk_ref[...] = jnp.where(filled, keptk + addk, _BIG)
        cnt_ref[...] = cnt_new


# ---------------------------------------------------------------------------
# Transposed merge (round 3): the original _merge_block pays ~ns·15 VPU
# element-ops per (center, candidate) pair in its three routing loops
# (VERDICT r2 weak #3). This formulation works in (L, tc) orientation so
# the expensive candidate routing rides the MXU:
#   * candidate slot routing: one-hot columns P[l, s·tc+c] = (pos[l,c]==s+1)
#     are lane-concatenated and contracted against [x|y|z|idx|1|0…] rows in
#     ONE (8, L) @ (L, SC·tc) matmul per slot chunk — the appended ones row
#     yields each slot's occupancy for free (payload rows are padded to 8
#     for the Mosaic block rule anyway);
#   * surviving buffer entries: entry s moves to the (s+1)-th UNOCCUPIED
#     merged slot — a running prefix over (1 − occupancy) via a
#     triangular-ones matmul, replacing the per-slot counting loop. The
#     sentinel (_BIG) keys ride the same routing and land past the fill
#     level automatically, so no sentinel-restore pass is needed.
# Remaining per-candidate VPU work: the distance test and the buffer-rank
# compare (smaller_top), both a single (L, tc) op per buffer slot.
# ---------------------------------------------------------------------------


def _init_merge_buffers_t(topx_ref, topy_ref, topz_ref, topk_ref, cnt_ref,
                          tc: int, ns: int):
    topx_ref[...] = jnp.zeros((ns, tc), jnp.float32)
    topy_ref[...] = jnp.zeros((ns, tc), jnp.float32)
    topz_ref[...] = jnp.zeros((ns, tc), jnp.float32)
    topk_ref[...] = jnp.full((ns, tc), _BIG, jnp.float32)
    cnt_ref[...] = jnp.zeros((8, tc), jnp.float32)


_MERGE_SC = 8   # slots routed per MXU matmul


def _merge_block_t(ctrT, pts, ptsT,
                   topx_ref, topy_ref, topz_ref, topk_ref, cnt_ref,
                   addx_ref, addy_ref, addz_ref, addk_ref, occ_ref, st_ref,
                   *, r2: float, tc: int, L: int, ns: int,
                   fill_gate: bool = False):
    """One (center-tile × point-block) step of the transposed exact merge.
    ctrT/pts/ptsT are VALUES (the fori-loop kernel slices them out of
    VMEM-resident whole-cloud refs; the grid kernels load their blocks).

    r3 step-cost cuts (all bit-exact, compile-probed on chip):
      * the two prefix matmuls (in-block candidate rank, occupancy rank)
        run at DEFAULT matmul precision when their counts fit bf16's exact
        integer range (<= 256): 0/1 operands are bf16-exact, products are
        0/1, and the f32 accumulator keeps every partial sum <= 256 exact —
        only the one-hot PAYLOAD routing needs HIGHEST;
      * routing chunks are skipped (pl.when) when no candidate lands in
        their slot range — pays on sparse clouds where the per-step merged
        positions are a narrow band;
      * the surviving-entry compaction loops over SHIFT DISTANCE instead of
        target slot: entry at merged row t comes from buffer row
        t − occrank[t] (occrank = inclusive prefix of occupancy), so the
        loop runs only to the step's max shift = max candidates routed into
        any column — typically a handful — instead of always ns.
    The routed adds and the shifted survivors accumulate in VMEM scratch
    (gated pl.when bodies cannot build values), summed into the buffers at
    the end.
    """
    d2 = jnp.zeros((L, tc), jnp.float32)
    for d in range(3):
        dd = pts[:, d:d + 1] - ctrT[d:d + 1, :]
        d2 = d2 + dd * dd
    in_ball = d2 < r2                                    # (L, tc)
    korig = pts[:, 3:4]                                  # (L, 1) ascending
    key = jnp.where(in_ball, korig, _BIG)                # (L, tc)
    worst = topk_ref[ns - 1:ns, :]                       # (1, tc)
    can_add = jnp.min(key, axis=0, keepdims=True) < worst

    # exact at DEFAULT precision iff every count fits bf16's integer range
    rank_prec = None if L <= 256 else jax.lax.Precision.HIGHEST
    occ_prec = None if ns <= 256 else jax.lax.Precision.HIGHEST

    @pl.when(jnp.any(can_add))
    def _merge():
        ib = in_ball.astype(jnp.float32)
        # in-block candidate rank: inclusive prefix down the rows (MXU)
        tri = (jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
               >= jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
               ).astype(jnp.float32)
        rank_b = jnp.dot(tri, ib, preferred_element_type=jnp.float32,
                         precision=rank_prec)

        topx = topx_ref[...]                             # (ns, tc)
        topy = topy_ref[...]
        topz = topz_ref[...]
        topk = topk_ref[...]                             # ascending keys

        if fill_gate:
            # FILL-GATED buffer-rank compare: keys ascend down the buffer,
            # so an 8-slot chunk whose FIRST row is sentinel across the
            # whole tile contributes exactly 0 and is skipped. Gated
            # pl.when bodies cannot build values, so partial sums
            # accumulate in the st_ref VMEM scratch (an (L, tc) RMW per
            # open chunk — the cost that makes this an A/B candidate, not
            # an unconditional win; see BENCHMARKS.md).
            st_ref[...] = jnp.zeros((L, tc), jnp.float32)
            for s0 in range(0, ns, _MERGE_SC):
                sch = min(_MERGE_SC, ns - s0)

                @pl.when(jnp.min(topk[s0:s0 + 1, :]) < _BIG)
                def _rank_chunk(s0=s0, sch=sch):
                    part = jnp.zeros((L, tc), jnp.float32)
                    for s in range(s0, s0 + sch):
                        part = part + (topk[s:s + 1, :] < key
                                       ).astype(jnp.float32)
                    st_ref[...] = st_ref[...] + part
            smaller_top = st_ref[...]
        else:
            smaller_top = jnp.zeros((L, tc), jnp.float32)
            for s in range(ns):
                smaller_top = smaller_top + (
                    topk[s:s + 1, :] < key).astype(jnp.float32)
        pos_b = jnp.where(in_ball, smaller_top + rank_b, 0.0)   # (L, tc)

        # positions that actually land (pos > ns fell off the buffer)
        pos_r = jnp.where(pos_b <= ns, pos_b, 0.0)
        pmax = jnp.max(pos_r)
        pmin = jnp.min(jnp.where(pos_r > 0.0, pos_r, jnp.float32(ns + 1)))

        addx_ref[...] = jnp.zeros((ns, tc), jnp.float32)
        addy_ref[...] = jnp.zeros((ns, tc), jnp.float32)
        addz_ref[...] = jnp.zeros((ns, tc), jnp.float32)
        addk_ref[...] = jnp.zeros((ns, tc), jnp.float32)
        occ_ref[...] = jnp.zeros((ns, tc), jnp.float32)

        # candidate routing + occupancy, SC slots per matmul; chunks with
        # no landing candidate are skipped entirely
        for s0 in range(0, ns, _MERGE_SC):
            sc = min(_MERGE_SC, ns - s0)

            @pl.when((pmax >= s0 + 1.0) & (pmin <= s0 + sc + 0.0))
            def _route(s0=s0, sc=sc):
                cols = [(jnp.abs(pos_b - (s0 + q + 1.0)) < 0.5
                         ).astype(jnp.float32) for q in range(sc)]
                p_mat = jnp.concatenate(cols, axis=1) if sc > 1 else cols[0]
                chunk = jnp.dot(ptsT, p_mat,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)  # (8, sc·tc)

                def rows(p):
                    return jnp.concatenate(
                        [chunk[p:p + 1, q * tc:(q + 1) * tc]
                         for q in range(sc)], axis=0)    # (sc, tc)

                addx_ref[s0:s0 + sc, :] = rows(0)
                addy_ref[s0:s0 + sc, :] = rows(1)
                addz_ref[s0:s0 + sc, :] = rows(2)
                addk_ref[s0:s0 + sc, :] = rows(3)
                occ_ref[s0:s0 + sc, :] = rows(4)

        occ = occ_ref[...]                               # 1 where a
                                                         # candidate landed
        free = 1.0 - occ                                 # (ns, tc)
        # merged row t keeps buffer row t − occrank[t] (inclusive prefix of
        # occupancy = how many candidates landed at or above t)
        tri_ns = (jax.lax.broadcasted_iota(jnp.int32, (ns, ns), 0)
                  >= jax.lax.broadcasted_iota(jnp.int32, (ns, ns), 1)
                  ).astype(jnp.float32)
        occrank = jnp.dot(tri_ns, occ,
                          preferred_element_type=jnp.float32,
                          precision=occ_prec)            # (ns, tc)
        dmax = jnp.max(occrank * free)                   # max shift needed
        sel0 = free * (occrank < 0.5).astype(jnp.float32)
        addx_ref[...] = addx_ref[...] + topx * sel0
        addy_ref[...] = addy_ref[...] + topy * sel0
        addz_ref[...] = addz_ref[...] + topz * sel0
        addk_ref[...] = addk_ref[...] + topk * sel0
        for d in range(1, ns):
            @pl.when(dmax >= jnp.float32(d))
            def _shift(d=d):
                sel = free[d:, :] * (jnp.abs(occrank[d:, :] - d) < 0.5
                                     ).astype(jnp.float32)   # (ns−d, tc)
                z = jnp.zeros((d, tc), jnp.float32)

                def sh(t):
                    return jnp.concatenate([z, t[:ns - d] * sel], axis=0)

                addx_ref[...] = addx_ref[...] + sh(topx)
                addy_ref[...] = addy_ref[...] + sh(topy)
                addz_ref[...] = addz_ref[...] + sh(topz)
                addk_ref[...] = addk_ref[...] + sh(topk)
        # sentinel keys (_BIG) routed past the fill level keep their value
        # through the shifted survivors, so no restore pass is needed
        topx_ref[...] = addx_ref[...]
        topy_ref[...] = addy_ref[...]
        topz_ref[...] = addz_ref[...]
        topk_ref[...] = addk_ref[...]
        cnt_ref[0:1, :] = cnt_ref[0:1, :] + jnp.sum(ib, axis=0, keepdims=True)


def _bq_kernel_t(hit_ref, ctrT_ref, pts_ref, ptsT_ref,
                 topx_ref, topy_ref, topz_ref, topk_ref, cnt_ref,
                 addx_ref, addy_ref, addz_ref, addk_ref, occ_ref,
                 *st_scratch, r2: float, tc: int, L: int, ns: int,
                 fill_gate: bool = False):
    # the (L, tc) fill-gate scratch is appended only when fill_gate=True
    # (default-off measured negative) — no dead VMEM otherwise
    st_ref = st_scratch[0] if st_scratch else None
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        _init_merge_buffers_t(topx_ref, topy_ref, topz_ref, topk_ref,
                              cnt_ref, tc, ns)

    word = hit_ref[i, j // 32]
    hit = ((word >> (j % 32)) & 1) == 1

    @pl.when(hit)
    def _process():
        _merge_block_t(ctrT_ref[...], pts_ref[...], ptsT_ref[...],
                       topx_ref, topy_ref, topz_ref, topk_ref, cnt_ref,
                       addx_ref, addy_ref, addz_ref, addk_ref, occ_ref,
                       st_ref, r2=r2, tc=tc, L=L, ns=ns,
                       fill_gate=fill_gate)


def _block_major_rows(ptsT: Array, L: int) -> Array:
    """(8, NB·L) transposed payload -> (NB·8, L) block-major rows: block
    j's 8 payload rows sit at rows [8j, 8j+8), so an in-kernel block
    access is a multiple-of-8 SUBLANE slice (dynamic lane slicing is
    restricted) and a whole-VMEM-resident copy stays lane-clean under
    T(8,128) tiling (the scoped-VMEM padding rule — see _ballmax_kernel)."""
    nb = ptsT.shape[1] // L
    return ptsT.reshape(8, nb, L).transpose(1, 0, 2).reshape(nb * 8, L)


def _merge_prologue_t(sc_pts4, sc_blk_bbox, centers, radius, tc,
                      block_mask=None):
    """Shared transposed-driver prologue: tile-pad centers (_FAR_CENTER
    sentinels), hitmask, and the transposed payload assemblies. Returns
    (m, mp, tiles, nb, L, r2, hitmask, ctrT (8, Mp), ptsT_ext (8, Np))."""
    m = centers.shape[0]
    np_ = sc_pts4.shape[0]
    nb = sc_blk_bbox.shape[0]
    L = np_ // nb
    pad = -m % tc
    centers_p = jnp.pad(centers.astype(jnp.float32), ((0, pad), (0, 0)),
                        constant_values=_FAR_CENTER)
    mp = m + pad
    r2 = float(radius) ** 2
    if block_mask is not None:
        assert block_mask.shape == (mp // tc, nb), (
            f"block_mask {block_mask.shape} != (tiles={mp // tc}, nb={nb}) "
            f"— provide it for TILE-PADDED centers (callers pass tc-aligned "
            f"center counts in batch mode)")
    hitmask = _block_hitmask(_tile_bbox(centers_p, tc), sc_blk_bbox, r2,
                             block_mask)
    ctrT = jnp.concatenate(
        [centers_p.T, jnp.zeros((5, mp), jnp.float32)], axis=0)
    ptsT_ext = jnp.concatenate(
        [sc_pts4.T, jnp.ones((1, np_), jnp.float32),
         jnp.zeros((3, np_), jnp.float32)], axis=0)
    return m, mp, mp // tc, nb, L, r2, hitmask, ctrT, ptsT_ext


def _merge_epilogue_t(topx, topy, topz, topk, cnt, tiles, ns, tc, mp, m):
    """Shared transposed-driver epilogue: un-transpose the (tiles·ns, tc)
    planes to (M, ns, 4) buffers + extract the cnt payload row."""
    def untranspose(plane):
        return jnp.swapaxes(plane.reshape(tiles, ns, tc), 1, 2).reshape(
            mp, ns)[:m]

    top = jnp.stack([untranspose(topx), untranspose(topy),
                     untranspose(topz), untranspose(topk)], axis=-1)
    cnt_rows = cnt.reshape(tiles, 8, tc)[:, 0].reshape(mp)[:m]
    return top, cnt_rows


@partial(jax.jit, static_argnames=("nsample", "radius", "tile", "interpret",
                                   "fill_gate"))
def _bq_sorted_raw_t(sc_pts4: Array, sc_blk_bbox: Array, centers: Array,
                     radius: float, nsample: int, tile: int = 128,
                     interpret: Optional[bool] = None,
                     block_mask: Optional[Array] = None,
                     fill_gate: bool = False):
    """Transposed-merge driver — same contract as _bq_sorted_raw."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ns = nsample
    tc = tile
    m, mp, tiles, nb, L, r2, hitmask, ctrT, ptsT_ext = _merge_prologue_t(
        sc_pts4, sc_blk_bbox, centers, radius, tc, block_mask)

    def _plane_spec():
        return pl.BlockSpec((ns, tc), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)

    topx, topy, topz, topk, cnt = pl.pallas_call(
        partial(_bq_kernel_t, r2=r2, tc=tc, L=L, ns=ns, fill_gate=fill_gate),
        grid=(tiles, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, tc), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 4), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, L), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            _plane_spec(), _plane_spec(), _plane_spec(), _plane_spec(),
            pl.BlockSpec((8, tc), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((tiles * ns, tc), jnp.float32),
            jax.ShapeDtypeStruct((tiles * ns, tc), jnp.float32),
            jax.ShapeDtypeStruct((tiles * ns, tc), jnp.float32),
            jax.ShapeDtypeStruct((tiles * ns, tc), jnp.float32),
            jax.ShapeDtypeStruct((tiles * 8, tc), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        scratch_shapes=[pltpu.VMEM((ns, tc), jnp.float32)
                        for _ in range(5)]
                       + ([pltpu.VMEM((L, tc), jnp.float32)]
                          if fill_gate else []),
        interpret=interpret,
    )(hitmask, ctrT, sc_pts4, ptsT_ext)
    return _merge_epilogue_t(topx, topy, topz, topk, cnt,
                             tiles, ns, tc, mp, m)


# ---------------------------------------------------------------------------
# fori-loop merge driver. The (tiles × blocks) grid pays a fixed
# sequencing/branch cost PER STEP even when the hit bit is clear — measured
# 124 ms of the 216 ms merge at 120k points (262,144 steps, ~0.47 µs each,
# zero useful work). At extraction scale the whole sorted cloud is tiny
# (48 B/point → 6 MB at 131k), so this driver keeps it VMEM-resident,
# runs grid=(tiles,) only, and loops blocks INSIDE the kernel
# (lax.fori_loop + dynamic multiple-of-8 sublane slices) — the per-block
# skip becomes a scalar branch instead of a grid step. Falls back to the
# 2-D grid driver above when the cloud exceeds the VMEM budget.
# ---------------------------------------------------------------------------

_FORI_MAX_POINTS = 524288    # ballmax fori cap: lane-clean (nb·8, L)
                             # payload = 32 B/point → 16 MB of VMEM
# The MERGE fori driver additionally needs the ROW-major (Np, 4) cloud
# VMEM-resident (its (L, ·)-sublane point columns cannot be derived from
# the lane-clean transposed payload), and the compile service tiles that
# whole-VMEM operand at T(8,128) → 512 B/point: 64 MiB at 131072 (fits
# the 100 MiB budget, gate-verified) but 128 MiB at the next bucket.
# Larger clouds route to the lane-clean 2-D grid driver.
_FORI_MAX_POINTS_MERGE = 131072


def _bq_kernel_t_fori(hit_ref, ctrT_ref, pts_ref, ptsT_ref,
                      topx_ref, topy_ref, topz_ref, topk_ref, cnt_ref,
                      addx_ref, addy_ref, addz_ref, addk_ref, occ_ref,
                      *st_scratch, r2: float, tc: int, L: int, ns: int,
                      nb: int, fill_gate: bool = False):
    st_ref = st_scratch[0] if st_scratch else None
    i = pl.program_id(0)
    _init_merge_buffers_t(topx_ref, topy_ref, topz_ref, topk_ref,
                          cnt_ref, tc, ns)
    ctrT = ctrT_ref[...]

    def body(j, carry):
        word = hit_ref[i, j // 32]
        hit = ((word >> (j % 32)) & 1) == 1

        @pl.when(hit)
        def _process():
            pts = pts_ref[pl.ds(j * L, L), :]            # (L, 4)
            ptsT = ptsT_ref[pl.ds(j * 8, 8), :]          # (8, L) block-major
            _merge_block_t(ctrT, pts, ptsT,
                           topx_ref, topy_ref, topz_ref, topk_ref, cnt_ref,
                           addx_ref, addy_ref, addz_ref, addk_ref, occ_ref,
                           st_ref, r2=r2, tc=tc, L=L, ns=ns,
                           fill_gate=fill_gate)

        return carry

    # static bounds only: dynamic SMEM-fed bounds blow up the Mosaic
    # compile (see the recorded negative above _init_merge_buffers)
    jax.lax.fori_loop(0, nb, body, 0)


@partial(jax.jit, static_argnames=("nsample", "radius", "tile", "interpret",
                                   "fill_gate", "raw_planes"))
def _bq_sorted_raw_t_fori(sc_pts4: Array, sc_blk_bbox: Array, centers: Array,
                          radius: float, nsample: int, tile: int = 128,
                          interpret: Optional[bool] = None,
                          block_mask: Optional[Array] = None,
                          fill_gate: bool = False,
                          raw_planes: bool = False):
    """Whole-cloud-in-VMEM fori-loop driver — same contract (and bit-equal
    outputs) as _bq_sorted_raw_t.

    raw_planes: skip the epilogue un-transpose entirely and return the
    kernel's LANE-DENSE outputs (topx, topy, topz, topk (tiles·ns, tc),
    cnt_rows (tiles·8, tc)) — for planes-consuming tower kernels that
    never materialize the 32×-lane-padded (M, ns, 4) buffer."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ns = nsample
    tc = tile
    m, mp, tiles, nb, L, r2, hitmask, ctrT, ptsT_ext = _merge_prologue_t(
        sc_pts4, sc_blk_bbox, centers, radius, tc, block_mask)
    ptsT_blocks = _block_major_rows(ptsT_ext, L)

    def _plane_spec():
        return pl.BlockSpec((ns, tc), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    topx, topy, topz, topk, cnt = pl.pallas_call(
        partial(_bq_kernel_t_fori, r2=r2, tc=tc, L=L, ns=ns, nb=nb,
                fill_gate=fill_gate),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, tc), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),       # whole cloud
            pl.BlockSpec(memory_space=pltpu.VMEM),       # block-major rows
        ],
        out_specs=(
            _plane_spec(), _plane_spec(), _plane_spec(), _plane_spec(),
            pl.BlockSpec((8, tc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((tiles * ns, tc), jnp.float32),
            jax.ShapeDtypeStruct((tiles * ns, tc), jnp.float32),
            jax.ShapeDtypeStruct((tiles * ns, tc), jnp.float32),
            jax.ShapeDtypeStruct((tiles * ns, tc), jnp.float32),
            jax.ShapeDtypeStruct((tiles * 8, tc), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        scratch_shapes=[pltpu.VMEM((ns, tc), jnp.float32)
                        for _ in range(5)]
                       + ([pltpu.VMEM((L, tc), jnp.float32)]
                          if fill_gate else []),
        interpret=interpret,
    )(hitmask, ctrT, sc_pts4, ptsT_blocks)
    if raw_planes:
        return topx, topy, topz, topk, cnt
    return _merge_epilogue_t(topx, topy, topz, topk, cnt,
                             tiles, ns, tc, mp, m)


@partial(jax.jit, static_argnames=("nsample", "radius", "tile", "interpret"))
def _bq_sorted_raw(sc_pts4: Array, sc_blk_bbox: Array, centers: Array,
                   radius: float, nsample: int, tile: int = 128,
                   interpret: Optional[bool] = None,
                   block_mask: Optional[Array] = None):
    """Kernel driver: centers (M, 3) (spatially ordered) -> raw merge buffer
    (M, ns, 4) [xyz | orig-or-inf] and counts (M,).

    Counts are capped-EQUIVALENT, not true totals: the whole-block skip
    stops accumulating once every center in a tile is saturated, so the
    value is exact below ns and a lower bound >= ns above it. Consumers
    must clamp with min(cnt, ns) (reference pts_cnt semantics) — which
    _finish_grouped does."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m = centers.shape[0]
    L = sc_pts4.shape[0] // sc_blk_bbox.shape[0]
    ns = nsample
    tc = tile
    pad = -m % tc
    centers_p = jnp.pad(centers.astype(jnp.float32), ((0, pad), (0, 0)),
                        constant_values=_FAR_CENTER)
    mp = m + pad
    ctr4 = jnp.concatenate(
        [centers_p, jnp.zeros((mp, 1), jnp.float32)], axis=1)
    tiles = mp // tc
    nb = sc_blk_bbox.shape[0]
    r2 = float(radius) ** 2
    hitmask = _block_hitmask(_tile_bbox(centers_p, tc), sc_blk_bbox, r2,
                             block_mask)
    pts4T = sc_pts4.T                                        # (4, Np)

    def _plane_spec():
        return pl.BlockSpec((tc, ns), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)

    topx, topy, topz, topk, cnt = pl.pallas_call(
        partial(_bq_kernel, r2=r2, tc=tc, L=L, ns=ns),
        grid=(tiles, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tc, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, L), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            _plane_spec(), _plane_spec(), _plane_spec(), _plane_spec(),
            pl.BlockSpec((tc, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((mp, ns), jnp.float32),
            jax.ShapeDtypeStruct((mp, ns), jnp.float32),
            jax.ShapeDtypeStruct((mp, ns), jnp.float32),
            jax.ShapeDtypeStruct((mp, ns), jnp.float32),
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(hitmask, ctr4, pts4T)
    top = jnp.stack([topx, topy, topz, topk], axis=-1)       # (mp, ns, 4)
    return top[:m], cnt[:m, 0]


import os as _os

# Transposed-merge formulation (MXU candidate routing) is the default; set
# F3D_MERGE_T=0 to A/B against the original (tc, L)-oriented merge.
_USE_TRANSPOSED_MERGE = _os.environ.get("F3D_MERGE_T", "1") != "0"


def ball_query_grouped_sorted(
    sc: SortedCloud, centers: Array, radius: float, nsample: int,
    tile: int = 128, interpret: Optional[bool] = None,
    max_fori_points: Optional[int] = None,
    block_mask: Optional[Array] = None,
) -> Tuple[Array, Array, Array]:
    """Exact grouped ball query against a Morton-sorted cloud.

    Args:
      sc: build_sorted_cloud output.
      centers: (M, 3) query centers, already spatially ordered (e.g. the
        sorted points themselves, or sort_centers output).

    Returns:
      grouped: (M, ns, 3) selected ABSOLUTE point coords, repeat-padded
        with slot 0 per reference semantics (empty balls: slot coords are
        the center itself — callers needing the reference's nearest-point
        fallback use `hashed_ball_query`, which restores it exactly).
      idx: (M, ns) int32 original point indices (0 where the ball is empty).
      cnt: (M,) int32 in-ball counts capped at ns (reference pts_cnt).
    """
    if max_fori_points is None:
        max_fori_points = _FORI_MAX_POINTS_MERGE
    if _USE_TRANSPOSED_MERGE:
        # fori driver (blocks looped in-kernel, whole cloud VMEM-resident)
        # when the cloud fits the VMEM budget; 2-D grid driver otherwise
        # (max_fori_points=0 forces it — coverage in tests and the gate)
        raw = (_bq_sorted_raw_t_fori
               if sc.pts4.shape[0] <= max_fori_points else _bq_sorted_raw_t)
    else:
        raw = _bq_sorted_raw
    top, cnt_raw = raw(sc.pts4, sc.blk_bbox, centers,
                       float(radius), nsample, tile=tile,
                       interpret=interpret, block_mask=block_mask)
    return _finish_grouped(top, cnt_raw, centers, nsample)


def ball_query_planes_sorted(
    sc: SortedCloud, centers: Array, radius: float, nsample: int,
    tile: int = 128, interpret: Optional[bool] = None,
    block_mask: Optional[Array] = None,
) -> Tuple[Tuple[Array, Array, Array, Array], Array]:
    """Grouped ball query returning the transposed merge kernel's raw
    LANE-DENSE outputs — no (M, ns, 4) materialization.

    The standard ball_query_grouped_sorted epilogue un-transposes the
    kernel's (tiles·ns, tile) planes into an (M, ns, 4) buffer whose lane
    dim pads 4 → 128 (32× physical bytes; the r4 extract roofline measured
    the padded grouped tensor at 4 GiB for 96 MiB logical at 131k).
    Planes-consuming tower kernels (fused_detect_planes_t) read this
    layout directly instead.

    Returns ((topx, topy, topz, topk) each (tiles·ns, tile) — absolute
    selected coords / original-index-or-+inf keys, rows = slots, lanes =
    tile-padded centers in order — and cnt_plane (tiles·8, tile) with the
    per-center count in row 0 of each block). Consumers apply the
    reference repeat-pad semantics themselves (slot < min(cnt, ns));
    selection content is bit-identical to ball_query_grouped_sorted (the
    epilogue is pure data movement). Fori driver only — the cloud must
    fit the VMEM budget (see _FORI_MAX_POINTS_MERGE)."""
    assert _USE_TRANSPOSED_MERGE
    assert sc.pts4.shape[0] <= _FORI_MAX_POINTS_MERGE, (
        f"planes path requires the fori driver "
        f"({sc.pts4.shape[0]} > {_FORI_MAX_POINTS_MERGE} points)")
    topx, topy, topz, topk, cnt = _bq_sorted_raw_t_fori(
        sc.pts4, sc.blk_bbox, centers, float(radius), nsample, tile=tile,
        interpret=interpret, block_mask=block_mask, raw_planes=True)
    return (topx, topy, topz, topk), cnt


def planes_cnt_rows(cnt_plane: Array, m: int, tile: int) -> Array:
    """(tiles·8, tile) cnt blocks -> (m,) per-center counts (row 0)."""
    tiles = cnt_plane.shape[0] // 8
    return cnt_plane.reshape(tiles, 8, tile)[:, 0].reshape(-1)[:m]


def unplane(plane: Array, ns: int, m: int) -> Array:
    """(tiles·ns, tile) plane -> (m, ns) center-major rows (the epilogue's
    un-transpose for ONE payload — 64-lane dense, no 4-wide stack)."""
    tc = plane.shape[1]
    tiles = plane.shape[0] // ns
    return jnp.swapaxes(plane.reshape(tiles, ns, tc), 1, 2).reshape(
        tiles * tc, ns)[:m]


def finish_planes(planes, cnt_plane: Array, centers: Array, ns: int,
                  m: int, tile: int) -> Tuple[Array, Array, Array, Array]:
    """_finish_grouped in PER-COORDINATE plane form: the raw lane-dense
    merge planes -> three (m, ns) repeat-padded, empty-handled coordinate
    arrays + (m,) counts, without ever materializing the (m, ns, 3)
    stack whose 3-wide lane dim pads 42x on TPU (the r4 extract roofline
    measured it at 4 GiB physical for 96 MiB logical at 131k points).

    BIT-identical to _finish_grouped(unplane-stack(planes), ...) per
    coordinate: unplane is pure data movement and the select tree
    (slot < cnt repeat-pad, empty -> center) applies the same jnp.where
    to the same values (tests/test_hash_bq.py::test_finish_planes_bit_exact).
    """
    cnt_raw = planes_cnt_rows(cnt_plane, m, tile)
    cnt = jnp.minimum(cnt_raw, ns).astype(jnp.int32)              # (m,)
    slot = jnp.arange(ns, dtype=jnp.int32)
    filled = slot[None, :] < cnt[:, None]                         # (m, ns)
    empty = (cnt == 0)[:, None]
    outs = []
    for d in range(3):
        g = unplane(planes[d], ns, m)                             # (m, ns)
        g = jnp.where(filled, g, g[:, 0:1])                       # repeat-pad
        outs.append(jnp.where(empty, centers.astype(jnp.float32)[:, d:d + 1],
                              g))
    return outs[0], outs[1], outs[2], cnt


def _finish_grouped(top: Array, cnt_raw: Array, centers: Array, ns: int
                    ) -> Tuple[Array, Array, Array]:
    """Repeat-pad + empty-ball handling shared by the dense-grid and CSR
    merge drivers (reference pad semantics, tf_grouping_g.cu:27-35)."""
    cnt = jnp.minimum(cnt_raw, ns).astype(jnp.int32)              # (M,)
    slot = jnp.arange(ns, dtype=jnp.int32)
    filled = slot[None, :] < cnt[:, None]                         # (M, ns)
    empty = (cnt == 0)[:, None]

    key = top[:, :, 3]
    idx0 = key[:, 0:1]
    idx = jnp.where(filled, key, idx0)                            # repeat-pad
    idx = jnp.where(empty, 0.0, idx).astype(jnp.int32)

    xyz0 = top[:, 0:1, :3]
    grouped = jnp.where(filled[..., None], top[:, :, :3], xyz0)
    grouped = jnp.where(empty[..., None],
                        centers.astype(jnp.float32)[:, None, :], grouped)
    return grouped, idx, cnt


def sort_centers(centers: Array, valid: Optional[Array] = None,
                 cell_size: float = 2.0) -> Tuple[Array, Array]:
    """Spatially order arbitrary centers; returns (sorted_centers, order)."""
    c = centers.astype(jnp.float32)
    if valid is not None:
        c = jnp.where(valid[:, None], c, _FAR_CENTER)
    cell = jnp.clip((c - jnp.min(c, axis=0)) / cell_size, 0, 1023).astype(jnp.int32)
    order = jnp.argsort(_morton30(cell), stable=True).astype(jnp.int32)
    return c[order], order


def _ballmax_kernel(hit_ref, ctr_ref, ptsT_ref, out_ref, scr_ref, *,
                    r2: float, tc: int, L: int, nb: int):
    """Running max of a per-point value over each center's radius ball.

    ptsT row 3 carries the VALUE (e.g. detector attention) instead of
    the original index. Invalid/pad points sit at +1e9 so they can never
    enter a real center's ball — no value masking needed.

    Memory-layout constraints (found on chip — newer compile-service
    versions allocate the whole custom-call result, and any whole-array
    VMEM operand, in scoped VMEM with T(8,128) tile padding):
      * the result must be lane-clean: an (Mp, 1) column output pads
        128× (64 MiB at 131k centers) → the per-tile max is emitted as
        row 0 of an (8, tc) block into a (tiles·8, tc) output;
      * the fori variant's VMEM-resident cloud must be lane-clean: an
        (Np, 4) array pads 32× → points arrive as the merge drivers'
        block-major transposed payload (nb·8, L), rows x/y/z/val.
    The running max accumulates as a (tc, 1) scratch column (its VMEM
    padding is one tile, 256 KB) and is transposed to the output row
    once per tile by an identity matmul (exact: 0/1 multiplicands and
    single-nonzero-addend sums are exact in f32 at HIGHEST precision).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        _init_ballmax(ctr_ref, scr_ref)

    word = hit_ref[i, j // 32]
    hit = ((word >> (j % 32)) & 1) == 1

    @pl.when(hit)
    def _process():
        _ballmax_block(ctr_ref, ptsT_ref[...], scr_ref, r2=r2, tc=tc, L=L)

    @pl.when(j == nb - 1)
    def _finalize():
        _finish_ballmax(scr_ref, out_ref, tc)


def _ballmax_kernel_fori(hit_ref, ctr_ref, ptsT_ref, out_ref, scr_ref, *,
                         r2: float, tc: int, L: int, nb: int):
    """grid=(tiles,) variant: blocks looped in-kernel over the
    VMEM-resident cloud (see the fori merge driver — the 2-D grid pays
    ~0.5 µs of sequencing per step even for culled blocks). Static loop
    bounds only — dynamic bounds blow up the Mosaic compile."""
    i = pl.program_id(0)
    _init_ballmax(ctr_ref, scr_ref)

    def body(j, carry):
        word = hit_ref[i, j // 32]
        hit = ((word >> (j % 32)) & 1) == 1

        @pl.when(hit)
        def _process():
            _ballmax_block(ctr_ref, ptsT_ref[pl.ds(j * 8, 8), :], scr_ref,
                           r2=r2, tc=tc, L=L)

        return carry

    jax.lax.fori_loop(0, nb, body, 0)
    _finish_ballmax(scr_ref, out_ref, tc)


def _init_ballmax(ctr_ref, scr_ref):
    """Sentinel centers (tile padding at _FAR_CENTER, invalid points at
    _FAR) never receive an in-ball value, so a -_BIG init would pin
    jnp.min(scr_ref) at -1e30 for their tiles and permanently defeat the
    whole-block value skip there. Initialize them to +_BIG instead — they
    are sliced off / masked out of every output path anyway."""
    is_pad = ctr_ref[...][:, 0:1] >= 5.0e8                   # (tc, 1)
    scr_ref[...] = jnp.where(is_pad, _BIG, -_BIG).astype(jnp.float32)


def _ballmax_block(ctr_ref, ptsT, scr_ref, *, r2: float, tc: int, L: int):
    """One (center-tile × point-block) step of the running ball max,
    shared by the dense-grid, CSR, and fori kernels (identical outputs).
    ptsT is a VALUE (8, L) transposed block: rows x/y/z/val."""
    # exact whole-block skip: the block cannot raise any center's
    # running max unless its value maximum beats the tile's lowest max
    vals = ptsT[3:4, :]                                      # (1, L)
    blkmax = jnp.max(vals)

    @pl.when(blkmax > jnp.min(scr_ref[...]))
    def _scan_block():
        ctr = ctr_ref[...]                                   # (TC, 4)
        d2 = jnp.zeros((tc, L), jnp.float32)
        for d in range(3):
            dd = ctr[:, d:d + 1] - ptsT[d:d + 1, :]          # (TC, L)
            d2 = d2 + dd * dd
        neigh = jnp.where(d2 < r2, vals, -_BIG)              # (TC, L)
        scr_ref[...] = jnp.maximum(scr_ref[...],
                                   jnp.max(neigh, axis=1, keepdims=True))


def _transpose_cols_to_rows(cols, tc: int):
    """In-kernel (tc, P) columns -> (P, tc) rows via one identity matmul
    (rows = colsᵀ·I, lhs-dim-0 contraction). Mosaic cannot relayout the
    sublane axis onto lanes directly, and a lane-narrow output/operand
    gets T(8,128)-padded 128× in scoped VMEM (see _ballmax_kernel) — this
    is the proven escape hatch. Bit-exact at HIGHEST precision: the
    bf16x3 split of a f32 is exact, ×1.0/×0.0 products round nowhere,
    and each output sums exactly one nonzero addend."""
    ident = (jax.lax.broadcasted_iota(jnp.int32, (tc, tc), 0)
             == jax.lax.broadcasted_iota(jnp.int32, (tc, tc), 1)
             ).astype(jnp.float32)
    return jax.lax.dot_general(cols, ident, (((0,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST)


def _finish_ballmax(scr_ref, out_ref, tc: int):
    """Transpose the accumulated (tc, 1) max column to the (8, tc) output
    block (see _transpose_cols_to_rows)."""
    row = _transpose_cols_to_rows(scr_ref[...], tc)           # (1, tc)
    out_ref[...] = jnp.broadcast_to(row, out_ref.shape)


@partial(jax.jit, static_argnames=("radius", "tile", "interpret",
                                   "max_fori_points"))
def ball_max_sorted(sc_pts4: Array, sc_blk_bbox: Array, values: Array,
                    radius: float, tile: int = 512,
                    interpret: Optional[bool] = None,
                    centers: Optional[Array] = None,
                    max_fori_points: Optional[int] = None,
                    block_mask: Optional[Array] = None) -> Array:
    """Per center, the max of `values` over its radius ball.

    This is the NMS primitive: a point is a keypoint iff its attention
    equals the ball max (ops/nms.py computes the same thing O(N²); here the
    Morton-block bbox cull restricts work to geometric neighbors). Exact —
    the cull is sufficient (any in-ball point's block bbox is within radius
    of the center-tile bbox), so no candidate is ever missed.

    Args:
      sc_pts4 / sc_blk_bbox: the SortedCloud layout (build_sorted_cloud*).
      values: (Np,) f32 per SORTED position (pad/invalid values ignored —
        their coords are +1e9 so they never land in a real ball).
      radius: suppression radius.
      centers: optional (M, 3) center subset — default all sorted points.
        The mesh-sharded NMS (parallel/point_parallel.py) passes each
        device's contiguous row-shard here; candidates stay the full cloud.

    Returns:
      (M,) f32 ball max per center (when centers are the points themselves
      the result >= own value always; +1e30 for pad/invalid centers — see
      _init_ballmax).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    np_ = sc_pts4.shape[0]
    if centers is None:
        centers = sc_pts4[:, :3]
    m = centers.shape[0]
    L = np_ // sc_blk_bbox.shape[0]
    tc = tile
    pad = -m % tc
    centers_p = jnp.pad(centers, ((0, pad), (0, 0)),
                        constant_values=_FAR_CENTER)
    mp = m + pad
    tiles = mp // tc
    ctr4 = jnp.concatenate(
        [centers_p, jnp.zeros((mp, 1), jnp.float32)], axis=1)
    nb = sc_blk_bbox.shape[0]
    r2 = float(radius) ** 2
    if block_mask is not None:
        assert block_mask.shape == (mp // tc, nb), (
            f"block_mask {block_mask.shape} != ({mp // tc}, {nb})")
    hitmask = _block_hitmask(_tile_bbox(centers_p, tc), sc_blk_bbox, r2,
                             block_mask)
    # block-major transposed payload (rows x/y/z/val per block) — lane-clean
    # under T(8,128) so the fori variant can keep the whole cloud VMEM-
    # resident without the 32× (Np, 4) lane padding (see _ballmax_kernel)
    ptsT = jnp.concatenate(
        [sc_pts4[:, :3].T, values.astype(jnp.float32)[None, :],
         jnp.zeros((4, np_), jnp.float32)], axis=0)          # (8, Np)
    ptsT_blocks = _block_major_rows(ptsT, L)

    # the per-tile max lives in row 0 of an (8, tc) block (see
    # _ballmax_kernel: an (Mp, 1) column output lane-pads 128×)
    out_spec = pl.BlockSpec((8, tc), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((tiles * 8, tc), jnp.float32)
    scratch = [pltpu.VMEM((tc, 1), jnp.float32)]

    def finish(out):
        return out.reshape(tiles, 8, tc)[:, 0].reshape(mp)[:m]

    if max_fori_points is None:
        max_fori_points = _FORI_MAX_POINTS
    if np_ <= max_fori_points:
        # whole cloud VMEM-resident, blocks looped in-kernel (the 2-D grid
        # pays per-step sequencing even for culled blocks — see the fori
        # merge driver); max_fori_points=0 forces the 2-D grid driver
        # (large-cloud path coverage in tests and the on-chip gate)
        out = pl.pallas_call(
            partial(_ballmax_kernel_fori, r2=r2, tc=tc, L=L, nb=nb),
            grid=(tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((tc, 4), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),   # whole cloud
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=64 * 1024 * 1024),
            scratch_shapes=scratch,
            interpret=interpret,
        )(hitmask, ctr4, ptsT_blocks)
        return finish(out)

    out = pl.pallas_call(
        partial(_ballmax_kernel, r2=r2, tc=tc, L=L, nb=nb),
        grid=(tiles, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tc, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, L), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        scratch_shapes=scratch,
        interpret=interpret,
    )(hitmask, ctr4, ptsT_blocks)
    return finish(out)


def _nearest_valid_chunked(centers: Array, pts: Array,
                           valid_mask: Optional[Array] = None,
                           chunk_m: int = 1024, chunk_n: int = 4096) -> Array:
    """Per-center nearest VALID point index with O(chunk_m·chunk_n) memory.

    The naive `argmin(pairwise_d2)` materializes an (M, N) matrix — ~68 GB
    at 131k×131k — which XLA must budget for even when it sits in a dead
    lax.cond branch. This computes the same argmin in fixed (chunk_m,
    chunk_n) tiles with a running (min_d2, argmin) carry. Tie rule: the
    FIRST index attaining the minimum (strict-< carry update + in-chunk
    jnp.argmin), identical to the dense jnp.argmin and to the reference
    fallback's scan order (tf_grouping_g.cu:42-48).
    """
    m, n = centers.shape[0], pts.shape[0]
    cm = min(chunk_m, m)
    cn = min(chunk_n, n)
    pad_m = -m % cm
    pad_n = -n % cn
    c = jnp.pad(centers.astype(jnp.float32), ((0, pad_m), (0, 0)))
    x = jnp.pad(pts.astype(jnp.float32), ((0, pad_n), (0, 0)),
                constant_values=_FAR)   # pad points can never win
    vm = None
    if valid_mask is not None:
        vm = jnp.pad(valid_mask, (0, pad_n))
    n_nchunks = (n + pad_n) // cn

    def one_center_chunk(cc):                                 # (cm, 3)
        def body(carry, k):
            best_d2, best_i = carry
            xb = jax.lax.dynamic_slice_in_dim(x, k * cn, cn, axis=0)
            d2 = jnp.zeros((cm, cn), jnp.float32)
            for d in range(3):
                dd = cc[:, d:d + 1] - xb[None, :, d]
                d2 = d2 + dd * dd
            if vm is not None:
                vb = jax.lax.dynamic_slice_in_dim(vm, k * cn, cn, axis=0)
                d2 = jnp.where(vb[None, :], d2, jnp.inf)
            loc_min = jnp.min(d2, axis=1)
            loc_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + k * cn
            upd = loc_min < best_d2                            # strict: keep
            return (jnp.where(upd, loc_min, best_d2),          # earliest tie
                    jnp.where(upd, loc_arg, best_i)), None

        init = (jnp.full((cm,), jnp.inf, jnp.float32),
                jnp.zeros((cm,), jnp.int32))
        (best_d2, best_i), _ = jax.lax.scan(
            body, init, jnp.arange(n_nchunks, dtype=jnp.int32))
        return best_i

    out = jax.lax.map(one_center_chunk, c.reshape(-1, cm, 3))
    return out.reshape(-1)[:m]


@partial(jax.jit, static_argnames=("radius", "nsample", "cell_size",
                                   "block_size", "tile", "interpret"))
def hashed_ball_query(
    xyz: Array, centers: Array, radius: float, nsample: int,
    valid_mask: Optional[Array] = None, center_valid: Optional[Array] = None,
    cell_size: Optional[float] = None, block_size: int = 256,
    tile: int = 128, interpret: Optional[bool] = None,
) -> Tuple[Array, Array]:
    """Drop-in exact replacement for ops.ball_query (B=1, scalar radius).

    Same contract as ops.neighborhoods.ball_query — (idx (B,M,ns) int32,
    cnt (B,M) int32), index-exact including first-ns-by-original-index on
    saturated balls, repeat-pad, and the per-center nearest-point fallback
    for empty balls (restored via a lax.cond dense pass that only executes
    when some valid center has an empty ball — never in the centers-are-
    cloud-points paths).
    """
    assert xyz.ndim == 3 and xyz.shape[0] == 1, "hashed path is per-cloud (B=1)"
    cell = float(radius) if cell_size is None else cell_size
    x = xyz[0]
    c = centers[0]
    m = c.shape[0]
    vm = None if valid_mask is None else valid_mask[0]
    sc = build_sorted_cloud(x, vm, cell_size=cell, block_size=block_size)
    c_sorted, order = sort_centers(
        c, None if center_valid is None else center_valid[0], cell_size=cell)
    _, idx_s, cnt_s = ball_query_grouped_sorted(
        sc, c_sorted, radius, nsample, tile=tile, interpret=interpret)
    inv = jnp.zeros((m,), jnp.int32).at[order].set(jnp.arange(m, dtype=jnp.int32))
    idx = idx_s[inv]
    cnt = cnt_s[inv]

    # exact nearest-point fallback for empty balls (rare: only external
    # keypoints can have them; compiled as a cond so it costs nothing when
    # no valid center is empty). Chunked so XLA never budgets an (M, N)
    # buffer — at 131k×131k that would be a ~68 GB allocation.
    cv = jnp.ones((m,), bool) if center_valid is None else center_valid[0]
    need = jnp.any((cnt == 0) & cv)

    def with_fallback(idx):
        nearest = _nearest_valid_chunked(c, x, vm)
        # gate on cv so masked centers keep stable (zero) rows regardless
        # of whether unrelated valid centers triggered the fallback pass
        return jnp.where(((cnt == 0) & cv)[:, None], nearest[:, None], idx)

    idx = jax.lax.cond(need, with_fallback, lambda i: i, idx)
    return idx[None], cnt[None]


# ---------------------------------------------------------------------------
# CSR (scalar-prefetch) variants: iterate ONLY the (tile, block) pairs whose
# bboxes pass the cull, instead of the full tiles x blocks grid. At 131k
# points the dense grid is ~97% skipped steps, and skipped steps still pay
# ~0.4 us of grid sequencing each (~200 ms of pure iteration); the CSR
# walk removes that entirely. The hit list is built on the HOST (the cloud
# is host-resident at pipeline entry and the Morton sort already runs
# there), sorted by tile so each tile's output block stays resident in
# VMEM across its consecutive steps.
# ---------------------------------------------------------------------------


def build_hit_csr_host(centers, blk_bbox, radius: float, tile: int,
                       bucket: bool = True):
    """Host-side hit list: (tile_of, blk_of) int32 arrays, tile-sorted.

    centers: (Mp, 3) numpy, Mp divisible by `tile` (invalid at +1e9).
    blk_bbox: (NB, 8) numpy from build_sorted_cloud_host.

    Every tile appears at least once (hitless tiles get one entry pointing
    at the sentinel block NB — the drivers append a block of +1e9 points —
    so their output buffers are still initialized). The list is padded to
    the next power of two with copies of (last tile, NB), which are
    guaranteed no-ops.
    """
    import numpy as np

    c = np.asarray(centers, np.float32).reshape(-1, tile, 3)
    tmin, tmax = c.min(axis=1), c.max(axis=1)                  # (T, 3)
    lo = blk_bbox[None, :, :3] - tmax[:, None, :]
    hi = tmin[:, None, :] - blk_bbox[None, :, 3:6]
    gap = np.maximum(np.maximum(lo, hi), 0.0)
    hits = (gap * gap).sum(-1) < np.float32(radius) ** 2       # (T, NB)

    nb = blk_bbox.shape[0]
    t_idx, b_idx = np.nonzero(hits)                            # tile-sorted
    missing = np.nonzero(~hits.any(axis=1))[0]
    if missing.size:
        t_idx = np.concatenate([t_idx, missing])
        b_idx = np.concatenate([b_idx, np.full(missing.size, nb)])
        order = np.argsort(t_idx, kind="stable")
        t_idx, b_idx = t_idx[order], b_idx[order]
    s = t_idx.size
    if bucket:
        cap = 1 << max(3, (s - 1).bit_length())
        t_idx = np.concatenate(
            [t_idx, np.full(cap - s, t_idx[-1], t_idx.dtype)])
        b_idx = np.concatenate([b_idx, np.full(cap - s, nb, b_idx.dtype)])
    return t_idx.astype(np.int32), b_idx.astype(np.int32)


def _bq_csr_kernel(tile_of, blk_of, ctr_ref, ptsT_ref,
                   topx_ref, topy_ref, topz_ref, topk_ref, cnt_ref,
                   *, r2: float, tc: int, L: int, ns: int):
    k = pl.program_id(0)
    t = tile_of[k]
    prev = tile_of[jnp.maximum(k - 1, 0)]

    @pl.when(jnp.logical_or(k == 0, t != prev))
    def _init():
        _init_merge_buffers(topx_ref, topy_ref, topz_ref, topk_ref, cnt_ref,
                            tc, ns)

    _merge_block(ctr_ref, ptsT_ref, topx_ref, topy_ref, topz_ref,
                 topk_ref, cnt_ref, r2=r2, tc=tc, L=L, ns=ns)


@partial(jax.jit, static_argnames=("radius", "nsample", "block_size", "tile",
                                   "interpret"))
def _bq_csr_raw(sc_pts4: Array, centers: Array, tile_of: Array, blk_of: Array,
                radius: float, nsample: int, block_size: int = 256,
                tile: int = 128, interpret: Optional[bool] = None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m = centers.shape[0]
    L = block_size
    ns = nsample
    tc = tile
    pad = -m % tc
    centers_p = jnp.pad(centers.astype(jnp.float32), ((0, pad), (0, 0)),
                        constant_values=_FAR_CENTER)
    mp = m + pad
    ctr4 = jnp.concatenate(
        [centers_p, jnp.zeros((mp, 1), jnp.float32)], axis=1)
    # sentinel block NB: +1e9 points that can never fall in a real ball
    ptsT_ext = jnp.concatenate(
        [sc_pts4.T, jnp.full((4, L), _FAR, jnp.float32)], axis=1)
    r2 = float(radius) ** 2
    steps = tile_of.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((tc, 4), lambda k, tof, bof: (tof[k], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, L), lambda k, tof, bof: (0, bof[k]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            [pl.BlockSpec((tc, ns), lambda k, tof, bof: (tof[k], 0),
                          memory_space=pltpu.VMEM) for _ in range(4)]
            + [pl.BlockSpec((tc, 1), lambda k, tof, bof: (tof[k], 0),
                            memory_space=pltpu.VMEM)]),
    )
    topx, topy, topz, topk, cnt = pl.pallas_call(
        partial(_bq_csr_kernel, r2=r2, tc=tc, L=L, ns=ns),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((mp, ns), jnp.float32),
            jax.ShapeDtypeStruct((mp, ns), jnp.float32),
            jax.ShapeDtypeStruct((mp, ns), jnp.float32),
            jax.ShapeDtypeStruct((mp, ns), jnp.float32),
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(tile_of, blk_of, ctr4, ptsT_ext)
    top = jnp.stack([topx, topy, topz, topk], axis=-1)
    return top[:m], cnt[:m, 0]


def _bq_csr_kernel_t(tile_of, blk_of, ctrT_ref, pts_ref, ptsT_ref,
                     topx_ref, topy_ref, topz_ref, topk_ref, cnt_ref,
                     addx_ref, addy_ref, addz_ref, addk_ref, occ_ref,
                     *, r2: float, tc: int, L: int, ns: int):
    k = pl.program_id(0)
    t = tile_of[k]
    prev = tile_of[jnp.maximum(k - 1, 0)]

    @pl.when(jnp.logical_or(k == 0, t != prev))
    def _init():
        _init_merge_buffers_t(topx_ref, topy_ref, topz_ref, topk_ref,
                              cnt_ref, tc, ns)

    _merge_block_t(ctrT_ref[...], pts_ref[...], ptsT_ref[...],
                   topx_ref, topy_ref, topz_ref, topk_ref, cnt_ref,
                   addx_ref, addy_ref, addz_ref, addk_ref, occ_ref,
                   None, r2=r2, tc=tc, L=L, ns=ns)


@partial(jax.jit, static_argnames=("radius", "nsample", "block_size", "tile",
                                   "interpret"))
def _bq_csr_raw_t(sc_pts4: Array, centers: Array, tile_of: Array,
                  blk_of: Array, radius: float, nsample: int,
                  block_size: int = 256, tile: int = 128,
                  interpret: Optional[bool] = None):
    """Transposed-merge CSR driver — same contract as _bq_csr_raw."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m = centers.shape[0]
    L = block_size
    ns = nsample
    tc = tile
    pad = -m % tc
    centers_p = jnp.pad(centers.astype(jnp.float32), ((0, pad), (0, 0)),
                        constant_values=_FAR_CENTER)
    mp = m + pad
    tiles = mp // tc
    ctrT = jnp.concatenate(
        [centers_p.T, jnp.zeros((5, mp), jnp.float32)], axis=0)   # (8, Mp)
    # sentinel block NB: +1e9 points that can never fall in a real ball
    pts_ext = jnp.concatenate(
        [sc_pts4, jnp.full((L, 4), _FAR, jnp.float32)], axis=0)   # (Np+L, 4)
    ptsT_ext = jnp.concatenate(
        [pts_ext.T, jnp.ones((1, pts_ext.shape[0]), jnp.float32),
         jnp.zeros((3, pts_ext.shape[0]), jnp.float32)], axis=0)  # (8, Np+L)
    r2 = float(radius) ** 2
    steps = tile_of.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((8, tc), lambda k, tof, bof: (0, tof[k]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 4), lambda k, tof, bof: (bof[k], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, L), lambda k, tof, bof: (0, bof[k]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            [pl.BlockSpec((ns, tc), lambda k, tof, bof: (tof[k], 0),
                          memory_space=pltpu.VMEM) for _ in range(4)]
            + [pl.BlockSpec((8, tc), lambda k, tof, bof: (tof[k], 0),
                            memory_space=pltpu.VMEM)]),
        scratch_shapes=[pltpu.VMEM((ns, tc), jnp.float32)
                        for _ in range(5)],
    )
    topx, topy, topz, topk, cnt = pl.pallas_call(
        partial(_bq_csr_kernel_t, r2=r2, tc=tc, L=L, ns=ns),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((tiles * ns, tc), jnp.float32),
            jax.ShapeDtypeStruct((tiles * ns, tc), jnp.float32),
            jax.ShapeDtypeStruct((tiles * ns, tc), jnp.float32),
            jax.ShapeDtypeStruct((tiles * ns, tc), jnp.float32),
            jax.ShapeDtypeStruct((tiles * 8, tc), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(tile_of, blk_of, ctrT, pts_ext, ptsT_ext)

    def untranspose(plane):
        return jnp.swapaxes(plane.reshape(tiles, ns, tc), 1, 2).reshape(
            mp, ns)[:m]

    top = jnp.stack([untranspose(topx), untranspose(topy),
                     untranspose(topz), untranspose(topk)], axis=-1)
    cnt_rows = cnt.reshape(tiles, 8, tc)[:, 0].reshape(mp)[:m]
    return top, cnt_rows


def ball_query_grouped_csr(
    sc: SortedCloud, centers: Array, tile_of: Array, blk_of: Array,
    radius: float, nsample: int, block_size: int = 256, tile: int = 128,
    interpret: Optional[bool] = None,
) -> Tuple[Array, Array, Array]:
    """ball_query_grouped_sorted with a precomputed host-side hit list
    (build_hit_csr_host) — identical outputs, no skipped grid steps."""
    raw = _bq_csr_raw_t if _USE_TRANSPOSED_MERGE else _bq_csr_raw
    top, cnt_raw = raw(sc.pts4, centers, tile_of, blk_of,
                       float(radius), nsample,
                       block_size=block_size, tile=tile,
                       interpret=interpret)
    return _finish_grouped(top, cnt_raw, centers, nsample)


def _ballmax_csr_kernel(tile_of, blk_of, ctr_ref, ptsT_ref, out_ref, scr_ref,
                        *, r2: float, tc: int, L: int, steps: int):
    k = pl.program_id(0)
    t = tile_of[k]
    prev = tile_of[jnp.maximum(k - 1, 0)]
    nxt = tile_of[jnp.minimum(k + 1, steps - 1)]

    @pl.when(jnp.logical_or(k == 0, t != prev))
    def _init():
        _init_ballmax(ctr_ref, scr_ref)

    _ballmax_block(ctr_ref, ptsT_ref[...], scr_ref, r2=r2, tc=tc, L=L)

    @pl.when(jnp.logical_or(k == steps - 1, nxt != t))
    def _finalize():
        _finish_ballmax(scr_ref, out_ref, tc)


@partial(jax.jit, static_argnames=("radius", "block_size", "tile",
                                   "interpret"))
def ball_max_csr(sc_pts4: Array, values: Array, tile_of: Array,
                 blk_of: Array, radius: float, block_size: int = 256,
                 tile: int = 128,
                 interpret: Optional[bool] = None) -> Array:
    """ball_max_sorted with a precomputed host-side hit list."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    np_ = sc_pts4.shape[0]
    L = block_size
    tc = tile
    pad = -np_ % tc
    centers_p = jnp.pad(sc_pts4[:, :3], ((0, pad), (0, 0)),
                        constant_values=_FAR_CENTER)
    mp = np_ + pad
    tiles = mp // tc
    ctr4 = jnp.concatenate(
        [centers_p, jnp.zeros((mp, 1), jnp.float32)], axis=1)
    r2 = float(radius) ** 2
    # block-major transposed payload (rows x/y/z/val — see ball_max_sorted),
    # with a sentinel block NB appended: +1e9 coords, -1e30 value — never wins
    ptsT = jnp.concatenate(
        [jnp.concatenate([sc_pts4[:, :3].T,
                          values.astype(jnp.float32)[None, :]], axis=0),
         jnp.concatenate([jnp.full((3, L), _FAR, jnp.float32),
                          jnp.full((1, L), -_BIG, jnp.float32)], axis=0)],
        axis=1)                                              # (4, Np + L)
    ptsT = jnp.concatenate(
        [ptsT, jnp.zeros((4, ptsT.shape[1]), jnp.float32)], axis=0)
    ptsT_blocks = _block_major_rows(ptsT, L)
    steps = tile_of.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((tc, 4), lambda k, tof, bof: (tof[k], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, L), lambda k, tof, bof: (bof[k], 0),
                         memory_space=pltpu.VMEM),
        ],
        # per-tile max in row 0 of an (8, tc) block (see _ballmax_kernel)
        out_specs=pl.BlockSpec((8, tc), lambda k, tof, bof: (tof[k], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tc, 1), jnp.float32)],
    )
    out = pl.pallas_call(
        partial(_ballmax_csr_kernel, r2=r2, tc=tc, L=L, steps=steps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tiles * 8, tc), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(tile_of, blk_of, ctr4, ptsT_blocks)
    return out.reshape(tiles, 8, tc)[:, 0].reshape(mp)[:np_]
