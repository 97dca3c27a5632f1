"""Fused cluster→descriptor serving kernel.

The production descriptor-serving path (BASELINE.md config 2: batches of
64-point clusters → 32-D descriptors). XLA executes the detector+descriptor
towers layer by layer, writing every activation to HBM — ~3 GB of traffic
per 7500 clusters, ~6x the compute time. This Pallas kernel runs the ENTIRE
forward for a tile of clusters inside VMEM:

    in-ball selection (first-nsample, repeat-pad, nearest-fallback — the
    exact ball-query semantics, via a triangular-matmul rank + per-slot
    one-hot selection matmul) → detector MLP → maxpool → post-MLP →
    attention/orientation heads → z-rotation canonicalization → descriptor
    MLP → pool/concat/mid → pool → final projection → L2 normalize

with eval-mode batch norm FOLDED into the matmul weights (BN(Wx+b) is an
affine map, so W' = W·γ/√(σ²+ε), b' = (b−μ)·γ/√(σ²+ε)+β). HBM traffic per
tile: cluster coords in, descriptor+attention out — nothing else.

Scope: keypoint at the cluster origin (the validator/bench/serving layout),
cluster size == nsample, eval mode. The general path stays in
models/feat3dnet.py; `describe_clusters` picks automatically.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from feat3dnet_tpu.config import ModelConfig
from feat3dnet_tpu.ops.hash_grid import _transpose_cols_to_rows

Array = jax.Array


def _fold(params, stats, name, eps):
    """Fold eval-mode BatchNorm into the preceding Dense: BN(Wx+b) with
    running stats is affine, so W' = W·γ·rsqrt(σ²+ε), b' = (b−μ)·γ·rsqrt(σ²+ε)+β."""
    k = params[name]["conv2d"]["kernel"]
    b = params[name]["conv2d"]["bias"]
    scale = params[name]["bn"]["scale"] * jax.lax.rsqrt(stats[name]["bn"]["var"] + eps)
    return k * scale[None, :], (b - stats[name]["bn"]["mean"]) * scale + params[name]["bn"]["bias"]


def folded_weights(variables: Dict[str, Any], cfg: ModelConfig) -> List[Array]:
    """Flatten the variable tree into the kernel's weight list (BN folded).

    Order: detector convs, detector post convs, attention, orientation,
    descriptor convs, conv_mid_0, conv_post_0.
    """
    p, s = variables["params"], variables["batch_stats"]
    eps = cfg.bn_epsilon
    out: List[Array] = []
    det_p, det_s = p["detection"], s["detection"]
    for i in range(len(cfg.detector_mlp)):
        out.extend(_fold(det_p, det_s, f"conv{i}", eps))
    for i in range(len(cfg.detector_mlp2)):
        out.extend(_fold(det_p, det_s, f"conv_post_{i}", eps))
    out.extend([det_p["attention"]["kernel"], det_p["attention"]["bias"]])
    out.extend([det_p["orientation"]["kernel"], det_p["orientation"]["bias"]])
    desc_p, desc_s = p["description"], s["description"]
    for i in range(len(cfg.descriptor_mlp)):
        out.extend(_fold(desc_p, desc_s, f"conv{i}", eps))
    out.extend(_fold(desc_p, desc_s, "conv_mid_0", eps))
    out.extend(_fold(desc_p, desc_s, "conv_post_0", eps))
    return [jnp.asarray(w, jnp.float32) for w in out]


def detector_weights_unfolded(variables: Dict[str, Any],
                              cfg: ModelConfig) -> List[Array]:
    """Detector weights WITHOUT BN folding, for the XLA-parity detect
    kernels (`unfolded=True`).

    Folding multiplies W by γ·rsqrt(σ²+ε) BEFORE the MXU's bf16 operand
    rounding, so folded-kernel products round differently from the XLA
    towers' (unfolded Dense → BatchNorm) — the measured ~1e-2 serving
    envelope. This variant ships the raw Dense (kernel, bias) plus flax's
    eval-mode BN constants per ConvBN layer — mean μ and
    mul = rsqrt(σ²+ε)·γ, computed HERE with flax's exact op order — so the
    kernel can replay y = (Wx + b − μ)·mul + β with the same per-op
    rounding as the model path.

    Order: per detector conv / post conv: (kernel, bias, mean, mul,
    bn_bias); then attention (kernel, bias), orientation (kernel, bias).
    """
    p, s = variables["params"], variables["batch_stats"]
    eps = cfg.bn_epsilon
    out: List[Array] = []
    det_p, det_s = p["detection"], s["detection"]
    names = ([f"conv{i}" for i in range(len(cfg.detector_mlp))]
             + [f"conv_post_{i}" for i in range(len(cfg.detector_mlp2))])
    for name in names:
        mul = jax.lax.rsqrt(det_s[name]["bn"]["var"] + eps) \
            * det_p[name]["bn"]["scale"]          # flax: rsqrt first, then ·γ
        out.extend([det_p[name]["conv2d"]["kernel"],
                    det_p[name]["conv2d"]["bias"],
                    det_s[name]["bn"]["mean"], mul,
                    det_p[name]["bn"]["bias"]])
    out.extend([det_p["attention"]["kernel"], det_p["attention"]["bias"]])
    out.extend([det_p["orientation"]["kernel"], det_p["orientation"]["bias"]])
    return [jnp.asarray(w, jnp.float32) for w in out]


def transpose_unfolded_detector(weights: List[Array]) -> List[Array]:
    """detector_weights_unfolded() -> the transposed (planes/kernel_t)
    layout: kernels (Cin, Cout) -> (Cout, Cin) with K=3 input layers
    zero-padded to K=8; every per-channel vector (bias, mean, mul,
    bn_bias) -> a (Cout, 1) column. Layout: (len - 4) leading entries are
    5-tuples per ConvBN layer, the trailing 4 are the two head (k, b)
    pairs."""
    out: List[Array] = []
    n_conv_entries = len(weights) - 4
    assert n_conv_entries % 5 == 0, "unexpected unfolded-weights layout"
    i = 0
    while i < len(weights):
        k = jnp.transpose(weights[i])
        if k.shape[1] == 3:
            k = jnp.pad(k, ((0, 0), (0, 5)))
        out.append(k)
        n_vec = 4 if i < n_conv_entries else 1
        for v in weights[i + 1:i + 1 + n_vec]:
            out.append(v[:, None])
        i += 1 + n_vec
    return out


# ---------------------------------------------------------------------------
# Lane packing: the tower's K=3 input layers and K=32/64 mid layers leave
# most of the MXU's 128 contraction lanes idle (BENCHMARKS.md roofline —
# pass count, not FLOPs, binds this kernel). Packing p clusters per pass
# multiplies K and C by p while dividing rows by p, filling the lanes.
#
# Layout transforms use 2-D concats only, in HALVING/DOUBLING steps:
#   pack step    (R, C) -> (R/2, 2C): lane-concat of the two row halves —
#     always Mosaic-legal (lane offsets may differ ON the concat dim);
#   unpack step  (R, 2C) -> (2R, C): row-concat of the two column halves —
#     Mosaic-legal ONLY when C % 128 == 0 (a non-128-aligned column slice
#     carries a lane offset, and tpu.concatenate rejects offset mismatches
#     on non-concat dimensions — observed on the real chip; interpret mode
#     accepts it).
# pack∘unpack is the identity, each step inverts the previous, and every
# row-range stays cluster-major/slot-minor (splits land on cluster
# boundaries), so per-point MLP layers run packed against block-diagonal
# weights (kron(I_p, W) — zero blocks add exact +0.0, keeping results
# bit-equal) and pools see the original cluster order after unpacking.
# When the final unpack of a tower is NOT alignment-legal (descriptor
# tower: C=64 blocks), the tower ends at p=2 and the masked pool + concat
# run in the packed-2 layout, where the concatenated [pointwise|pooled]
# blocks are 128 wide and the last unpack becomes legal (see _kernel).
# Plan: per layer, the p ∈ {1,2,4,8} minimizing 128×128 MXU tile passes
# among alignment-reachable transitions (ties prefer the previous p).
# ---------------------------------------------------------------------------


def _mxu_passes(rows: int, k: int, c: int, p: int) -> int:
    if rows % p:
        return 1 << 30
    return (-(-rows // p // 128)) * (-(-p * k // 128)) * (-(-p * c // 128))


def _can_transition(p_from: int, p_to: int, c_from: int) -> bool:
    """Alignment feasibility of relayout between layers (width p_from·c_from
    down-steps must keep 128-aligned halves); packing up is always legal."""
    if p_to >= p_from:
        return True
    width = p_from * c_from
    while p_from > p_to:
        width //= 2
        p_from //= 2
        if width % 128:
            return False
    return True


def _plan_packs(rows: int, dims, tail_ps=(1,)) -> tuple:
    """dims: sequence of (K, C) per layer -> per-layer pack factors, chosen
    to minimize MXU passes subject to alignment-legal transitions, ending
    at a tail pack level in `tail_ps` (the kernel handles tail p=2 for the
    descriptor tower). Returns (plan..., tail_p)."""
    plan = []
    prev, prev_c = 1, None
    for k, c in dims:
        cands = [p for p in (1, 2, 4, 8)
                 if prev_c is None or _can_transition(prev, p, prev_c)]
        best = min(cands, key=lambda p: (_mxu_passes(rows, k, c, p),
                                         p != prev, p))
        plan.append(best)
        prev, prev_c = best, c
    # final relayout: smallest tail level reachable with aligned unpacks
    tail = prev
    for p in sorted(tail_ps):
        if _can_transition(prev, p, prev_c or 1):
            tail = p
            break
    if tail not in tail_ps:     # no legal tail layout — don't pack at all
        return (1,) * len(dims), 1
    return tuple(plan), tail


def _pack_step(x):
    """(R, C) -> (R/2, 2C): lane-concat of the two row halves."""
    h = x.shape[0] // 2
    return jnp.concatenate([x[:h], x[h:]], axis=1)


def _unpack_step(x):
    """(R, 2C) -> (2R, C): row-concat of the two column halves. Caller
    must ensure C % 128 == 0 (or full-width) for Mosaic."""
    c = x.shape[1] // 2
    return jnp.concatenate([x[:, :c], x[:, c:]], axis=0)


def _relayout(x, p_from: int, p_to: int):
    """Move between pack levels via halving/doubling steps."""
    while p_from < p_to:
        x = _pack_step(x)
        p_from *= 2
    while p_from > p_to:
        x = _unpack_step(x)
        p_from //= 2
    return x


def _mlp_dims(cfg: ModelConfig):
    """(K, C) chains for the two packed towers (detector, descriptor)."""
    det, desc = [], []
    k = 3
    for c in cfg.detector_mlp:
        det.append((k, c))
        k = c
    k = 3
    for c in cfg.descriptor_mlp:
        desc.append((k, c))
        k = c
    return tuple(det), tuple(desc)


def pack_weights_for_plan(weights: List[Array], cfg: ModelConfig,
                          det_plan: tuple, desc_plan: tuple) -> List[Array]:
    """Block-diagonalize the per-point tower weights per the pack plan.

    Walks the folded_weights() list layout (detector convs | detector post
    convs | attention | orientation | descriptor convs | conv_mid_0 |
    conv_post_0) and replaces each planned conv's (K, C) kernel with
    kron(I_p, K) and its bias with tile(b, p). Exact: the zero off-blocks
    add exact zeros in the f32 accumulator.
    """
    out = list(weights)

    def pack_at(i, p):
        if p > 1:
            k, b = out[2 * i], out[2 * i + 1]
            out[2 * i] = jnp.kron(jnp.eye(p, dtype=k.dtype), k)
            out[2 * i + 1] = jnp.tile(b, p)

    for li, p in enumerate(det_plan):
        pack_at(li, p)
    desc_base = (len(cfg.detector_mlp) + len(cfg.detector_mlp2) + 2)
    for li, p in enumerate(desc_plan):
        pack_at(desc_base + li, p)
    return out


# NOTE (recorded negative): a stride-2 "tree pool" over the cluster-major
# flat layout (jnp.maximum(h[0::2], h[1::2]) repeated log2(ns) times) is
# bit-exact in interpret mode but Mosaic REJECTS strided sublane slicing on
# the real chip — per-cluster pools in cluster-major layout must stay rank-3
# maxes. The slot-MAJOR formulation (_kernel_2d below) gets contiguous-half
# pools (`_half_max`) instead, which Mosaic accepts.


def _kernel(clusters_ref, *refs, cfg: ModelConfig, tc: int, ns: int,
            bf16_matmul: bool = False, vpu_k3: bool = False,
            bf16_act: bool = False,
            det_plan: tuple = None, desc_plan: tuple = None,
            desc_tail: int = 1):
    weights = refs[:-2]
    desc_ref, att_ref = refs[-2], refs[-1]
    widx = 0
    # bf16_act: keep tower ACTIVATIONS (relu outputs, pools, masks) in
    # bf16 — halves VPU lane work and VMEM traffic vs bf16_matmul alone,
    # which only narrows the matmul inputs. Heads, normalization, and all
    # exactness-sensitive selection logic stay f32. Approximate (descriptor
    # cosine vs f32 measured in tests) — off by default.
    act_t = jnp.bfloat16 if bf16_act else jnp.float32

    def next_w():
        nonlocal widx
        k, b = weights[widx][...], weights[widx + 1][...]
        widx += 2
        if bf16_matmul or bf16_act:
            k = k.astype(jnp.bfloat16)
        return k, b

    def mm(a, k):
        # matmul with optional bf16 inputs, always f32 accumulate
        if bf16_matmul or bf16_act:
            a = a.astype(jnp.bfloat16)
        return jnp.dot(a, k, preferred_element_type=jnp.float32)

    def mm_k3(a, k):
        # (R, 3) @ (3, C) as three broadcast FMAs on the VPU instead of a
        # K=3 MXU pass. Measured SLOWER on v5e (1.73 -> 1.40 M desc/s,
        # benchmarks/sweep_fused.py) — the VPU is already loaded with the
        # masks/pools/rotation — so OFF by default; kept as the recorded
        # negative result.
        if not vpu_k3:
            return mm(a, k)
        kf = k.astype(jnp.float32)
        return (a[:, 0:1] * kf[0:1, :] + a[:, 1:2] * kf[1:2, :]
                + a[:, 2:3] * kf[2:3, :])

    r2 = jnp.float32(cfg.base_scale) ** 2
    inv_r = 1.0 / jnp.float32(cfg.base_scale)

    pts = clusters_ref[...]                                   # (TC, ns, 3)

    # ---- ball-query membership around the origin keypoint ---------------
    # The towers consume points ONLY through slot maxpools, which are
    # set-invariant: the reference's first-nsample selection (here cluster
    # size == nsample, so selection == membership) and repeat-padding
    # (duplicate rows never change a max) reduce EXACTLY to an in-ball
    # mask applied at each pool. No rank/one-hot permutation work — the
    # earlier selection formulation's batched one-hot dots were the
    # kernel's VPU bottleneck (bf16 matmuls measured throughput-neutral).
    d2 = jnp.sum(pts * pts, axis=-1)                          # (TC, ns)
    in_ball = (d2 < r2).astype(jnp.float32)
    cnt = jnp.sum(in_ball, axis=-1, keepdims=True)            # (TC, 1)
    # empty balls (cnt == 0) fall back to the FIRST index attaining the
    # min distance (reference nearest-point fallback): first-tie via an
    # inclusive prefix count (upper-triangular ones matmul, MXU)
    tri = (jax.lax.broadcasted_iota(jnp.int32, (ns, ns), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (ns, ns), 1)).astype(jnp.float32)
    nearest_best = jnp.min(d2, axis=-1, keepdims=True)
    tie = (d2 <= nearest_best).astype(jnp.float32)            # (TC, ns)
    tie_rank = jnp.dot(tie, tri, preferred_element_type=jnp.float32)
    near_onehot = tie * (jnp.abs(tie_rank - 1.0) < 0.5).astype(jnp.float32)
    empty = (cnt < 0.5).astype(jnp.float32)                   # (TC, 1)
    mask = jnp.minimum(in_ball + empty * near_onehot, 1.0)    # (TC, ns)

    grouped = pts * inv_r                                     # (TC, ns, 3)
    flat = grouped.reshape(tc * ns, 3)

    def run_packed_mlp(h, plan, tail):
        """Per-point MLP chain with lane packing (weights pre-blocked by
        pack_weights_for_plan). Returns the activation relayouted to pack
        level `tail` (tail=1: flat (R, C), original cluster order)."""
        p_prev = 1
        for p in plan:
            if p != p_prev:
                h = _relayout(h, p_prev, p)
            k, b = next_w()
            op = mm_k3 if (p == 1 and h.shape[1] == 3) else mm
            h = jnp.maximum(op(h, k) + b, 0.0).astype(act_t)
            p_prev = p
        return _relayout(h, p_prev, tail)

    # ---- detector tower --------------------------------------------------
    h = run_packed_mlp(flat, det_plan, 1)
    # masked slot pool: ReLU outputs are >= 0 and every ball has >= 1
    # member, so zeroing masked slots is exact
    h = jnp.max(h.reshape(tc, ns, -1) * mask[:, :, None].astype(act_t),
                axis=1)  # (TC, 256)
    for _ in range(len(cfg.detector_mlp2)):
        k, b = next_w()
        h = jnp.maximum(mm(h, k) + b, 0.0).astype(act_t)
    ka, ba = next_w()
    att = jax.nn.softplus(mm(h, ka) + ba)  # (TC, 1)
    ko, bo = next_w()
    ori = mm(h, ko) + bo                   # (TC, 2)
    ori = ori * jax.lax.rsqrt(jnp.maximum(jnp.sum(ori * ori, -1, keepdims=True), 1e-8))
    cos_t, sin_t = ori[:, 0:1], ori[:, 1:2]                   # (TC, 1)

    # ---- canonicalize + descriptor tower ---------------------------------
    x, y, z = grouped[..., 0], grouped[..., 1], grouped[..., 2]   # (TC, ns)
    xr = x * cos_t - y * sin_t
    yr = x * sin_t + y * cos_t
    rot = jnp.stack([xr, yr, z], axis=-1).reshape(tc * ns, 3)

    d = run_packed_mlp(rot, desc_plan, desc_tail)
    if desc_tail == 1:
        c_pts = d.reshape(tc, ns, -1)
        pooled = jnp.max(c_pts * mask[:, :, None].astype(act_t), axis=1,
                         keepdims=True)
        cat = jnp.concatenate(
            [c_pts, jnp.broadcast_to(pooled, c_pts.shape)], axis=-1)
        cat_flat = cat.reshape(tc * ns, -1)                   # (R, 2C)
    else:
        # packed-2 tail (the 64-wide final unpack is not Mosaic-legal):
        # masked pool + [pointwise|pooled] concat in the packed layout,
        # where each cluster's cat block is 2C=128 wide — so the LAST
        # unpack step is alignment-legal and restores the flat order.
        assert desc_tail == 2
        cw = d.shape[1] // 2                                  # = C
        mask_flat = jnp.broadcast_to(
            mask[:, :, None], (tc, ns, cw)).reshape(tc * ns, cw)
        mask_p2 = _pack_step(mask_flat).astype(act_t)         # (R/2, 2C)
        pooled2 = jnp.max((d * mask_p2).reshape(tc // 2, ns, 2 * cw),
                          axis=1)                             # (tc/2, 2C)
        poolb = jnp.broadcast_to(
            pooled2[:, None, :],
            (tc // 2, ns, 2 * cw)).reshape(tc * ns // 2, 2 * cw)
        cat_p2 = jnp.concatenate(
            [d[:, :cw], poolb[:, :cw], d[:, cw:], poolb[:, cw:]],
            axis=1)                                           # (R/2, 4C)
        cat_flat = _unpack_step(cat_p2)                       # (R, 2C)
    k, b = next_w()                                           # conv_mid_0: BN, NO relu
    m = mm(cat_flat, k) + b
    # conv_mid_0 has no ReLU, so masked slots are excluded with -inf-like
    # sentinels rather than zeros
    m = m.reshape(tc, ns, -1).astype(act_t)
    m = jnp.where(mask[:, :, None] > 0.5, m, act_t(-1.0e30))
    m = jnp.max(m, axis=1)                                    # (TC, 128)
    k, b = next_w()                                           # conv_post_0: BN, NO relu
    out = mm(m, k) + b                                        # (TC, D)
    out = out * jax.lax.rsqrt(jnp.maximum(jnp.sum(out * out, -1, keepdims=True), 1e-8))

    desc_ref[...] = out
    att_ref[...] = att


def _half_max(h, rows_out: int):
    """Reduce a slot-major (S·G, C) array to (G, C) by maxing contiguous
    halves: h[:S·G/2] pairs (slot s, group g) with (slot s+S/2, group g).
    Plain sublane slicing — no strides, no rank-3 reductions for Mosaic to
    unroll."""
    while h.shape[0] > rows_out:
        half = h.shape[0] // 2
        h = jnp.maximum(h[:half], h[half:])
    return h


def _double_rows(x, reps: int):
    """Broadcast a (G, C) per-cluster array to slot-major rows (S·G, C) by
    log2(S) contiguous self-concats — in slot-major layout the cluster→row
    broadcast is exact block REPETITION, so no one-hot matmul (which would
    round through bf16 at default MXU precision) and no rank-3 broadcast
    (which Mosaic unrolls) is needed."""
    while reps > 1:
        x = jnp.concatenate([x, x], axis=0)
        reps //= 2
    return x


def _tourney_min_first(val, idx, rows_out: int):
    """Per-group lexicographic min over slots of a slot-major (S·G, 1)
    column: returns the value AND the smallest slot index attaining it
    (the reference ball query's first-tie nearest fallback). Explicit
    (val, idx) tie-break at every level — 'prefer top half' alone is not
    first-index across levels."""
    while val.shape[0] > rows_out:
        half = val.shape[0] // 2
        tv, bv = val[:half], val[half:]
        ti, bi = idx[:half], idx[half:]
        take = (tv < bv) | ((tv == bv) & (ti <= bi))
        val = jnp.where(take, tv, bv)
        idx = jnp.where(take, ti, bi)
    return val, idx


def _membership_mask_2d(pts, tc: int, ns: int, r2):
    """Slot-major ball-query membership: in-ball, plus the empty-ball
    nearest fallback (FIRST slot attaining the min distance — the
    reference's tie order). pts (R, 3) slot-major rows -> (R, 1) 0/1 mask.
    Shared by the serving kernel and the detector-only kernel so the
    subtle tie/fallback algebra lives in exactly one place."""
    R = tc * ns
    sid = (jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
           // tc).astype(jnp.float32)                         # slot id/row
    d2 = jnp.sum(pts * pts, axis=1, keepdims=True)            # (R, 1)
    in_ball = (d2 < r2).astype(jnp.float32)                   # (R, 1)
    empty_c = 1.0 - _half_max(in_ball, tc)                    # (TC, 1)
    _, win_idx = _tourney_min_first(d2, sid, tc)              # (TC, 1)
    near = (jnp.abs(sid - _double_rows(win_idx, ns)) < 0.5
            ).astype(jnp.float32)
    return jnp.minimum(in_ball + _double_rows(empty_c, ns) * near, 1.0)


def _detector_heads_2d(flat_n, mask_r, next_w, mm, cfg: ModelConfig,
                       tc: int, act_t, next_bn=None):
    """Detector tower + attention/orientation heads on slot-major rows:
    (R, 3) normalized points + (R, 1) mask -> (att (TC, 1), ori (TC, 2)
    normalized (cos, sin)). Shared tower algebra of `_kernel_2d` and
    `_detect_kernel_2d`.

    next_bn (unfolded mode): per conv layer yields (μ, mul, β) rows and
    the layer replays flax eval BatchNorm after the raw Dense —
    y = (Wx + b − μ)·mul + β — instead of consuming BN-folded weights
    (XLA-parity rounding; see detector_weights_unfolded)."""

    def conv(h):
        k, b = next_w()
        v = mm(h, k) + b
        if next_bn is not None:
            mu, mul, beta = next_bn()
            v = (v - mu) * mul + beta
        return jnp.maximum(v, 0.0).astype(act_t)

    h = flat_n
    for _ in range(len(cfg.detector_mlp)):
        h = conv(h)
    h = _half_max(h * mask_r.astype(act_t), tc)               # (TC, C)
    for _ in range(len(cfg.detector_mlp2)):
        h = conv(h)
    ka, ba = next_w()
    att = jax.nn.softplus(mm(h, ka) + ba)                     # (TC, 1)
    ko, bo = next_w()
    ori = mm(h, ko) + bo                                      # (TC, 2)
    ori = ori * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(ori * ori, -1, keepdims=True), 1e-8))
    return att, ori


def _ablate_kernel_2d(flat_ref, *refs, cfg: ModelConfig, tc: int, ns: int,
                      ablate: str):
    """BENCH-ONLY ablation bodies for the serving-kernel time decomposition
    (benchmarks/probe_serving_ablation.py). Outputs are NOT descriptors.

    ablate='stream': read the tile, write the outputs — the DMA +
      per-grid-step sequencing floor, no compute.
    ablate='matmul': every matmul of the real tower at its exact operand
      shapes (incl. the [pointwise|pooled]-width concat feeding conv_mid),
      with the entire VPU stream removed: no membership chain, no relu, no
      masks, no pools (slot pools become row slices), no rotation, no
      softplus/normalize. full − matmul ≈ the VPU elementwise stream;
      matmul − stream ≈ the MXU passes + their operand staging.
    """
    weights = refs[:-2]
    desc_ref, att_ref = refs[-2], refs[-1]
    R = tc * ns
    pts = flat_ref[...].reshape(R, 3)

    if ablate == "stream":
        desc_ref[...] = jnp.broadcast_to(pts[:tc, 0:1], (tc, cfg.feature_dim))
        att_ref[...] = pts[:tc, 1:2]
        return

    assert ablate == "matmul"
    widx = 0

    def next_w():
        nonlocal widx
        k, b = weights[widx][...], weights[widx + 1][...]
        widx += 2
        return k, b

    def mm(a, k):
        return jnp.dot(a, k, preferred_element_type=jnp.float32)

    h = pts
    for _ in range(len(cfg.detector_mlp)):
        k, b = next_w()
        h = mm(h, k) + b
    h = h[:tc]                                 # pool -> slice (no VPU max tree)
    for _ in range(len(cfg.detector_mlp2)):
        k, b = next_w()
        h = mm(h, k) + b
    ka, ba = next_w()
    att = mm(h, ka) + ba                                       # (TC, 1)
    ko, bo = next_w()
    ori = mm(h, ko) + bo                                       # (TC, 2)

    d = pts
    for _ in range(len(cfg.descriptor_mlp)):
        k, b = next_w()
        d = mm(d, k) + b
    cat = jnp.concatenate([d, d], axis=1)      # same width as [pointwise|pooled]
    k, b = next_w()
    m = mm(cat, k) + b
    m = m[:tc]
    k, b = next_w()
    out = mm(m, k) + b                                         # (TC, D)
    desc_ref[...] = out
    att_ref[...] = att + ori[:, 0:1] * 1e-30   # keep the ori matmul live


def _kernel_2d(flat_ref, *refs, cfg: ModelConfig, tc: int, ns: int,
               bf16_matmul: bool = False, bf16_act: bool = False,
               hoist_mask: bool = False):
    """Fully 2-D slot-major formulation of `_kernel` (see
    fused_describe_clusters_2d). Rows are (slot-major) point rows: row
    r = slot (r // tc), cluster (r % tc). Every op is a 2-D elementwise,
    a sublane-half reduction, or a matmul — nothing rank-3 for Mosaic to
    unroll into per-cluster/per-slot sequential vector ops.

    hoist_mask: the in-ball/nearest-fallback mask arrives as a second
    input (computed by XLA outside — it depends only on the points, not
    the weights) and flat_ref is already radius-normalized. Saves the
    whole membership chain (~25 ops on (R, 1) columns, each padded to a
    full 128-lane vreg) from the kernel's VPU stream; bit-exact (the mask
    is the same 0.0/1.0 values either way)."""
    if hoist_mask:
        mask_ref, refs = refs[0], refs[1:]
    weights = refs[:-2]
    desc_ref, att_ref = refs[-2], refs[-1]
    widx = 0
    act_t = jnp.bfloat16 if bf16_act else jnp.float32

    def next_w():
        nonlocal widx
        k, b = weights[widx][...], weights[widx + 1][...]
        widx += 2
        if bf16_matmul or bf16_act:
            k = k.astype(jnp.bfloat16)
        return k, b

    def mm(a, k):
        if bf16_matmul or bf16_act:
            a = a.astype(jnp.bfloat16)
        return jnp.dot(a, k, preferred_element_type=jnp.float32)

    r2 = jnp.float32(cfg.base_scale) ** 2
    inv_r = 1.0 / jnp.float32(cfg.base_scale)
    R = tc * ns

    def bcast(x):                                             # (TC, C) -> (R, C)
        return _double_rows(x, ns)

    if hoist_mask:
        flat_n = flat_ref[...].reshape(R, 3)   # already radius-normalized
        mask_r = mask_ref[...].reshape(R, 1)
    else:
        pts = flat_ref[...].reshape(R, 3)      # slot-major point rows
        mask_r = _membership_mask_2d(pts, tc, ns, r2)         # (R, 1)
        flat_n = pts * inv_r

    att, ori = _detector_heads_2d(flat_n, mask_r, next_w, mm, cfg, tc, act_t)

    # ---- canonicalize + descriptor tower ---------------------------------
    c_r = bcast(ori[:, 0:1])                                  # (R, 1)
    s_r = bcast(ori[:, 1:2])
    x, y, z = flat_n[:, 0:1], flat_n[:, 1:2], flat_n[:, 2:3]
    rot = jnp.concatenate([x * c_r - y * s_r, x * s_r + y * c_r, z], axis=1)

    d = rot
    for _ in range(len(cfg.descriptor_mlp)):
        k, b = next_w()
        d = jnp.maximum(mm(d, k) + b, 0.0).astype(act_t)
    pooled = _half_max(d * mask_r.astype(act_t), tc)          # (TC, C)
    cat = jnp.concatenate([d, bcast(pooled).astype(act_t)], axis=1)
    k, b = next_w()                                           # conv_mid_0: BN, NO relu
    m = mm(cat, k) + b
    m = jnp.where(mask_r > 0.5, m.astype(act_t), act_t(-1.0e30))
    m = _half_max(m, tc)                                      # (TC, 128)
    k, b = next_w()                                           # conv_post_0
    out = mm(m, k) + b                                        # (TC, D)
    out = out * jax.lax.rsqrt(jnp.maximum(jnp.sum(out * out, -1, keepdims=True), 1e-8))

    desc_ref[...] = out
    att_ref[...] = att


@partial(jax.jit, static_argnames=("cfg", "tile", "bf16_matmul", "bf16_act",
                                   "hoist_mask", "interpret", "ablate",
                                   "parallel_grid", "slot_major_input"))
def fused_describe_clusters_2d(weights: List[Array], clusters: Array,
                               cfg: ModelConfig, tile: int = 64,
                               bf16_matmul: bool = False,
                               bf16_act: bool = False,
                               hoist_mask: bool = False,
                               interpret: Optional[bool] = None,
                               ablate: Optional[str] = None,
                               parallel_grid: bool = False,
                               slot_major_input: bool = False
                               ) -> Tuple[Array, Array]:
    """Fully 2-D slot-major variant of fused_describe_clusters.

    Same contract and (in f32) bit-identical outputs; different internal
    layout: the tile's rows are SLOT-major ((ns, tile, 3) blocks of the
    transposed input, flattened along the leading dims), so
    * per-cluster slot pools are log2(ns) contiguous-HALF sublane maxes
      (`_half_max`) instead of rank-3 `max(axis=1)` reductions, which
      Mosaic unrolls into ns sequential per-slot vector maxes;
    * the first-tie nearest fallback is a stable (val, idx) tournament
      (`_tourney_min_first`) instead of the (ns, ns) triangular-rank
      matmul;
    * cluster→row broadcasts (empty flag, winner index, cos/sin, pooled
      features) are exact block repetition — log2(ns) contiguous
      self-concats (`_double_rows`), no matmul rounding, no rank-3
      broadcasts for Mosaic to unroll.
    Requires power-of-two ns (the halving/doubling trees).

    hoist_mask: the in-ball/nearest-fallback mask and the radius
    normalization — pure functions of the points — are computed by XLA
    OUTSIDE the kernel and fed in, so the kernel's VPU stream keeps only
    the tower work. Bit-exact vs hoist_mask=False: the mask is the same
    0.0/1.0 values (strict `d2 < r²` compare; `argmin` first-tie == the
    in-kernel tournament's first-tie), and the scale multiply is the
    identical op either way. MEASURED NEGATIVE on-chip at paper shapes
    (benchmarks/probe_hoist.py, interleaved A/B: 1.82 vs 1.92 M desc/s
    at tile 128, slower at every tile — the extra (ns, tile, 1) stream
    + XLA prep outweigh the removed ~25 column ops), so OFF by default;
    kept for configs where the membership chain dominates (tiny towers).

    ablate ('stream' | 'matmul'): BENCH-ONLY time-decomposition bodies
    (see _ablate_kernel_2d) — outputs are NOT descriptors.
    parallel_grid: declare the grid dimension 'parallel' to Mosaic
    (grid steps are independent here — each tile's clusters are
    disjoint), allowing cross-step scheduling freedom. Output-equal;
    speed measured in benchmarks/probe_serving_ablation.py.
    slot_major_input: clusters are ALREADY (ns, B, 3) slot-major with B a
    multiple of tile — skips the on-device pad+transpose, which the r4
    ablation measured as the kernel call's dominant cost (the (B, ns, 3)
    → (ns, B, 3) relayout, probe_serving_prep.py). Callers that control
    the cluster layout (host packing, or an upstream gather that can emit
    slot-major) should use this.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if slot_major_input:
        ns, b = clusters.shape[0], clusters.shape[1]
    else:
        b, ns = clusters.shape[0], clusters.shape[1]
    assert ns == cfg.num_samples, f"cluster size {ns} != num_samples {cfg.num_samples}"
    assert ns & (ns - 1) == 0, "slot-major kernel needs power-of-two ns"
    pad = -b % tile
    if slot_major_input:
        assert pad == 0, "slot_major_input requires B % tile == 0"
        assert not hoist_mask
        padded = clusters.astype(jnp.float32)
    else:
        padded = jnp.pad(clusters.astype(jnp.float32),
                         ((0, pad), (0, 0), (0, 0)))
    n_tiles = (b + pad) // tile

    extra_in, extra_specs = [], []
    if hoist_mask:
        r2 = jnp.float32(cfg.base_scale) ** 2
        d2 = jnp.sum(padded * padded, axis=-1)                # (B, ns)
        in_ball = d2 < r2                                     # (B, ns)
        empty = ~jnp.any(in_ball, axis=1, keepdims=True)      # (B, 1)
        win = jnp.argmin(d2, axis=1)                          # first min (B,)
        near = jax.lax.broadcasted_iota(
            jnp.int32, d2.shape, 1) == win[:, None]           # (B, ns)
        mask = (in_ball | (empty & near)).astype(jnp.float32)
        mask_sm = jnp.transpose(mask)[:, :, None]             # (ns, B, 1)
        extra_in = [mask_sm]
        extra_specs = [pl.BlockSpec((ns, tile, 1), lambda i: (0, i, 0),
                                    memory_space=pltpu.VMEM)]
        padded = padded * (1.0 / jnp.float32(cfg.base_scale))
    slot_major = (padded if slot_major_input
                  else jnp.transpose(padded, (1, 0, 2)))      # (ns, B, 3)

    if ablate is not None:
        body = partial(_ablate_kernel_2d, cfg=cfg, tc=tile, ns=ns,
                       ablate=ablate)
    else:
        body = partial(_kernel_2d, cfg=cfg, tc=tile, ns=ns,
                       bf16_matmul=bf16_matmul, bf16_act=bf16_act,
                       hoist_mask=hoist_mask)
    params = dict(vmem_limit_bytes=100 * 1024 * 1024)
    if parallel_grid:
        params["dimension_semantics"] = ("parallel",)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights]
    desc, att = pl.pallas_call(
        body,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((ns, tile, 3), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)] + extra_specs + w_specs,
        out_specs=(
            pl.BlockSpec((tile, cfg.feature_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b + pad, cfg.feature_dim), jnp.float32),
            jax.ShapeDtypeStruct((b + pad, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(**params),
        interpret=interpret,
    )(slot_major, *extra_in, *weights)
    return desc[:b], att[:b, 0]


# ---------------------------------------------------------------------------
# Lane-dense transposed serving kernel (round 4).
#
# The r4 ablation (benchmarks/probe_serving_ablation.py + probe_serving_prep
# + probe_dense_layout) measured the slot-major kernel's call time as ~75 %
# DMA/prep and only ~1.2 ms/apply of actual tower compute: every array with
# a trailing coordinate dim of 3 is lane-padded 3 → 128 on TPU (42× physical
# bytes — a (7680, 64, 3) f32 batch stores 251 MB), so the XLA-side
# elementwise prep and the kernel's block DMA stream mostly padding.
#
# Fix: a TRANSPOSED formulation where CLUSTERS live in lanes and
# (slot, channel) pairs in sublanes — no (…, 3) array anywhere:
#   input  (ns·8, B): slot s occupies rows [8s, 8s+8), rows 0-2 = x/y/z,
#          rows 3-7 zero (8-row padding keeps every per-slot slice
#          tile-aligned; the zeros flow through K-padded weights as exact
#          +0.0). Lane-dense: B clusters in lanes.
#   compute: activations are (C, tile) with C ≤ 256 sublanes — matmuls run
#          Wᵀ (Cout, Cin) @ H (Cin, tile); slot pools are running 2-D
#          maxima across the ns-iteration slot loop (the hash_grid
#          pattern); reductions (counts, norms) are full-array sublane
#          reduces; NO rank-3 ops, NO misaligned slices.
#   output (D, B) + (8, B): lane-dense.
# ---------------------------------------------------------------------------


def pack_clusters_lanes(clusters: np.ndarray) -> np.ndarray:
    """Host packer: (B, ns, 3) float32 -> (ns·8, B) lane-dense layout for
    fused_describe_clusters_t. Pure numpy (runs on serving prep threads)."""
    b, ns, _ = clusters.shape
    out = np.zeros((ns, 8, b), np.float32)
    out[:, :3, :] = np.transpose(clusters[:, :, :3], (1, 2, 0))
    return out.reshape(ns * 8, b)


def pack_clusters_lanes_jnp(clusters: Array) -> Array:
    """Device packer (tests / device-resident callers). NOTE: this pays the
    lane-padded relayout the packed layout exists to avoid — production
    callers should pack on the host (pack_clusters_lanes) or emit the
    layout directly."""
    b, ns, _ = clusters.shape
    out = jnp.zeros((ns, 8, b), jnp.float32)
    out = out.at[:, :3, :].set(jnp.transpose(clusters[:, :, :3], (1, 2, 0)))
    return out.reshape(ns * 8, b)


def pack_planes_keypoints_t(planes, cnt_plane: Array, kp_s: Array,
                            centers_kp: Array, ns: int, tc: int) -> Array:
    """Keypoint clusters straight from the merge kernel's lane-dense planes
    (ops/hash_grid.ball_query_planes_sorted) into the transposed serving
    kernel's packed layout — no (K, ns, 3/4) materialization anywhere.

    planes = (topx, topy, topz[, topk]) each (tiles·ns, tc) with rows =
    slots and lanes = tile-padded sorted centers; kp_s (K,) int32 =
    keypoint indices in the SORTED center domain; centers_kp (K, 3) their
    coordinates. Returns (ns·8, K) float32 origin-centered offsets with
    the reference repeat-pad semantics (slot >= cnt copies slot 0 —
    tf_grouping_g.cu:27-35; empty balls are impossible for keypoints since
    every cloud point's ball contains itself), ready for
    fused_describe_clusters_t. Selection content is bit-identical to the
    (K, ns, 3) gather path: this is pure data movement, and every
    intermediate keeps lanes >= K (the r4 roofline measured the 3-wide
    lane dim at 42x padded HBM traffic)."""
    tiles = planes[0].shape[0] // ns

    def slot_major(p):
        # (tiles·ns, tc) -> (ns, tiles·tc): row s, column = sorted center
        return jnp.swapaxes(p.reshape(tiles, ns, tc), 0, 1).reshape(ns, -1)

    gx = slot_major(planes[0])[:, kp_s]                       # (ns, K)
    gy = slot_major(planes[1])[:, kp_s]
    gz = slot_major(planes[2])[:, kp_s]
    cnt_kp = jnp.minimum(
        cnt_plane.reshape(tiles, 8, tc)[:, 0].reshape(-1)[kp_s],
        jnp.float32(ns))                                      # (K,)
    slot = jnp.arange(ns, dtype=jnp.float32)
    filled = slot[:, None] < cnt_kp[None, :]                  # (ns, K)

    def fin(g, c):
        return jnp.where(filled, g, g[0:1, :]) - c[None, :]

    ox = fin(gx, centers_kp[:, 0])
    oy = fin(gy, centers_kp[:, 1])
    oz = fin(gz, centers_kp[:, 2])
    z = jnp.zeros_like(ox)
    return jnp.stack([ox, oy, oz, z, z, z, z, z], axis=1).reshape(
        8 * ns, -1)


def transpose_folded_weights(weights: List[Array]) -> List[Array]:
    """folded_weights() list -> the transposed-kernel layout: kernels
    (Cin, Cout) -> (Cout, Cin) with K=3 input layers zero-padded to K=8
    (matching the 8-row slot blocks — zeros contribute exact +0.0); biases
    -> (Cout, 1) columns."""
    out: List[Array] = []
    for i in range(0, len(weights), 2):
        k, b = weights[i], weights[i + 1]
        kt = jnp.transpose(k)
        if kt.shape[1] == 3:
            kt = jnp.pad(kt, ((0, 0), (0, 5)))
        out.append(kt)
        out.append(b[:, None])
    return out


def _kernel_t(x_ref, *refs, cfg: ModelConfig, tc: int, ns: int,
              bf16_act: bool = False):
    weights = refs[:-2]
    desc_ref, att_ref = refs[-2], refs[-1]
    widx = 0
    act_t = jnp.bfloat16 if bf16_act else jnp.float32

    def next_w():
        nonlocal widx
        k, b = weights[widx][...], weights[widx + 1][...]
        widx += 2
        if bf16_act:
            k = k.astype(jnp.bfloat16)
        return k, b

    def mm(k, a):
        if bf16_act:
            a = a.astype(jnp.bfloat16)
        return jnp.dot(k, a, preferred_element_type=jnp.float32)

    r2 = jnp.float32(cfg.base_scale) ** 2
    inv_r = 1.0 / jnp.float32(cfg.base_scale)

    # ---- per-slot coordinate blocks + membership --------------------------
    xs = [x_ref[8 * s:8 * s + 8, :] for s in range(ns)]       # (8, tc) each
    d2_rows = [jnp.sum(x * x, axis=0, keepdims=True) for x in xs]
    d2 = jnp.concatenate(d2_rows, axis=0)                     # (ns, tc)
    in_ball = (d2 < r2).astype(jnp.float32)
    cnt = jnp.sum(in_ball, axis=0, keepdims=True)             # (1, tc)
    empty = (cnt < 0.5).astype(jnp.float32)
    # nearest fallback: FIRST slot attaining the min distance (the
    # reference ball query's tie order)
    dmin = jnp.min(d2, axis=0, keepdims=True)                 # (1, tc)
    iota_rows = jax.lax.broadcasted_iota(jnp.int32, (ns, tc), 0)
    first = jnp.min(jnp.where(d2 <= dmin, iota_rows, ns), axis=0,
                    keepdims=True)                            # (1, tc) int32
    # per-slot masks recomputed from d2_rows — (1, tc) values, no sublane
    # slicing of the concatenated (ns, tc) array at arbitrary offsets
    masks = [jnp.minimum((d2_rows[s] < r2).astype(jnp.float32)
                         + empty * (first == s).astype(jnp.float32), 1.0)
             for s in range(ns)]

    # ---- detector tower: per-slot matmul chain, running masked max pool ---
    n_det = len(cfg.detector_mlp)
    det_w = [next_w() for _ in range(n_det)]
    pool = None
    for s in range(ns):
        h = (xs[s] * inv_r).astype(act_t)                     # (8, tc)
        for k, b in det_w:
            h = jnp.maximum(mm(k, h) + b, 0.0).astype(act_t)
        hm = h * masks[s].astype(act_t)                       # ReLU ≥ 0 ⇒ exact
        pool = hm if pool is None else jnp.maximum(pool, hm)

    g = pool
    for _ in range(len(cfg.detector_mlp2)):
        k, b = next_w()
        g = jnp.maximum(mm(k, g) + b, 0.0).astype(act_t)
    ka, ba = next_w()
    att = jax.nn.softplus(mm(ka, g) + ba)                     # (1, tc)
    ko, bo = next_w()
    ori = mm(ko, g) + bo                                      # (2, tc)
    ori = ori * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(ori * ori, axis=0, keepdims=True), 1e-8))
    c_r, s_r = ori[0:1, :], ori[1:2, :]                       # (1, tc)

    # ---- canonicalize + descriptor tower ----------------------------------
    n_desc = len(cfg.descriptor_mlp)
    desc_w = [next_w() for _ in range(n_desc)]
    km, bm = next_w()                                         # conv_mid_0
    kp, bp = next_w()                                         # conv_post_0

    d_slots, dpool = [], None
    for s in range(ns):
        x = xs[s] * inv_r                                     # (8, tc)
        xr = x[0:1, :] * c_r - x[1:2, :] * s_r
        yr = x[0:1, :] * s_r + x[1:2, :] * c_r
        rot = jnp.concatenate(
            [xr, yr, x[2:3, :], jnp.zeros((5, tc), jnp.float32)],
            axis=0).astype(act_t)                             # (8, tc)
        h = rot
        for k, b in desc_w:
            h = jnp.maximum(mm(k, h) + b, 0.0).astype(act_t)
        d_slots.append(h)                                     # (C, tc)
        hm = h * masks[s].astype(act_t)
        dpool = hm if dpool is None else jnp.maximum(dpool, hm)

    m = None
    for s in range(ns):
        cat = jnp.concatenate([d_slots[s], dpool], axis=0)    # (2C, tc)
        y = mm(km, cat) + bm                                  # (128, tc), no relu
        y = jnp.where(masks[s] > 0.5, y.astype(act_t), act_t(-1.0e30))
        m = y if m is None else jnp.maximum(m, y)
    out = mm(kp, m) + bp                                      # (D, tc)
    out = out * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(out * out, axis=0, keepdims=True), 1e-8))

    desc_ref[...] = out
    att_ref[...] = jnp.concatenate([att, jnp.zeros((7, tc), jnp.float32)],
                                   axis=0)


def _ablate_kernel_t(x_ref, *refs, cfg: ModelConfig, tc: int, ns: int,
                     ablate: str):
    """BENCH-ONLY ablation bodies for the TRANSPOSED serving kernel's time
    decomposition (bench.py pct_matmul_floor). Outputs are NOT descriptors.

    ablate='stream': read the packed tile, write the outputs — the DMA +
      sequencing floor of the _t layout.
    ablate='matmul': every matmul of _kernel_t at its exact operand shapes
      and count (ns per-slot detector chains, ns per-slot descriptor
      chains, ns conv_mid merges, heads, conv_post), with the VPU stream
      removed: no membership chain, no relu, no masks, no max pools (slot
      pools become running adds — one VPU add per slot, the cheapest op
      that keeps every chain live), no rotation, no softplus/normalize.
    """
    weights = refs[:-2]
    desc_ref, att_ref = refs[-2], refs[-1]

    if ablate == "stream":
        x = x_ref[...]
        desc_ref[...] = jnp.broadcast_to(x[0:1, :], (cfg.feature_dim, tc))
        att_ref[...] = jnp.broadcast_to(x[1:2, :], (8, tc))
        return

    assert ablate == "matmul"
    widx = 0

    def next_w():
        nonlocal widx
        k, b = weights[widx][...], weights[widx + 1][...]
        widx += 2
        return k, b

    def mm(k, a):
        return jnp.dot(k, a, preferred_element_type=jnp.float32)

    xs = [x_ref[8 * s:8 * s + 8, :] for s in range(ns)]
    det_w = [next_w() for _ in range(len(cfg.detector_mlp))]
    pool = None
    for s in range(ns):
        h = xs[s]
        for k, b in det_w:
            h = mm(k, h) + b
        pool = h if pool is None else pool + h
    g = pool
    for _ in range(len(cfg.detector_mlp2)):
        k, b = next_w()
        g = mm(k, g) + b
    ka, ba = next_w()
    att = mm(ka, g) + ba                                      # (1, tc)
    ko, bo = next_w()
    ori = mm(ko, g) + bo                                      # (2, tc)

    desc_w = [next_w() for _ in range(len(cfg.descriptor_mlp))]
    km, bm = next_w()
    kp, bp = next_w()
    d_slots, dpool = [], None
    for s in range(ns):
        h = xs[s]
        for k, b in desc_w:
            h = mm(k, h) + b
        d_slots.append(h)
        dpool = h if dpool is None else dpool + h
    m = None
    for s in range(ns):
        y = mm(km, jnp.concatenate([d_slots[s], dpool], axis=0)) + bm
        m = y if m is None else m + y
    out = mm(kp, m) + bp
    desc_ref[...] = out
    att_ref[...] = jnp.concatenate(
        [att + ori[0:1, :] * 1e-30, jnp.zeros((7, tc), jnp.float32)], axis=0)


@partial(jax.jit, static_argnames=("cfg", "tile", "bf16_act", "ablate",
                                   "interpret"))
def fused_describe_clusters_t(weights_t: List[Array], clusters_p: Array,
                              cfg: ModelConfig, tile: int = 256,
                              bf16_act: bool = False,
                              ablate: Optional[str] = None,
                              interpret: Optional[bool] = None
                              ) -> Tuple[Array, Array]:
    """Lane-dense transposed serving kernel: (ns·8, B) packed clusters
    (pack_clusters_lanes) + transpose_folded_weights(folded_weights(...))
    -> (descriptors (B, D), attention (B,)).

    Same membership/tower algebra as fused_describe_clusters_2d — agreement
    is gate-checked on chip (matmul operand order differs, so bit-equality
    is checked empirically, serving rounding envelope otherwise). The point
    of the layout: NO array in the entire call has a 3-wide lane dim, so
    neither XLA prep nor the block DMA streams lane padding (the r4
    ablation measured that padding as ~75 % of the 2-D kernel's call time).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rows, b = clusters_p.shape
    ns = rows // 8
    assert rows == 8 * ns
    assert ns == cfg.num_samples, f"{ns} != num_samples {cfg.num_samples}"
    pad = -b % tile
    padded = jnp.pad(clusters_p.astype(jnp.float32), ((0, 0), (0, pad)))
    n_tiles = (b + pad) // tile

    if ablate is not None:
        body = partial(_ablate_kernel_t, cfg=cfg, tc=tile, ns=ns,
                       ablate=ablate)
    else:
        body = partial(_kernel_t, cfg=cfg, tc=tile, ns=ns,
                       bf16_act=bf16_act)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights_t]
    desc, att = pl.pallas_call(
        body,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((8 * ns, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)] + w_specs,
        out_specs=(
            pl.BlockSpec((cfg.feature_dim, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((cfg.feature_dim, b + pad), jnp.float32),
            jax.ShapeDtypeStruct((8, b + pad), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(padded, *weights_t)
    return jnp.transpose(desc[:, :b]), att[0, :b]


def _detect_kernel_planes(px_ref, py_ref, pz_ref, cnt_ref, ctr_ref, *refs,
                          cfg: ModelConfig, tc: int, ns: int,
                          unfolded: bool = False,
                          bf16_operands: bool = False):
    """Detector tower directly on the merge kernel's lane-dense planes
    (ops/hash_grid.ball_query_planes_sorted): rows = slots, lanes =
    centers. Applies the reference repeat-pad semantics as slot-count
    masks at the pools (set-invariance argument of _kernel; detector
    pre-pool layers are all ReLU, so zero-masking is exact). Per-slot
    work is the kernel_t pattern: 8-aligned block loads, value-level row
    extraction, matmul chains on (C, tc) activations.

    unfolded: weights from transpose_unfolded_detector — raw Dense +
    replayed flax BN ((C, 1) columns broadcast over the lane dim) and
    division normalization; XLA-parity rounding."""
    weights = refs[:-1]
    out_ref = refs[-1]
    widx = 0

    def next_w():
        nonlocal widx
        k, b = weights[widx][...], weights[widx + 1][...]
        widx += 2
        return k, b

    def next_bn():
        nonlocal widx
        mu, mul, beta = (weights[widx][...], weights[widx + 1][...],
                         weights[widx + 2][...])
        widx += 3
        return mu, mul, beta

    def mm(k, a):
        # Measured on chip (probe_detector_truth): Mosaic's f32 dot is
        # exact (== HIGHEST) while the XLA towers' f32 DEFAULT rounds
        # operands to bf16 in a single pass (2.3e-3 from truth). So:
        #   unfolded + HIGHEST       == the HIGHEST-precision XLA tower
        #   unfolded + bf16_operands == emulate the XLA DEFAULT tower
        #     (explicit bf16 operand casts, f32 accumulation — the same
        #     products XLA's default dot computes)
        if bf16_operands:
            return jnp.dot(k.astype(jnp.bfloat16), a.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        return jnp.dot(k, a, preferred_element_type=jnp.float32,
                       precision=(jax.lax.Precision.HIGHEST if unfolded
                                  else None))

    def conv_layer(h, wbn):
        (k, b), bn = wbn
        v = mm(k, h) + b
        if bn is not None:
            mu, mul, beta = bn
            v = (v - mu) * mul + beta
        return jnp.maximum(v, 0.0)

    r = jnp.float32(cfg.base_scale)
    inv_r = 1.0 / r

    def norm(v):
        # the model path divides (feat3dnet.py _group_normalized); the
        # folded kernel's reciprocal multiply is only exact for
        # power-of-two radii
        return v / r if unfolded else v * inv_r

    ctr8 = ctr_ref[...]                                       # (8, tc)
    cx, cy, cz = ctr8[0:1, :], ctr8[1:2, :], ctr8[2:3, :]
    cnt = cnt_ref[0:1, :]                                     # (1, tc)

    n_det = len(cfg.detector_mlp)
    det_w = [(next_w(), next_bn() if unfolded else None)
             for _ in range(n_det)]
    px, py, pz = px_ref[...], py_ref[...], pz_ref[...]        # (ns, tc)

    pool = None
    for g in range(ns // 8):
        x8 = px[8 * g:8 * g + 8, :]
        y8 = py[8 * g:8 * g + 8, :]
        z8 = pz[8 * g:8 * g + 8, :]
        for i in range(8):
            s = 8 * g + i
            ox = norm(x8[i:i + 1, :] - cx)                    # (1, tc)
            oy = norm(y8[i:i + 1, :] - cy)
            oz = norm(z8[i:i + 1, :] - cz)
            h = jnp.concatenate(
                [ox, oy, oz, jnp.zeros((5, tc), jnp.float32)], axis=0)
            for wbn in det_w:
                h = conv_layer(h, wbn)
            # repeat-pad ⇒ slots ≥ cnt never change the max; ReLU ≥ 0 so
            # zero-masking is exact. Empty balls (cnt = 0: only padded /
            # invalid centers — a real center's ball contains itself)
            # pool to 0, finite through the heads, discarded downstream.
            mask_s = (jnp.float32(s) < cnt).astype(jnp.float32)
            hm = h * mask_s
            pool = hm if pool is None else jnp.maximum(pool, hm)

    g2 = pool
    for _ in range(len(cfg.detector_mlp2)):
        g2 = conv_layer(g2, (next_w(), next_bn() if unfolded else None))
    ka, ba = next_w()
    att = jax.nn.softplus(mm(ka, g2) + ba)                    # (1, tc)
    ko, bo = next_w()
    ori = mm(ko, g2) + bo                                     # (2, tc)
    ori = ori * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(ori * ori, axis=0, keepdims=True), 1e-8))

    out_ref[...] = jnp.concatenate(
        [att, ori, jnp.zeros((5, tc), jnp.float32)], axis=0)


@partial(jax.jit, static_argnames=("cfg", "unfolded", "bf16_operands",
                                   "interpret"))
def fused_detect_planes_t(weights_t: List[Array], planes, cnt_plane: Array,
                          centers: Array, cfg: ModelConfig,
                          unfolded: bool = False,
                          bf16_operands: bool = False,
                          interpret: Optional[bool] = None
                          ) -> Tuple[Array, Array]:
    """Detector pass directly on lane-dense merge planes: (topx, topy,
    topz[, topk]) (tiles·ns, tc) + cnt blocks + (M, 3) centers ->
    (attention (M,), orientation (M,) angle), in the planes' (sorted)
    center order.

    weights_t = transpose_folded_weights(folded_weights(...)) (descriptor
    tail ignored) — the serving rounding envelope; or
    transpose_unfolded_detector(detector_weights_unfolded(...)) with
    unfolded=True — raw Dense + replayed flax BN, matching the XLA
    detector's per-op rounding. The whole attention pass touches NO
    lane-padded array: planes in, 12 B/center out (vs the standard path's
    32×-padded (M, ns, 4) buffer + (chunk, ns, C) tower activations).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    px, py, pz = planes[0], planes[1], planes[2]
    tc = px.shape[1]
    ns = cfg.num_samples
    tiles = px.shape[0] // ns
    mp = tiles * tc
    m = centers.shape[0]
    n_layers = len(cfg.detector_mlp) + len(cfg.detector_mlp2)
    n_det = (5 * n_layers + 4) if unfolded else 2 * (n_layers + 2)
    det_w = list(weights_t[:n_det])

    # transposed tile-padded centers, as in the merge prologue
    centers_p = jnp.pad(centers.astype(jnp.float32), ((0, mp - m), (0, 0)),
                        constant_values=1.0e9)
    ctrT = jnp.concatenate([centers_p.T, jnp.zeros((5, mp), jnp.float32)],
                           axis=0)                            # (8, mp)

    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in det_w]
    out = pl.pallas_call(
        partial(_detect_kernel_planes, cfg=cfg, tc=tc, ns=ns,
                unfolded=unfolded, bf16_operands=bf16_operands),
        grid=(tiles,),
        in_specs=[pl.BlockSpec((ns, tc), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec((8, tc), lambda i: (i, 0), memory_space=pltpu.VMEM),
           pl.BlockSpec((8, tc), lambda i: (0, i), memory_space=pltpu.VMEM)]
        + w_specs,
        out_specs=pl.BlockSpec((8, tc), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tiles * 8, tc), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(px, py, pz, cnt_plane, ctrT, *det_w)
    rows = out.reshape(tiles, 8, tc)
    att = rows[:, 0].reshape(mp)[:m]
    ori = jnp.arctan2(rows[:, 2].reshape(mp)[:m],
                      rows[:, 1].reshape(mp)[:m])
    return att, ori


def _detect_kernel_2d(flat_ref, *refs, cfg: ModelConfig, tc: int, ns: int,
                      unfolded: bool = False,
                      bf16_operands: bool = False):
    """Detector-only slot-major kernel: membership chain + detector tower
    + attention/orientation heads of `_kernel_2d`, with the descriptor
    tower dropped. Output is ROW-form — rows 0/1/2 of each (8, tc) block
    carry att/cos/sin — because a column output lane-pads 128× in scoped
    VMEM at 131k clusters (the ballmax lesson, see hash_grid
    `_ballmax_kernel`); the (TC, 3) payload is transposed by one identity
    matmul (exact at HIGHEST precision).

    unfolded: weights from detector_weights_unfolded — raw Dense + replayed
    flax BN, and the input normalization uses the model path's division
    (XLA-parity rounding)."""
    weights = refs[:-1]
    out_ref = refs[-1]
    widx = 0

    def next_w():
        nonlocal widx
        k, b = weights[widx][...], weights[widx + 1][...]
        widx += 2
        return k, b

    def next_bn():
        nonlocal widx
        mu, mul, beta = (weights[widx][...], weights[widx + 1][...],
                         weights[widx + 2][...])
        widx += 3
        return mu, mul, beta

    def mm(a, k):
        return jnp.dot(a, k, preferred_element_type=jnp.float32)

    def mm_hi(a, k):
        # XLA-parity modes: see _detect_kernel_planes.mm
        if bf16_operands:
            return jnp.dot(a.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        return jnp.dot(a, k, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    r2 = jnp.float32(cfg.base_scale) ** 2
    R = tc * ns

    pts = flat_ref[...].reshape(R, 3)
    mask_r = _membership_mask_2d(pts, tc, ns, r2)             # (R, 1)
    flat_n = (pts / jnp.float32(cfg.base_scale) if unfolded
              else pts * (1.0 / jnp.float32(cfg.base_scale)))
    att, ori = _detector_heads_2d(flat_n, mask_r,
                                  next_w, mm_hi if unfolded else mm, cfg,
                                  tc, jnp.float32,
                                  next_bn=next_bn if unfolded else None)

    payload = jnp.concatenate([att, ori], axis=1)             # (TC, 3)
    rows = _transpose_cols_to_rows(payload, tc)               # (3, TC)
    out_ref[...] = jnp.concatenate(
        [rows, jnp.zeros((5, tc), jnp.float32)], axis=0)


@partial(jax.jit, static_argnames=("cfg", "tile", "unfolded",
                                   "bf16_operands", "interpret"))
def fused_detect_clusters_2d(weights: List[Array], clusters: Array,
                             cfg: ModelConfig, tile: int = 256,
                             unfolded: bool = False,
                             bf16_operands: bool = False,
                             interpret: Optional[bool] = None
                             ) -> Tuple[Array, Array]:
    """(B, nsample, 3) origin-centered clusters -> (attention (B,),
    orientation (B,) angle). Detector-only fused kernel for the
    attention-everywhere extraction pass (reference inference.py:82's
    num_clusters=-1 first pass): the chunked XLA detector materializes
    every (chunk, ns, C) activation between layers (~50 GB of HBM traffic
    at 131k clusters), where this kernel streams cluster coords in and 12
    bytes per cluster out. weights = folded_weights() (the descriptor
    tail entries are ignored) — same membership/tower algebra as
    `_kernel_2d`, matching the model path to the serving rounding
    envelope; or detector_weights_unfolded() with unfolded=True — raw
    Dense + replayed flax BN, matching the XLA detector's per-op rounding
    (the folding is what moves products off the XLA path's bf16 operand
    grid)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, ns, _ = clusters.shape
    assert ns == cfg.num_samples, \
        f"cluster size {ns} != num_samples {cfg.num_samples}"
    assert ns & (ns - 1) == 0, "slot-major kernel needs power-of-two ns"
    n_layers = len(cfg.detector_mlp) + len(cfg.detector_mlp2)
    n_det = (5 * n_layers + 4) if unfolded else 2 * (n_layers + 2)
    det_w = list(weights[:n_det])
    pad = -b % tile
    padded = jnp.pad(clusters.astype(jnp.float32), ((0, pad), (0, 0), (0, 0)))
    n_tiles = padded.shape[0] // tile
    slot_major = jnp.transpose(padded, (1, 0, 2))             # (ns, B, 3)

    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in det_w]
    out = pl.pallas_call(
        partial(_detect_kernel_2d, cfg=cfg, tc=tile, ns=ns,
                unfolded=unfolded, bf16_operands=bf16_operands),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((ns, tile, 3), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)] + w_specs,
        out_specs=pl.BlockSpec((8, tile), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * 8, tile), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(slot_major, *det_w)
    rows = out.reshape(n_tiles, 8, tile)
    att = rows[:, 0].reshape(-1)[:b]
    ori = jnp.arctan2(rows[:, 2].reshape(-1)[:b],
                      rows[:, 1].reshape(-1)[:b])
    return att, ori


@partial(jax.jit, static_argnames=("cfg", "tile", "bf16_matmul", "vpu_k3",
                                   "bf16_act", "lane_pack", "interpret"))
def fused_describe_clusters(weights: List[Array], clusters: Array,
                            cfg: ModelConfig, tile: int = 64,
                            bf16_matmul: bool = False, vpu_k3: bool = False,
                            bf16_act: bool = False, lane_pack: bool = False,
                            interpret: Optional[bool] = None
                            ) -> Tuple[Array, Array]:
    """(B, nsample, 3) origin-centered clusters -> (descriptors (B, D),
    attention (B,)). weights from folded_weights().

    lane_pack: run the per-point tower matmuls p clusters per MXU pass
    (see the lane-packing block above) — bit-exact vs unpacked (verified
    on-chip, maxdiff 0.0) and 25% fewer 128×128 tile passes, but MEASURED
    SLOWER on the v5e (1.59–1.64 M vs 1.82 M desc/s across tile 64/128
    and bf16_act — benchmarks/verify_r3_onchip.py r3): the kernel is
    serialization/VPU-bound, not MXU-pass-bound, and the relayout copies
    outweigh the pass savings. OFF by default; kept as the recorded
    negative result (see BENCHMARKS.md roofline discussion).
    interpret: force Pallas interpret mode; default auto — interpreted on
    CPU backends (Mosaic only compiles for TPU), compiled on TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, ns, _ = clusters.shape
    assert ns == cfg.num_samples, f"cluster size {ns} != num_samples {cfg.num_samples}"
    pad = -b % tile
    padded = jnp.pad(clusters.astype(jnp.float32), ((0, pad), (0, 0), (0, 0)))
    n_tiles = padded.shape[0] // tile

    det_dims, desc_dims = _mlp_dims(cfg)
    if lane_pack:
        det_plan, det_tail = _plan_packs(tile * ns, det_dims, tail_ps=(1,))
        # the packed-2 descriptor tail needs a 2C-wide (=128-aligned) cat
        desc_tails = (1, 2) if (2 * desc_dims[-1][1]) % 128 == 0 else (1,)
        desc_plan, desc_tail = _plan_packs(tile * ns, desc_dims,
                                           tail_ps=desc_tails)
        assert det_tail == 1
        weights = pack_weights_for_plan(weights, cfg, det_plan, desc_plan)
    else:
        det_plan = (1,) * len(det_dims)
        desc_plan = (1,) * len(desc_dims)
        desc_tail = 1

    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights]
    desc, att = pl.pallas_call(
        partial(_kernel, cfg=cfg, tc=tile, ns=ns, bf16_matmul=bf16_matmul,
                vpu_k3=vpu_k3, bf16_act=bf16_act,
                det_plan=det_plan, desc_plan=desc_plan, desc_tail=desc_tail),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((tile, ns, 3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] + w_specs,
        out_specs=(
            pl.BlockSpec((tile, cfg.feature_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((padded.shape[0], cfg.feature_dim), jnp.float32),
            jax.ShapeDtypeStruct((padded.shape[0], 1), jnp.float32),
        ),
        # activations at tile=256: (TC*ns, 256) + concat peers ≈ 40 MB —
        # raise the scoped-VMEM cap (v5e has 128 MB physical VMEM; the
        # default scoped limit is 16 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(padded, *weights)
    return desc[:b], att[:b, 0]
