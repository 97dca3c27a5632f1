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


def _kernel(clusters_ref, *refs, cfg: ModelConfig, tc: int, ns: int,
            bf16_matmul: bool = False, vpu_k3: bool = False,
            bf16_act: bool = False):
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

    # ---- detector tower --------------------------------------------------
    h = flat
    for _ in range(len(cfg.detector_mlp)):
        k, b = next_w()
        op = mm_k3 if h.shape[1] == 3 else mm
        h = jnp.maximum(op(h, k) + b, 0.0).astype(act_t)
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

    d = rot
    for _ in range(len(cfg.descriptor_mlp)):
        k, b = next_w()
        op = mm_k3 if d.shape[1] == 3 else mm
        d = jnp.maximum(op(d, k) + b, 0.0).astype(act_t)
    c_pts = d.reshape(tc, ns, -1)
    pooled = jnp.max(c_pts * mask[:, :, None].astype(act_t), axis=1,
                     keepdims=True)
    cat = jnp.concatenate(
        [c_pts, jnp.broadcast_to(pooled, c_pts.shape)], axis=-1)    # (TC, ns, 2C)
    k, b = next_w()                                           # conv_mid_0: BN, NO relu
    m = mm(cat.reshape(tc * ns, -1), k) + b
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


@partial(jax.jit, static_argnames=("cfg", "tile", "bf16_matmul", "vpu_k3",
                                   "bf16_act", "interpret"))
def fused_describe_clusters(weights: List[Array], clusters: Array,
                            cfg: ModelConfig, tile: int = 64,
                            bf16_matmul: bool = False, vpu_k3: bool = False,
                            bf16_act: bool = False,
                            interpret: Optional[bool] = None
                            ) -> Tuple[Array, Array]:
    """(B, nsample, 3) origin-centered clusters -> (descriptors (B, D),
    attention (B,)). weights from folded_weights().

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

    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights]
    desc, att = pl.pallas_call(
        partial(_kernel, cfg=cfg, tc=tile, ns=ns, bf16_matmul=bf16_matmul,
                vpu_k3=vpu_k3, bf16_act=bf16_act),
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
