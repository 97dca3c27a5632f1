"""Feat3DNet: weakly-supervised 3D feature detector + descriptor, TPU-native.

Rebuilt from the behavior of /root/reference/models/feat3dnet.py (TF1):

* detector (feature_detection_module, :90-151): FPS cluster centers →
  radius-2.0 neighborhoods of ≤64 points, centered and radius-normalized →
  shared MLP [64,128,256] → maxpool → MLP [128,64] → heads: attention
  (1-unit Dense + softplus) and orientation (2-unit Dense → L2-normalize →
  atan2).
* descriptor (feature_extraction_module + pointnet_sa_module, :9-87,154-187):
  neighborhoods around the keypoints, rotated into the detector's canonical
  z-orientation → MLP [32,64] → maxpool → concat(pointwise, pooled) → MLP
  [128] (BN, no relu) → maxpool → MLP [feature_dim] (BN, no relu) →
  L2-normalize.
* triplet forward (get_train_model, :227-256): anchor/positive/negative
  stacked on the batch axis, one shared forward, split in three.

Key structural parity detail: our ball-query replicates the reference's
first-nsample-in-index-order + repeat-pad semantics exactly, so the padded
slots are copies of real cluster members. Max-pools and batch-norm
statistics therefore match the reference bit-for-bit without any
neighborhood masking.

The one piece of reference behavior deliberately NOT rebuilt: the
`compute_det_gradients` debug instrumentation (feat3dnet.py:125-127), which
writes into `end_points['gradients']['det']` on an empty dict and raises
KeyError whenever enabled — broken-as-shipped debug code (see SURVEY.md
§2.2). `jax.grad` subsumes it.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from feat3dnet_tpu.config import ModelConfig
from feat3dnet_tpu.models.layers import (ConvBN, ConvBNParams, l2_normalize,
                                         residual_save_policy)
from feat3dnet_tpu.ops import ball_query, farthest_point_sample, gather_points, group_points

Array = jax.Array


@dataclasses.dataclass
class Feat3DNetOutput:
    """Forward-pass outputs (the reference's xyz/features/attention/end_points)."""

    keypoints: Array               # (B, M, 3) cluster centers / keypoints
    features: Array                # (B, M, feature_dim) L2-normalized descriptors
    attention: Optional[Array]     # (B, M) softplus saliency, None if disabled
    orientation: Optional[Array]   # (B, M) radians, None if NoRegress
    end_points: Dict[str, Array]


def _rotate_z(grouped: Array, orientations: Array) -> Array:
    """Rotate grouped offsets into the detector's canonical z-orientation.

    Applied as row-vector @ R with R = [[c, s, 0], [-s, c, 0], [0, 0, 1]]:
    x' = x·c − y·s, y' = x·s + y·c (reference pointnet_common.py:112-119,
    the sample_and_group/descriptor path).
    """
    c = jnp.cos(orientations)[:, :, None]
    s = jnp.sin(orientations)[:, :, None]
    x, y, z = grouped[..., 0], grouped[..., 1], grouped[..., 2]
    return jnp.stack([x * c - y * s, x * s + y * c, z], axis=-1)


def _group_normalized(
    xyz: Array,
    centers: Array,
    radius: float,
    nsample: int,
    valid_mask: Optional[Array],
    orientations: Optional[Array] = None,
) -> Tuple[Array, Array, Array]:
    """Ball-query + gather + center + radius-normalize (+ optional z-rotation).

    Mirrors query_and_group_points / sample_and_group (reference
    pointnet_common.py:32-135) with normalize_radius=True.

    Returns (grouped (B,M,ns,3), idx (B,M,ns), cnt (B,M)).
    """
    from feat3dnet_tpu.ops.batch_group import (ball_query_fused,
                                               use_fused_ball_query)

    if use_fused_ball_query(xyz, centers, radius, nsample, valid_mask):
        # opt-in (F3D_FUSED_BQ=1) fused VMEM ball-query kernel — index-exact
        # vs ball_query (tests/test_batch_group.py, on-chip gate) but
        # measured SLOWER inside the full train step than the XLA counting
        # formulation (see ops/batch_group.py header); differentiable
        # grads preserved via the group_points gather below
        idx, cnt = ball_query_fused(xyz, centers, float(radius), nsample)
    else:
        idx, cnt = ball_query(xyz, centers, radius, nsample,
                              valid_mask=valid_mask)
    grouped = group_points(xyz, idx)                      # (B, M, ns, 3)
    grouped = grouped - centers[:, :, None, :]
    grouped = grouped / radius
    if orientations is not None:
        grouped = _rotate_z(grouped, orientations)
    return grouped, idx, cnt


def _use_fused_towers(cfg: ModelConfig, training: bool) -> bool:
    """The fused Pallas tower pipeline applies only to f32 training on
    TPU (interpret mode covers CPU tests via the kernels' own tests)."""
    return (cfg.fused_towers and training
            and cfg.compute_dtype == jnp.float32)


def _fused_prepool(module, grouped: Array, names, widths, plan,
                   cfg: ModelConfig, bn_axis_name) -> Array:
    """Run a pre-pool tower segment through ops/fused_train's multi-pass
    Pallas pipeline: (B, M, ns, 3) grouped -> (B, M, 1, C_top) pooled.

    Parameters/stats live in ConvBNParams blocks whose variable tree is
    IDENTICAL to the ConvBN stack's, so checkpoints and the default XLA
    path are interchangeable. The EMA batch_stats updates are written
    with the kernel's batch moments (flax-identical formula, tested)."""
    from feat3dnet_tpu.ops.fused_train import (plan_conv_widths,
                                               tower_prepool_fused)

    b, m, ns, cin = grouped.shape
    io = plan_conv_widths(plan, tuple(widths), cin)
    blocks = [ConvBNParams(co, ci, bn_momentum=cfg.bn_momentum, name=nm)
              for nm, (ci, co) in zip(names, io)]
    flat = []
    for blk in blocks:
        flat += list(blk())

    g = b * m
    ct = 128 if g % 128 == 0 else min(g, 128)
    gp = -(-g // ct) * ct
    # t8 lane-dense input layout by default: the slot-major (ns, G, 3)
    # operand pads 3->128 lanes (42x) and is re-streamed in every kernel
    # pass (module docstring); t8 cuts that stream 16x. F3D_FT_XT=0 is
    # the measured-A/B escape hatch back to slot-major.
    use_xt = os.environ.get("F3D_FT_XT", "1") != "0"
    if use_xt:
        x = jnp.transpose(grouped.astype(jnp.float32), (2, 3, 0, 1)
                          ).reshape(ns, cin, g)
        if gp > g:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, gp - g)))
        x_sm = jnp.pad(x, ((0, 0), (0, 8 - cin), (0, 0))).reshape(ns * 8, gp)
    else:
        x_sm = jnp.transpose(grouped.astype(jnp.float32), (2, 0, 1, 3)
                             ).reshape(ns, g, cin)
        if gp > g:
            x_sm = jnp.pad(x_sm, ((0, 0), (0, gp - g), (0, 0)))
    interpret = jax.default_backend() != "tpu"
    pooled, (means, vars_) = tower_prepool_fused(
        x_sm, tuple(flat), plan, tuple(widths), ns, g,
        float(cfg.bn_epsilon), ct, interpret, bn_axis_name,
        cfg.fused_cot_dtype, "t8" if use_xt else "slot_major",
        cin if use_xt else None)
    for blk, mean, var in zip(blocks, means, vars_):
        blk(mean, var)
    return pooled[:g].reshape(b, m, 1, -1)


def _maybe_remat(per_point, cfg: ModelConfig, training: bool):
    """Wrap a tower's pre-pool segment per the config's residual policy.

    residual_dtype: checkpoint with save_only_these_names — only the ConvBN
    bf16 squash points are saved; backward recomputes the elementwise
    BN/activation chains from them (no matmul recompute). remat_towers:
    save nothing, recompute the whole segment. nn.remat preserves submodule
    names, so TF1-mapped checkpoints are unaffected either way.
    """
    if not training:
        return per_point
    if cfg.residual_dtype is not None:
        return nn.remat(per_point, policy=residual_save_policy())
    if cfg.remat_towers:
        return nn.remat(per_point)
    return per_point


class Detector(nn.Module):
    """Attention + orientation head over grouped clusters (reference :90-151)."""

    cfg: ModelConfig
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, grouped: Array, training: bool) -> Tuple[Array, Array]:
        cfg = self.cfg
        x = grouped.astype(cfg.compute_dtype)
        conv = lambda f, name: ConvBN(
            f, use_bn=cfg.use_bn, dtype=cfg.compute_dtype,
            bn_momentum=cfg.bn_momentum, bn_epsilon=cfg.bn_epsilon,
            bn_axis_name=self.bn_axis_name,
            residual_dtype=cfg.residual_dtype, name=name)

        def per_point(mdl, h):
            # pre-pool segment: the (…, ns, 256) activations here are the
            # training step's dominant saved-residual traffic; under
            # cfg.remat_towers the backward recomputes them from the small
            # grouped input instead (nn.remat preserves submodule names,
            # so checkpoints are unaffected); under cfg.residual_dtype the
            # ConvBN squash points are saved in bf16 and only the
            # elementwise chains recompute
            for i, f in enumerate(cfg.detector_mlp):
                h = conv(f, f"conv{i}")(h, training)
            return jnp.max(h, axis=2, keepdims=True)   # pool over samples

        if _use_fused_towers(cfg, training):
            from feat3dnet_tpu.ops.fused_train import detector_plan

            x = _fused_prepool(
                self, x, [f"conv{i}" for i in range(len(cfg.detector_mlp))],
                cfg.detector_mlp, detector_plan(len(cfg.detector_mlp)),
                cfg, self.bn_axis_name)
        else:
            per_point = _maybe_remat(per_point, cfg, training)
            x = per_point(self, x)
        for i, f in enumerate(cfg.detector_mlp2):
            x = conv(f, f"conv_post_{i}")(x, training)

        att = nn.Dense(1, dtype=cfg.compute_dtype, name="attention")(x)
        attention = jax.nn.softplus(att[..., 0, 0]).astype(jnp.float32)  # (B, M)

        ori = nn.Dense(2, dtype=cfg.compute_dtype, name="orientation")(x)
        ori = l2_normalize(ori[..., 0, :].astype(jnp.float32), axis=-1, epsilon=1e-8)
        orientation = jnp.arctan2(ori[..., 1], ori[..., 0])              # (B, M)
        return attention, orientation


class Descriptor(nn.Module):
    """PointNet-style SA descriptor tower (reference pointnet_sa_module :9-87).

    MLP → maxpool → concat(pointwise ⊕ pooled) → MLP2 (no final relu) →
    maxpool → MLP3 (no final relu) → L2-normalize.
    """

    cfg: ModelConfig
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, grouped: Array, training: bool) -> Array:
        cfg = self.cfg
        conv = lambda f, name, act: ConvBN(
            f, use_bn=cfg.use_bn, activation=act, dtype=cfg.compute_dtype,
            bn_momentum=cfg.bn_momentum, bn_epsilon=cfg.bn_epsilon,
            bn_axis_name=self.bn_axis_name,
            residual_dtype=cfg.residual_dtype, name=name)

        def per_point(mdl, h):
            # pre-pool segment (see Detector.per_point): point-wise convs,
            # slot pool, [pointwise ⊕ pooled] concat, mid convs, final
            # slot pool — input (…, ns, 3) and output (…, 1, C) are small,
            # everything between is per-point and remat-able
            for i, f in enumerate(cfg.descriptor_mlp):
                h = conv(f, f"conv{i}", nn.relu)(h, training)

            pooled = jnp.max(h, axis=2, keepdims=True)
            pooled = jnp.broadcast_to(
                pooled, h.shape[:2] + (h.shape[2], pooled.shape[-1]))
            h = jnp.concatenate([h, pooled], axis=-1)

            # final_relu=False in the reference descriptor (feat3dnet.py:182):
            # the LAST layer of mlp2 and of mlp3 has BN but no activation.
            mlp2 = cfg.descriptor_mlp2
            for i, f in enumerate(mlp2):
                act = nn.relu if i < len(mlp2) - 1 else None
                h = conv(f, f"conv_mid_{i}", act)(h, training)
            return jnp.max(h, axis=2, keepdims=True)

        if _use_fused_towers(cfg, training):
            from feat3dnet_tpu.ops.fused_train import descriptor_plan

            mlp, mlp2 = cfg.descriptor_mlp, cfg.descriptor_mlp2
            names = ([f"conv{i}" for i in range(len(mlp))]
                     + [f"conv_mid_{i}" for i in range(len(mlp2))])
            x = _fused_prepool(
                self, grouped, names, tuple(mlp) + tuple(mlp2),
                descriptor_plan(len(mlp), len(mlp2)), cfg,
                self.bn_axis_name)
        else:
            per_point = _maybe_remat(per_point, cfg, training)
            x = per_point(self, grouped.astype(cfg.compute_dtype))

        mlp3 = cfg.descriptor_mlp3
        for i, f in enumerate(mlp3):
            act = nn.relu if i < len(mlp3) - 1 else None
            x = conv(f, f"conv_post_{i}", act)(x, training)

        x = x[..., 0, :].astype(jnp.float32)                       # (B, M, D)
        return l2_normalize(x, axis=-1, epsilon=1e-8)


class Feat3DNet(nn.Module):
    """Full model. Apply with mutable=['batch_stats'] when training.

    Call modes (mirroring the reference's placeholder-feeding tricks):
      * keypoints=None, cfg.num_clusters>0  — training path: FPS centers.
      * keypoints=None, cfg.num_clusters<=0 — every (valid) point is a
        keypoint (reference inference.py:82, num_clusters=-1).
      * keypoints given — detector + descriptor evaluated AT those points
        (the reference's feed of end_points['keypoints'], train.py:295-302 /
        inference.py:169-171).
    """

    cfg: ModelConfig
    bn_axis_name: Optional[str] = None

    def setup(self):
        self.detector = Detector(self.cfg, bn_axis_name=self.bn_axis_name,
                                 name="detection")
        self.descriptor = Descriptor(self.cfg, bn_axis_name=self.bn_axis_name,
                                     name="description")

    def detect_clusters(self, grouped: Array, training: bool = False
                        ) -> Tuple[Array, Array]:
        """Detector tower on precomputed normalized clusters (B, M, ns, 3)
        -> (attention (B, M), orientation (B, M)). Used by the fast
        inference path, which groups neighborhoods with the spatially-
        pruned Pallas kernel (ops/hash_grid.py) outside the module."""
        return self.detector(grouped, training)

    def describe_clusters(self, grouped: Array, training: bool = False) -> Array:
        """Descriptor tower on precomputed rotated clusters -> (B, M, D)."""
        return self.descriptor(grouped, training)

    def __call__(
        self,
        cloud: Array,                      # (B, N, >=3); only xyz used
        training: bool = False,
        keypoints: Optional[Array] = None,
        valid_mask: Optional[Array] = None,
    ) -> Feat3DNetOutput:
        cfg = self.cfg
        xyz = cloud[..., :3].astype(jnp.float32)
        end_points: Dict[str, Array] = {}

        if keypoints is not None:
            centers = keypoints
        elif cfg.num_clusters > 0:
            fps_idx = farthest_point_sample(xyz, cfg.num_clusters, valid_mask=valid_mask)
            centers = jax.lax.stop_gradient(gather_points(xyz, fps_idx))
        else:
            centers = xyz

        # --- Detection ---------------------------------------------------
        grouped, det_idx, det_cnt = _group_normalized(
            xyz, centers, cfg.base_scale, cfg.num_samples, valid_mask)
        attention, orientation = self.detector(grouped, training)
        end_points["keypoints"] = centers
        end_points["attention"] = attention
        end_points["orientation"] = orientation
        end_points["det_cnt"] = det_cnt

        # --- Description -------------------------------------------------
        # The reference re-groups the SAME centers with the same radius and
        # nsample for the descriptor (feat3dnet.py:176-181 via
        # sample_and_group) — the neighborhoods are identical to the
        # detector's, so the descriptor input is just the detector grouping
        # rotated into canonical orientation. Reusing it skips a second
        # ball query + gather (bit-identical outputs).
        if cfg.regress_orientation:
            grouped2 = _rotate_z(grouped, orientation)
        else:
            grouped2 = grouped
        features = self.descriptor(grouped2, training)
        end_points["desc_cnt"] = det_cnt

        return Feat3DNetOutput(
            keypoints=centers,
            features=features,
            attention=attention if cfg.attention else None,
            orientation=orientation if cfg.regress_orientation else None,
            end_points=end_points,
        )
