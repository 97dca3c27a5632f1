"""PointNet-style set-abstraction convenience wrappers.

API-parity layer for the reference's pointnet_common.py helpers that the
model class doesn't call directly but the reference exports:

  sample_points        (pointnet_common.py:14-29)  — FPS centers, or the
                       whole cloud when npoint <= 0 (the inference path).
  sample_and_group     (pointnet_common.py:69-135) — centers (FPS or given
                       keypoints) + normalized, optionally z-rotated
                       neighborhoods; here models/feat3dnet._group_normalized
                       plus center selection.
  sample_and_group_all (pointnet_common.py:138-165) — one group containing
                       every point, centered at the origin.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from feat3dnet_tpu.ops.fps import farthest_point_sample
from feat3dnet_tpu.ops.neighborhoods import gather_points

Array = jax.Array


def sample_points(xyz: Array, npoint: int,
                  valid_mask: Optional[Array] = None) -> Array:
    """FPS cluster centers; identity when npoint <= 0."""
    if npoint <= 0:
        return xyz
    idx = farthest_point_sample(xyz, npoint, valid_mask=valid_mask)
    return gather_points(xyz, idx)


def sample_and_group(npoint: int, radius: float, nsample: int, xyz: Array,
                     keypoints: Optional[Array] = None,
                     orientations: Optional[Array] = None,
                     valid_mask: Optional[Array] = None,
                     normalize_radius: bool = True
                     ) -> Tuple[Array, Array, Array, Array]:
    """Returns (centers, grouped, idx, cnt) — the reference's
    sample_and_group contract with fixed shapes."""
    from feat3dnet_tpu.models.feat3dnet import _group_normalized

    centers = keypoints if keypoints is not None else sample_points(
        xyz, npoint, valid_mask)
    grouped, idx, cnt = _group_normalized(
        xyz, centers, radius, nsample, valid_mask, orientations=orientations)
    if not normalize_radius:
        grouped = grouped * radius   # undo the scale normalization
    return centers, grouped, idx, cnt


def sample_and_group_all(xyz: Array) -> Tuple[Array, Array, Array]:
    """One group of everything, centered at the origin: returns
    (centers (B,1,3) zeros, grouped (B,1,N,3), idx (B,1,N))."""
    b, n, _ = xyz.shape
    centers = jnp.zeros((b, 1, 3), xyz.dtype)
    grouped = xyz[:, None, :, :]
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, None, :], (b, 1, n))
    return centers, grouped, idx
