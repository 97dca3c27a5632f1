"""Rigid-transform estimation + vectorized RANSAC.

Reference: scripts/external/ransacfitRt.m (3-point minimal rigid fit inside
a generic ransac.m hypothesis loop) and estimateRigidTransform.m
(quaternion/SVD least-squares). TPU-native redesign: ALL hypotheses are
evaluated at once — sample (K, 3) correspondence triples, solve K Kabsch
problems with one batched SVD, score all K × N inlier tests as one matmul-
shaped broadcast — then refit on the best hypothesis's inliers. No
sequential hypothesis loop, no early exit (fixed K is the static-shape
equivalent of ransac.m's adaptive trial count).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class RigidTransform(NamedTuple):
    rotation: Array      # (3, 3)
    translation: Array   # (3,)

    def apply(self, pts: Array) -> Array:
        return pts @ self.rotation.T + self.translation


def estimate_rigid_transform(src: Array, dst: Array,
                             weights: Array | None = None) -> RigidTransform:
    """Least-squares rigid fit dst ≈ R @ src + t (Kabsch via SVD).

    Equivalent of estimateRigidTransform.m (quaternion method there; SVD
    here — both give the global LS optimum). Batched: leading dims allowed.
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], src.dtype)
    w = weights[..., None] / jnp.maximum(
        jnp.sum(weights, axis=-1, keepdims=True)[..., None], 1e-12)
    src_c = jnp.sum(src * w, axis=-2, keepdims=True)
    dst_c = jnp.sum(dst * w, axis=-2, keepdims=True)
    s = src - src_c
    d = dst - dst_c
    cov = jnp.einsum("...ni,...nj,...n->...ij", d, s, weights)
    u, _, vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", u, vt))
    fix = jnp.concatenate([
        jnp.ones(det.shape + (2,), src.dtype), det[..., None]], axis=-1)
    r = jnp.einsum("...ij,...j,...jk->...ik", u, fix, vt)
    t = dst_c[..., 0, :] - jnp.einsum("...ij,...j->...i", r, src_c[..., 0, :])
    return RigidTransform(r, t)


@partial(jax.jit, static_argnames=("num_hypotheses",))
def ransac_rigid(
    key: Array,
    src: Array,                 # (N, 3) matched source points
    dst: Array,                 # (N, 3) matched destination points
    inlier_threshold: float = 1.0,   # metres (reference: 1.0, computeAndVisualizeMatches.m:49)
    num_hypotheses: int = 1024,
    valid: Array | None = None,  # (N,) bool mask over correspondences
) -> Tuple[RigidTransform, Array, Array]:
    """Fully-batched rigid RANSAC.

    Returns (best-refit transform, inlier mask (N,), inlier count).
    """
    n = src.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)

    # K random 3-point minimal samples WITHOUT replacement within each
    # hypothesis (Gumbel top-k over the valid set — iid sampling would give
    # ~3%/N duplicate-index hypotheses whose Kabsch fit is rank-deficient,
    # wasting trials the reference's distinct randomsample never does).
    logits = jnp.where(valid, 0.0, -jnp.inf)
    gumbel = jax.random.gumbel(key, (num_hypotheses, n))
    _, idx = jax.lax.top_k(gumbel + logits[None, :], 3)                  # (K, 3)
    s3 = src[idx]                                        # (K, 3, 3)
    d3 = dst[idx]

    hyp = estimate_rigid_transform(s3, d3)               # batched (K,...)
    # Score all hypotheses: residual of every correspondence under every R|t.
    pred = jnp.einsum("kij,nj->kni", hyp.rotation, src) + hyp.translation[:, None, :]
    resid = jnp.linalg.norm(pred - dst[None], axis=-1)   # (K, N)
    inl = (resid < inlier_threshold) & valid[None, :]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)

    # Refit on the best hypothesis's inliers (reference ransacfitRt.m refits
    # with estimateRt on the consensus set).
    mask = inl[best]
    refit = estimate_rigid_transform(src, dst, weights=mask.astype(src.dtype))
    pred = src @ refit.rotation.T + refit.translation
    final_mask = (jnp.linalg.norm(pred - dst, axis=-1) < inlier_threshold) & valid
    return refit, final_mask, jnp.sum(final_mask)
