"""Nearest-neighbor descriptor matching.

Reference: scripts/computeAndVisualizeMatches.m:43 — `pdist2(..., 'smallest', 1)`:
for every descriptor in set B, its single nearest neighbor in set A.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from feat3dnet_tpu.models.layers import pairwise_sqdist_features

Array = jax.Array


@jax.jit
def match_descriptors(desc_a: Array, desc_b: Array) -> Tuple[Array, Array]:
    """For each descriptor in B, the nearest descriptor in A.

    Args:
      desc_a: (Na, D); desc_b: (Nb, D).
    Returns:
      idx: (Nb,) int32 index into A; dist: (Nb,) L2 distance.
    """
    d2 = pairwise_sqdist_features(desc_b[None], desc_a[None])[0]   # (Nb, Na)
    idx = jnp.argmin(d2, axis=-1).astype(jnp.int32)
    dist = jnp.sqrt(jnp.take_along_axis(d2, idx[:, None], axis=-1)[:, 0])
    return idx, dist


@jax.jit
def mutual_matches(desc_a: Array, desc_b: Array) -> Array:
    """Mutual-nearest-neighbor mask over B (a standard strictness upgrade the
    reference doesn't have; useful before RANSAC on hard pairs)."""
    d2 = pairwise_sqdist_features(desc_b[None], desc_a[None])[0]
    b_to_a = jnp.argmin(d2, axis=-1)
    a_to_b = jnp.argmin(d2, axis=-2)
    back = jnp.take(a_to_b, b_to_a)
    return back == jnp.arange(desc_b.shape[0])
