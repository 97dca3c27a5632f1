"""Attention-weighted alignment triplet loss.

Reference: Feat3dNet.get_loss (/root/reference/models/feat3dnet.py:315-357):

  * pairwise SQUARED L2 between anchor and positive/negative descriptor
    sets (pairwise_dist, layers.py:49-62 — note: no sqrt anywhere);
  * per-anchor-descriptor min over the other set's descriptors (:334-335);
  * weighted sum by sum-normalized anchor attention (:342-344), or plain
    mean when attention is disabled (:339-340);
  * hinge max(0, pos − neg + margin), then batch mean (:351-353).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from feat3dnet_tpu.models.layers import pairwise_sqdist_features

Array = jax.Array


def alignment_triplet_loss(
    anchor_features: Array,        # (B, M, D)
    positive_features: Array,      # (B, M, D)
    negative_features: Array,      # (B, M, D)
    anchor_attention: Optional[Array],  # (B, M) or None
    margin: float = 0.2,
) -> Tuple[Array, Dict[str, Array]]:
    """Returns (scalar loss, aux dict with sum_positive/sum_negative)."""
    positive_dist = pairwise_sqdist_features(anchor_features, positive_features)
    negative_dist = pairwise_sqdist_features(anchor_features, negative_features)
    best_positive = jnp.min(positive_dist, axis=2)     # (B, M)
    best_negative = jnp.min(negative_dist, axis=2)

    aux: Dict[str, Array] = {}
    if anchor_attention is None:
        sum_positive = jnp.mean(best_positive, axis=1)
        sum_negative = jnp.mean(best_negative, axis=1)
    else:
        attention_sm = anchor_attention / jnp.sum(anchor_attention, axis=1, keepdims=True)
        sum_positive = jnp.sum(attention_sm * best_positive, axis=1)
        sum_negative = jnp.sum(attention_sm * best_negative, axis=1)
        aux["normalized_attention"] = attention_sm

    aux["sum_positive"] = sum_positive
    aux["sum_negative"] = sum_negative
    triplet_cost = jnp.maximum(0.0, sum_positive - sum_negative + margin)
    loss = jnp.mean(triplet_cost)
    return loss, aux
