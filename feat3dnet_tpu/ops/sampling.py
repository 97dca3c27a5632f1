"""Weighted categorical sampling (ProbSample parity).

Reference: /root/reference/tf_ops/sampling/tf_sampling_g.cu:7-104 — a
hand-rolled parallel cumsum over per-row probabilities followed by a binary
search per uniform draw. (Unused by the 3DFeat-Net model itself; registered
and demoed in tf_sampling.py:60-89 — kept for op-inventory parity.)

On TPU this is just `cumsum + searchsorted`, both single fused XLA ops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def prob_sample(probs: Array, uniforms: Array) -> Array:
    """Sample categorical indices from unnormalized row probabilities.

    Args:
      probs: (B, N) nonnegative weights (need not be normalized — the
        reference kernel normalizes by the row total during its search).
      uniforms: (B, M) uniform [0, 1) draws.

    Returns:
      (B, M) int32 indices, distributed ~ probs per row.
    """
    cdf = jnp.cumsum(probs, axis=-1)
    total = cdf[..., -1:]
    targets = uniforms * total

    def _row(cdf_row, t_row):
        return jnp.searchsorted(cdf_row, t_row, side="right").astype(jnp.int32)

    idx = jax.vmap(_row)(cdf.reshape(-1, cdf.shape[-1]), targets.reshape(-1, targets.shape[-1]))
    idx = idx.reshape(targets.shape)
    return jnp.minimum(idx, probs.shape[-1] - 1)
