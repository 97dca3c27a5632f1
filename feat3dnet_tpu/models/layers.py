"""Shared-MLP building blocks.

The reference's `conv2d` (/root/reference/models/layers.py:11-46) is a
slim.conv2d with 1x1 kernels — i.e. a per-point Dense — followed by a
hand-rolled EMA batch norm (layers.py:225-272: batch statistics during
training, EMA(decay=0.9) statistics during eval, epsilon 1e-3, activation
applied AFTER the norm). On TPU the 1x1 conv is expressed directly as a
Dense over the channel axis so XLA maps it onto the MXU as one large
(B·M·S, Cin)x(Cin, Cout) matmul with the bias/norm/activation fused in.

Submodule names mirror the TF variable scopes ('conv2d', 'bn') so the TF1
checkpoint loader (utils/tf1_loader.py) can map names mechanically.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


RESIDUAL_CKPT_NAME = "tower_resid"


def squash_residual(x: Array, dtype: Any, active: bool) -> Array:
    """Quantize-dequantize checkpoint point for compressed saved activations.

    When active, rounds x to `dtype` (bf16) and NAMES the compressed copy
    for jax.checkpoint's save_only_these_names policy: inside a tower
    segment rematerialized under that policy, only these bf16 copies are
    saved to HBM for the backward pass — half the saved-residual bytes of
    f32 — while the matmuls themselves still run and accumulate in the
    model's compute dtype. The forward value is therefore rounded to the
    bf16 grid at each squash point (~3 decimal digits), which is the price
    of the exact-recompute property: the saved copy IS the forward value.
    """
    if not active:
        return x
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(x.astype(dtype), RESIDUAL_CKPT_NAME).astype(x.dtype)


def residual_save_policy():
    """jax.checkpoint policy saving only the named bf16 squash points."""
    return jax.checkpoint_policies.save_only_these_names(RESIDUAL_CKPT_NAME)


class ConvBN(nn.Module):
    """Dense (= 1x1 conv) + optional EMA batch-norm + activation.

    Parity notes:
      * bias is always present (slim.conv2d default), even under BN —
        redundant but kept for checkpoint compatibility.
      * BN: momentum 0.9 (reference EMA decay, layers.py:251), epsilon 1e-3
        (layers.py:271), statistics over all axes but the channel axis
        (moments_dims [0,1,2], layers.py:209).
      * activation after BN (layers.py:34,43-44).

    residual_dtype (training-only): insert squash_residual points after the
    Dense output (the BN-backward residual) and after the activation (the
    next layer's matmul input). Effective only inside a tower segment
    wrapped with nn.remat(policy=residual_save_policy()) — see
    Detector/Descriptor per_point. BN statistics are still computed in the
    compute dtype (f32 by default) over the squashed values.
    """

    features: int
    use_bn: bool = True
    activation: Optional[Callable[[Array], Array]] = nn.relu
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-3
    dtype: Any = jnp.float32           # compute dtype; params stay float32
    bn_axis_name: Optional[str] = None  # set to mesh axis for cross-replica BN
    residual_dtype: Any = None          # e.g. jnp.bfloat16; None = off

    @nn.compact
    def __call__(self, x: Array, training: bool) -> Array:
        squash = self.residual_dtype is not None and training
        x = nn.Dense(self.features, dtype=self.dtype, name="conv2d")(x)
        x = squash_residual(x, self.residual_dtype, squash)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not training,
                momentum=self.bn_momentum,
                epsilon=self.bn_epsilon,
                dtype=self.dtype,
                axis_name=self.bn_axis_name if training else None,
                name="bn",
            )(x)
        if self.activation is not None:
            x = self.activation(x)
            x = squash_residual(x, self.residual_dtype, squash)
        return x


class _DenseVars(nn.Module):
    """nn.Dense's exact parameter surface (kernel/bias, same names,
    shapes, and initializers) without the computation."""

    features: int
    cin: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.cin, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        return kernel, bias


class _BNVars(nn.Module):
    """nn.BatchNorm's exact variable surface (params scale/bias,
    batch_stats mean/var) without the computation; performs the EMA
    batch_stats write when given batch moments."""

    features: int
    momentum: float = 0.9

    @nn.compact
    def __call__(self, batch_mean=None, batch_var=None):
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.features,))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                nn.initializers.zeros_init(), None,
                                (self.features,), jnp.float32)
        ra_var = self.variable("batch_stats", "var",
                               nn.initializers.ones_init(), None,
                               (self.features,), jnp.float32)
        if batch_mean is not None and not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * batch_mean
            ra_var.value = m * ra_var.value + (1.0 - m) * batch_var
        return scale, bias


class ConvBNParams(nn.Module):
    """ConvBN's parameter/stat surface for the fused-tower kernels
    (ops/fused_train.py): declares the IDENTICAL variable tree
    (conv2d/kernel, conv2d/bias, bn/scale, bn/bias; batch_stats
    bn/mean, bn/var — so TF1-mapped checkpoints and the default XLA
    path are interchangeable) without computing anything. Call once to
    read (W, b, gamma, beta); call again with the fused kernel's batch
    moments to write the flax-identical EMA update."""

    features: int
    cin: int
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, batch_mean=None, batch_var=None):
        kernel, bias = _DenseVars(self.features, self.cin,
                                  name="conv2d")()
        scale, beta = _BNVars(self.features, self.bn_momentum,
                              name="bn")(batch_mean, batch_var)
        return kernel, bias, scale, beta


class FullyConnected(nn.Module):
    """Dense + optional BN + activation.

    API-parity for the reference's `fully_connected` (layers.py:131-167) —
    dead code for 3DFeat-Net itself, provided for users building other
    heads on these primitives. Note the order difference from ConvBN that
    the reference also has: FC applies activation after an OPTIONAL BN with
    bias always present.
    """

    features: int
    use_bn: bool = False
    activation: Optional[Callable[[Array], Array]] = nn.relu
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        x = nn.Dense(self.features, dtype=self.dtype, name="dense")(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                             epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


def dropout(x: Array, rng: Array, keep_prob: float = 0.5,
            training: bool = True) -> Array:
    """Functional dropout (reference layers.py:107-128 equivalent)."""
    if not training or keep_prob >= 1.0:
        return x
    mask = jax.random.bernoulli(rng, keep_prob, x.shape)
    return jnp.where(mask, x / keep_prob, 0.0)


def l2_normalize(x: Array, axis: int = -1, epsilon: float = 1e-8) -> Array:
    """tf.nn.l2_normalize semantics: x * rsqrt(max(sum(x^2), epsilon))."""
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, epsilon))


def pairwise_sqdist_features(a: Array, b: Array) -> Array:
    """(B, N, D) x (B, M, D) -> (B, N, M) squared L2 between descriptor sets.

    Reference `pairwise_dist` (layers.py:49-62). Descriptors are
    L2-normalized and near the origin, so here (unlike raw coordinates) the
    MXU-friendly |a|^2+|b|^2-2ab expansion is numerically safe and turns the
    O(N·M·D) work into one batched matmul.
    """
    a2 = jnp.sum(jnp.square(a), axis=-1, keepdims=True)             # (B, N, 1)
    b2 = jnp.sum(jnp.square(b), axis=-1)[..., None, :]              # (B, 1, M)
    ab = jnp.einsum("bnd,bmd->bnm", a, b, preferred_element_type=a.dtype)
    return jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)
