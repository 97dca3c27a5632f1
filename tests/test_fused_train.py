"""Fused training-tower kernels (ops/fused_train.py) vs a pure-jnp
flax-equivalent reference: forward, batch stats, and full gradients
(params + input), including the repeat-pad tie case where the max-pool
backward's even-split chooser rule is load-bearing."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from feat3dnet_tpu.ops.fused_train import (convbn_maxpool_fused,
                                           reference_convbn_maxpool)


def _make_params(rng, widths, cin):
    flat = []
    c = cin
    for f in widths:
        flat += [jnp.asarray(rng.randn(c, f).astype(np.float32) * 0.4),
                 jnp.asarray(rng.randn(f).astype(np.float32) * 0.1),
                 jnp.asarray(1.0 + 0.2 * rng.randn(f).astype(np.float32)),
                 jnp.asarray(0.1 * rng.randn(f).astype(np.float32))]
        c = f
    return tuple(flat)


def _loss_weights(rng, g, cl):
    return jnp.asarray(rng.randn(g, cl).astype(np.float32))


@pytest.mark.parametrize("g_total,gp,repeat_pad", [
    (96, 96, False),     # exact tiling
    (80, 96, False),     # padded clusters (masked stats)
    (96, 96, True),      # repeat-pad slots: exact ties in the pool
])
def test_fused_convbn_maxpool_matches_reference(rng, g_total, gp,
                                                repeat_pad):
    ns, cin, ct = 16, 3, 32
    widths = (8, 16, 32)
    x = rng.randn(ns, gp, cin).astype(np.float32)
    if repeat_pad:
        # reference repeat-pad semantics: later slots duplicate slot 0
        # for half the clusters -> guaranteed pool ties
        x[ns // 2:, :g_total // 2, :] = x[0:1, :g_total // 2, :]
    x = jnp.asarray(x)
    x_ref = x[:, :g_total, :]
    flat = _make_params(rng, widths, cin)
    lw = _loss_weights(rng, g_total, widths[-1])

    def loss_fused(x, flat):
        pooled, (means, vars_) = convbn_maxpool_fused(
            x, flat, widths, ns, g_total, 1e-3, ct, True, jnp.float32)
        return jnp.sum(pooled[:g_total] * lw), (means, vars_)

    def loss_ref(x_r, flat):
        pooled, (means, vars_) = reference_convbn_maxpool(
            jnp.pad(x_r, ((0, 0), (0, gp - g_total), (0, 0))), flat,
            widths, ns, g_total)
        return jnp.sum(pooled * lw), (means, vars_)

    (lf, (mf, vf)), gf = jax.value_and_grad(loss_fused, argnums=(0, 1),
                                            has_aux=True)(x, flat)
    (lr, (mr, vr)), gr = jax.value_and_grad(loss_ref, argnums=(0, 1),
                                            has_aux=True)(x_ref, flat)

    np.testing.assert_allclose(float(lf), float(lr), rtol=2e-5)
    for a, b in zip(mf, mr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(vf, vr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)

    dx_f, dflat_f = gf
    dx_r, dflat_r = gr
    np.testing.assert_allclose(np.asarray(dx_f[:, :g_total, :]),
                               np.asarray(dx_r), rtol=5e-3, atol=5e-5)
    # pad-cluster cotangents must be exactly zero (their dpool is zero)
    if gp > g_total:
        np.testing.assert_array_equal(
            np.asarray(dx_f[:, g_total:, :]), 0.0)
    names = []
    for l in range(len(widths)):
        names += [f"W{l}", f"b{l}", f"gamma{l}", f"beta{l}"]
    for name, a, b in zip(names, dflat_f, dflat_r):
        a, b = np.asarray(a), np.asarray(b)
        if name.startswith("b"):
            # conv-bias grads are analytically ZERO under BN (the norm
            # absorbs any bias shift): both sides return reduction
            # rounding noise — compare absolutely
            np.testing.assert_allclose(a, b, atol=1e-3, err_msg=name)
        else:
            scale = np.maximum(np.abs(b).max(), 1e-3)
            np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-4 * scale,
                                       err_msg=name)


def test_fused_convbn_matches_flax_convbn_tower(rng):
    """Against the real flax Detector pre-pool segment (ConvBN stack +
    pool), weights lifted from an initialized model."""
    import flax.linen as nn

    from feat3dnet_tpu.models.layers import ConvBN

    ns, g, cin, ct = 16, 64, 3, 32
    widths = (8, 16)

    class Tower(nn.Module):
        @nn.compact
        def __call__(self, grouped, training):
            h = grouped
            for i, f in enumerate(widths):
                h = ConvBN(f, name=f"conv{i}")(h, training)
            return jnp.max(h, axis=2)

    tower = Tower()
    grouped = jnp.asarray(rng.randn(1, g, ns, cin).astype(np.float32))
    variables = tower.init(jax.random.PRNGKey(0), grouped, training=True)
    params = jax.tree.map(lambda v: v + 0.05, variables["params"])

    out, mut = tower.apply({"params": params,
                            "batch_stats": variables["batch_stats"]},
                           grouped, training=True,
                           mutable=["batch_stats"])

    flat = []
    for i in range(len(widths)):
        p = params[f"conv{i}"]
        flat += [p["conv2d"]["kernel"], p["conv2d"]["bias"],
                 p["bn"]["scale"], p["bn"]["bias"]]
    x_sm = jnp.transpose(grouped[0], (1, 0, 2))           # (ns, G, cin)
    pooled, (means, vars_) = convbn_maxpool_fused(
        x_sm, tuple(flat), widths, ns, g, 1e-3, ct, True)

    np.testing.assert_allclose(np.asarray(pooled[:g]), np.asarray(out[0]),
                               rtol=1e-5, atol=1e-6)
    # EMA update check: flax's new running stats from the same moments
    for i in range(len(widths)):
        bs = mut["batch_stats"][f"conv{i}"]["bn"]
        np.testing.assert_allclose(
            np.asarray(0.9 * variables["batch_stats"][f"conv{i}"]["bn"]["mean"]
                       + 0.1 * means[i]),
            np.asarray(bs["mean"]), rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(0.9 * variables["batch_stats"][f"conv{i}"]["bn"]["var"]
                       + 0.1 * vars_[i]),
            np.asarray(bs["var"]), rtol=1e-4, atol=1e-7)
