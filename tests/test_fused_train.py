"""Fused training-tower kernels (ops/fused_train.py) vs a pure-jnp
flax-equivalent reference: forward, batch stats, and full gradients
(params + input), including the repeat-pad tie case where the max-pool
backward's even-split chooser rule is load-bearing."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from feat3dnet_tpu.ops.fused_train import (convbn_maxpool_fused,
                                           descriptor_plan,
                                           plan_conv_widths,
                                           reference_convbn_maxpool,
                                           reference_tower,
                                           tower_prepool_fused)


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


@pytest.mark.parametrize("g_total,gp,n_mid", [
    (96, 96, 1),     # paper descriptor config shape: mid = [128], no relu
    (80, 96, 2),     # padded + deeper mid chain (relu then no-relu)
])
def test_fused_descriptor_plan_matches_reference(rng, g_total, gp, n_mid):
    """Descriptor-tower plan: convs -> pool-concat -> mid convs (last
    without relu) -> pool, vs the jnp reference — fwd, stats, grads.
    The pool-concat backward (lane split + slot reduction + tie routing)
    is the descriptor-specific path under test."""
    ns, cin, ct = 16, 3, 32
    pre = (8, 16)
    mid = (24,) if n_mid == 1 else (24, 16)
    widths = pre + mid
    plan = descriptor_plan(len(pre), len(mid))
    assert plan_conv_widths(plan, widths, cin)[len(pre)][0] == 2 * pre[-1]

    x = rng.randn(ns, gp, cin).astype(np.float32)
    # repeat-pad some clusters: poolcat + final pool both see exact ties
    x[ns // 2:, :g_total // 3, :] = x[0:1, :g_total // 3, :]
    x = jnp.asarray(x)
    flat = _make_params_plan(rng, plan, widths, cin)
    lw = _loss_weights(rng, g_total, widths[-1])

    def loss_fused(x, flat):
        pooled, (means, vars_) = tower_prepool_fused(
            x, flat, plan, widths, ns, g_total, 1e-3, ct, True, None,
            jnp.float32)
        return jnp.sum(pooled[:g_total] * lw), (means, vars_)

    def loss_ref(x, flat):
        pooled, (means, vars_) = reference_tower(
            x, flat, plan, widths, ns, g_total)
        return jnp.sum(pooled * lw), (means, vars_)

    (lf, (mf, vf)), gf = jax.value_and_grad(loss_fused, argnums=(0, 1),
                                            has_aux=True)(x, flat)
    (lr, (mr, vr)), gr = jax.value_and_grad(loss_ref, argnums=(0, 1),
                                            has_aux=True)(x, flat)
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
                               np.asarray(dx_r[:, :g_total, :]),
                               rtol=5e-3, atol=5e-5)
    for idx, (a, b) in enumerate(zip(dflat_f, dflat_r)):
        a, b = np.asarray(a), np.asarray(b)
        if idx % 4 == 1:
            np.testing.assert_allclose(a, b, atol=1e-3,
                                       err_msg=f"b{idx // 4}")
        else:
            scale = np.maximum(np.abs(b).max(), 1e-3)
            np.testing.assert_allclose(a, b, rtol=5e-3,
                                       atol=5e-4 * scale,
                                       err_msg=f"param {idx}")


@pytest.mark.parametrize("plan_kind,g_total,gp", [
    ("detector", 96, 96),
    ("detector", 80, 96),      # padded clusters
    ("descriptor", 80, 96),    # poolcat path + padding
])
def test_t8_layout_matches_slot_major(rng, plan_kind, g_total, gp):
    """x_layout='t8' (lane-dense transposed input, per-slot padded-K
    conv-0 matmuls) vs the slot-major layout: same forward, stats, and
    gradients — incl. the x cotangent mapped back through unpack_dx_t8,
    and exact zeros in the pad channel rows of dx_t."""
    from feat3dnet_tpu.ops.fused_train import (detector_plan, pack_x_t8,
                                               unpack_dx_t8)

    ns, cin, ct = 16, 3, 32
    if plan_kind == "detector":
        widths = (8, 16, 32)
        plan = detector_plan(len(widths))
    else:
        pre, mid = (8, 16), (24, 16)
        widths = pre + mid
        plan = descriptor_plan(len(pre), len(mid))
    x = rng.randn(ns, gp, cin).astype(np.float32)
    x[ns // 2:, :g_total // 3, :] = x[0:1, :g_total // 3, :]  # pool ties
    x = jnp.asarray(x)
    flat = _make_params_plan(rng, plan, widths, cin)
    lw = _loss_weights(rng, g_total, widths[-1])

    def loss_sm(x, flat):
        pooled, (means, vars_) = tower_prepool_fused(
            x, flat, plan, widths, ns, g_total, 1e-3, ct, True, None,
            jnp.float32)
        return jnp.sum(pooled[:g_total] * lw), (means, vars_)

    def loss_t8(xt, flat):
        pooled, (means, vars_) = tower_prepool_fused(
            xt, flat, plan, widths, ns, g_total, 1e-3, ct, True, None,
            jnp.float32, "t8", cin)
        return jnp.sum(pooled[:g_total] * lw), (means, vars_)

    (l0, (m0, v0)), g0 = jax.value_and_grad(loss_sm, argnums=(0, 1),
                                            has_aux=True)(x, flat)
    (l1, (m1, v1)), g1 = jax.value_and_grad(loss_t8, argnums=(0, 1),
                                            has_aux=True)(pack_x_t8(x), flat)

    # not bit-equal: conv 0 runs as per-slot padded-K matmuls, whose XLA
    # accumulation rounds differently from the single K=3 matmul (measured
    # ~1e-6 everywhere); same envelope as the vs-reference tolerances
    np.testing.assert_allclose(float(l1), float(l0), rtol=2e-5)
    for a, b in zip(m1 + v1, m0 + v0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    dx_t, dflat_t = g1
    dx_s, dflat_s = g0
    # pad channel rows of the t8 cotangent are exactly zero (zero W0 rows)
    dx_t_np = np.asarray(dx_t).reshape(ns, 8, gp)
    np.testing.assert_array_equal(dx_t_np[:, cin:, :], 0.0)
    np.testing.assert_allclose(np.asarray(unpack_dx_t8(dx_t, ns, cin)),
                               np.asarray(dx_s), rtol=1e-3, atol=1e-5)
    for idx, (a, b) in enumerate(zip(dflat_t, dflat_s)):
        if idx % 4 == 1:
            # conv-bias grads are analytically ZERO under BN: both sides
            # return reduction rounding noise — compare absolutely (same
            # convention as the vs-reference tests above)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, err_msg=f"b{idx // 4}")
        else:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-4,
                                       err_msg=f"param {idx}")


def _make_params_plan(rng, plan, widths, cin):
    from feat3dnet_tpu.ops.fused_train import plan_conv_widths as pcw
    flat = []
    for (ci, co) in pcw(plan, widths, cin):
        flat += [jnp.asarray(rng.randn(ci, co).astype(np.float32) * 0.3),
                 jnp.asarray(rng.randn(co).astype(np.float32) * 0.1),
                 jnp.asarray(1.0 + 0.2 * rng.randn(co).astype(np.float32)),
                 jnp.asarray(0.1 * rng.randn(co).astype(np.float32))]
    return tuple(flat)


def test_fused_descriptor_plan_matches_flax_per_point(rng):
    """Against the real flax descriptor pre-pool structure (ConvBN
    stack + pool-concat + mid ConvBN without final relu + pool)."""
    import flax.linen as nn

    from feat3dnet_tpu.models.layers import ConvBN

    ns, g, cin, ct = 16, 64, 3, 32
    pre, mid = (8, 16), (24,)
    widths = pre + mid
    plan = descriptor_plan(len(pre), len(mid))

    class PerPoint(nn.Module):
        @nn.compact
        def __call__(self, grouped, training):
            h = grouped
            for i, f in enumerate(pre):
                h = ConvBN(f, name=f"conv{i}")(h, training)
            pooled = jnp.max(h, axis=2, keepdims=True)
            pooled = jnp.broadcast_to(
                pooled, h.shape[:2] + (h.shape[2], pooled.shape[-1]))
            h = jnp.concatenate([h, pooled], axis=-1)
            for i, f in enumerate(mid):
                act = nn.relu if i < len(mid) - 1 else None
                h = ConvBN(f, activation=act, name=f"conv_mid_{i}")(
                    h, training)
            return jnp.max(h, axis=2)

    tower = PerPoint()
    grouped = jnp.asarray(rng.randn(1, g, ns, cin).astype(np.float32))
    variables = tower.init(jax.random.PRNGKey(0), grouped, training=True)
    params = jax.tree.map(lambda v: v + 0.05, variables["params"])
    out = tower.apply({"params": params,
                       "batch_stats": variables["batch_stats"]},
                      grouped, training=True, mutable=["batch_stats"])[0]

    flat = []
    for name in ["conv0", "conv1", "conv_mid_0"]:
        p = params[name]
        flat += [p["conv2d"]["kernel"], p["conv2d"]["bias"],
                 p["bn"]["scale"], p["bn"]["bias"]]
    x_sm = jnp.transpose(grouped[0], (1, 0, 2))
    pooled, _ = tower_prepool_fused(x_sm, tuple(flat), plan, widths, ns,
                                    g, 1e-3, ct, True)
    # tolerance: BN-moment accumulation order differs on both sides
    np.testing.assert_allclose(np.asarray(pooled[:g]), np.asarray(out[0]),
                               rtol=1e-4, atol=2e-4)


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


def test_fused_towers_model_equivalence(rng):
    """cfg.fused_towers: full Feat3DNet train step vs the default XLA
    towers — same param-tree structure (checkpoint compatibility), eval
    mode untouched, loss/batch_stats close, gradient direction aligned
    (not bit-exact by design: accumulation order + bf16 cotangents)."""
    from feat3dnet_tpu.config import ModelConfig
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.train.trainer import (TrainState, make_optimizer,
                                             make_train_step)

    SMALL = dict(num_clusters=16, num_samples=8, feature_dim=16,
                 base_scale=10.0, detector_mlp=(8, 16),
                 detector_mlp2=(8,), descriptor_mlp=(8, 8))
    cfg0 = ModelConfig(**SMALL)
    cfg1 = ModelConfig(**SMALL, fused_towers=True)
    m0, m1 = Feat3DNet(cfg0), Feat3DNet(cfg1)
    clouds = rng.randn(6, 128, 3).astype(np.float32)
    v = m0.init(jax.random.PRNGKey(0), jnp.asarray(clouds[:3]),
                training=False)
    v1 = m1.init(jax.random.PRNGKey(0), jnp.asarray(clouds[:3]),
                 training=True)
    assert (jax.tree_util.tree_structure(v["params"])
            == jax.tree_util.tree_structure(v1["params"]))

    # eval mode: fused path inactive -> bit-identical
    out0 = m0.apply(v, jnp.asarray(clouds[:2]), training=False)
    out1 = m1.apply(v, jnp.asarray(clouds[:2]), training=False)
    np.testing.assert_array_equal(np.asarray(out0.features),
                                  np.asarray(out1.features))

    tx = make_optimizer(1e-3)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=v["params"],
                       batch_stats=v["batch_stats"],
                       opt_state=tx.init(v["params"]))
    a, p, n = (jnp.asarray(clouds[0:2]), jnp.asarray(clouds[2:4]),
               jnp.asarray(clouds[4:6]))
    s0, met0 = jax.jit(make_train_step(m0, tx, cfg0.margin,
                                       cfg0.attention))(state, a, p, n)
    s1, met1 = jax.jit(make_train_step(m1, tx, cfg1.margin,
                                       cfg1.attention))(state, a, p, n)
    l0, l1 = float(met0["loss"]), float(met1["loss"])
    assert np.isfinite(l1)
    assert abs(l1 - l0) <= 1e-3 * max(abs(l0), 1e-3), (l0, l1)
    for x, y in zip(jax.tree.leaves(s0.batch_stats),
                    jax.tree.leaves(s1.batch_stats)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-5)

    # gradient direction: global cosine between the two gradient vectors
    def grads_of(model):
        def loss_fn(params):
            from feat3dnet_tpu.train.loss import alignment_triplet_loss
            out, _ = model.apply({"params": params,
                                  "batch_stats": state.batch_stats},
                                 jnp.concatenate([a, p, n], axis=0),
                                 training=True, mutable=["batch_stats"])
            fa, fp, fn = jnp.split(out.features, 3, axis=0)
            att = jnp.split(out.attention, 3, axis=0)[0]
            return alignment_triplet_loss(fa, fp, fn, att, cfg0.margin)[0]
        return jax.grad(loss_fn)(state.params)

    g0, g1 = grads_of(m0), grads_of(m1)
    v0 = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g0)])
    v1_ = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g1)])
    cos = float(jnp.vdot(v0, v1_)
                / jnp.maximum(jnp.linalg.norm(v0) * jnp.linalg.norm(v1_),
                              1e-12))
    assert cos > 0.999, cos
