"""Fused serving kernel vs the reference XLA model path (interpret mode)."""
import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from feat3dnet_tpu.config import ModelConfig
from feat3dnet_tpu.models import Feat3DNet
from feat3dnet_tpu.ops.fused_describe import folded_weights, fused_describe_clusters


def _setup(rng, cfg, b=24):
    model = Feat3DNet(cfg)
    clusters = rng.randn(b, cfg.num_samples, 3).astype(np.float32) * 0.8
    keypoints = jnp.zeros((b, 1, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(clusters),
                           training=False, keypoints=keypoints)
    # make BN stats non-trivial so folding is actually exercised
    variables = jax.tree.map(
        lambda x: x + 0.05 if x.ndim == 1 else x, variables)
    out = model.apply(variables, jnp.asarray(clusters), training=False,
                      keypoints=keypoints)
    return model, variables, clusters, out


def test_fused_matches_model(rng):
    cfg = ModelConfig(num_samples=16, feature_dim=32)
    model, variables, clusters, want = _setup(rng, cfg)
    weights = folded_weights(variables, cfg)
    with pltpu.force_tpu_interpret_mode():
        desc, att = fused_describe_clusters(weights, jnp.asarray(clusters), cfg, tile=8)
    np.testing.assert_allclose(np.asarray(desc), np.asarray(want.features[:, 0, :]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(att), np.asarray(want.attention[:, 0]),
                               rtol=1e-3, atol=1e-4)


def test_fused_empty_ball_fallback(rng):
    """Cluster entirely outside the radius: nearest-point fallback."""
    cfg = ModelConfig(num_samples=8, feature_dim=32, base_scale=0.5)
    model = Feat3DNet(cfg)
    clusters = rng.randn(8, 8, 3).astype(np.float32) + 5.0   # all > radius from origin
    keypoints = jnp.zeros((8, 1, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(clusters),
                           training=False, keypoints=keypoints)
    want = model.apply(variables, jnp.asarray(clusters), training=False,
                       keypoints=keypoints)
    weights = folded_weights(variables, cfg)
    with pltpu.force_tpu_interpret_mode():
        desc, att = fused_describe_clusters(weights, jnp.asarray(clusters), cfg, tile=8)
    np.testing.assert_allclose(np.asarray(desc), np.asarray(want.features[:, 0, :]),
                               rtol=1e-3, atol=1e-4)


def test_fused_partial_ball(rng):
    """Mix of in-ball and out-of-ball points exercises repeat-pad."""
    cfg = ModelConfig(num_samples=8, feature_dim=32, base_scale=1.0)
    model = Feat3DNet(cfg)
    clusters = rng.randn(16, 8, 3).astype(np.float32)
    clusters[:, 5:] += 4.0                                    # out of ball
    keypoints = jnp.zeros((16, 1, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(clusters),
                           training=False, keypoints=keypoints)
    want = model.apply(variables, jnp.asarray(clusters), training=False,
                       keypoints=keypoints)
    weights = folded_weights(variables, cfg)
    with pltpu.force_tpu_interpret_mode():
        desc, att = fused_describe_clusters(weights, jnp.asarray(clusters), cfg, tile=16)
    np.testing.assert_allclose(np.asarray(desc), np.asarray(want.features[:, 0, :]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(att), np.asarray(want.attention[:, 0]),
                               rtol=1e-3, atol=1e-4)


def test_cluster_descriptor_server_fallback(rng):
    """On the CPU backend the server must transparently use the XLA path."""
    from feat3dnet_tpu.inference import ClusterDescriptorServer

    cfg = ModelConfig(num_samples=8, feature_dim=16,
                      detector_mlp=(8,), detector_mlp2=(8,), descriptor_mlp=(8, 8))
    model = Feat3DNet(cfg)
    clusters = rng.randn(6, 8, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(clusters),
                           training=False,
                           keypoints=jnp.zeros((6, 1, 3)))
    server = ClusterDescriptorServer(model, variables, cfg)
    desc, att = server(clusters)
    assert desc.shape == (6, 16) and att.shape == (6,)
    want = model.apply(variables, jnp.asarray(clusters), training=False,
                       keypoints=jnp.zeros((6, 1, 3)))
    np.testing.assert_allclose(np.asarray(desc), np.asarray(want.features[:, 0, :]),
                               rtol=1e-5, atol=1e-6)


def test_fused_bf16_matmul_close_to_f32(rng):
    cfg = ModelConfig(num_samples=16, feature_dim=32)
    model, variables, clusters, want = _setup(rng, cfg)
    weights = folded_weights(variables, cfg)
    with pltpu.force_tpu_interpret_mode():
        d32, _ = fused_describe_clusters(weights, jnp.asarray(clusters), cfg, tile=8)
        d16, _ = fused_describe_clusters(weights, jnp.asarray(clusters), cfg, tile=8,
                                         bf16_matmul=True)
    cos = np.sum(np.asarray(d32) * np.asarray(d16), axis=-1)
    assert np.min(cos) > 0.995


def test_fused_bf16_act_close_to_f32(rng):
    """bf16 activations (towers in bf16, heads/normalization f32): measured
    +6% on the v5e over f32, descriptor cosine >= 0.9999 at paper scale —
    here just assert the interpret-mode round trip stays close."""
    cfg = ModelConfig(num_samples=16, feature_dim=32)
    model, variables, clusters, want = _setup(rng, cfg)
    weights = folded_weights(variables, cfg)
    with pltpu.force_tpu_interpret_mode():
        d32, a32 = fused_describe_clusters(weights, jnp.asarray(clusters), cfg, tile=8)
        d16, a16 = fused_describe_clusters(weights, jnp.asarray(clusters), cfg, tile=8,
                                           bf16_act=True)
    cos = np.sum(np.asarray(d32) * np.asarray(d16), axis=-1)
    assert np.min(cos) > 0.995
    np.testing.assert_allclose(np.asarray(a16), np.asarray(a32), rtol=0.02, atol=1e-4)
