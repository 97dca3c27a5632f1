"""Fused serving kernel vs the reference XLA model path (interpret mode)."""
import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from feat3dnet_tpu.config import ModelConfig
from feat3dnet_tpu.models import Feat3DNet
from feat3dnet_tpu.ops.fused_describe import (folded_weights,
                                              fused_describe_clusters,
                                              fused_describe_clusters_2d)


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


def test_fused_detect_matches_model(rng):
    """Detector-only kernel (attention-everywhere pass) vs the model path,
    across the selection branches: in-ball, partial, empty-ball fallback,
    duplicate ties."""
    from feat3dnet_tpu.ops.fused_describe import fused_detect_clusters_2d

    cfg = ModelConfig(num_samples=16, feature_dim=32)
    model = Feat3DNet(cfg)
    clusters = rng.randn(32, 16, 3).astype(np.float32) * 1.2
    clusters[3] += 30.0                       # empty ball -> fallback
    clusters[5, 8:] = clusters[5, :8]         # duplicates -> ties
    clusters[9, 10:] += 30.0                  # partial ball
    keypoints = jnp.zeros((32, 1, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(clusters),
                           training=False, keypoints=keypoints)
    variables = jax.tree.map(
        lambda x: x + 0.05 if x.ndim == 1 else x, variables)
    want = model.apply(variables, jnp.asarray(clusters), training=False,
                       keypoints=keypoints)
    weights = folded_weights(variables, cfg)
    with pltpu.force_tpu_interpret_mode():
        att, ori = fused_detect_clusters_2d(weights, jnp.asarray(clusters),
                                            cfg, tile=8)
    np.testing.assert_allclose(np.asarray(att),
                               np.asarray(want.attention[:, 0]),
                               rtol=1e-3, atol=1e-4)
    # compare as (cos, sin) — angles wrap at ±π
    np.testing.assert_allclose(
        np.stack([np.cos(np.asarray(ori)),
                  np.sin(np.asarray(ori))], -1),
        np.stack([np.cos(np.asarray(want.orientation[:, 0])),
                  np.sin(np.asarray(want.orientation[:, 0]))], -1),
        rtol=1e-3, atol=1e-4)


def test_pipeline_fused_detector_matches_default(rng):
    """use_fused_detector=True must reproduce the default hashed extract
    to the documented contract: high keypoint-set overlap with attention
    agreeing on COORDINATE-matched keypoints (the paths are rounding-
    divergent by design — BN-folded matmuls — so bit-exact slot equality
    would be asserting an accident of the seed)."""
    from feat3dnet_tpu.config import InferenceConfig
    from feat3dnet_tpu.inference import InferencePipeline
    from feat3dnet_tpu.utils.synthetic import keypoint_agreement

    cfg = ModelConfig(num_clusters=-1, num_samples=8, feature_dim=16,
                      base_scale=2.0, detector_mlp=(8, 16), detector_mlp2=(8,),
                      descriptor_mlp=(8, 8))
    model = Feat3DNet(cfg)
    v = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 3)),
                   training=False)
    v = jax.tree.map(lambda x: x + 0.1 * rng.randn(*x.shape).astype(np.float32), v)

    pts = np.concatenate([
        rng.randn(300, 3).astype(np.float32) * 2.0 + off
        for off in np.array([[0, 0, 0], [8, 0, 0], [0, 9, 0]], np.float32)
    ])
    icfg = dict(keypoint_chunk=256, max_keypoints=64, nms_radius=1.0,
                use_hashed_grouping=True)
    res_f = InferencePipeline(model, v, cfg, InferenceConfig(
        use_fused_detector=True, **icfg)).extract(pts)
    res_x = InferencePipeline(model, v, cfg, InferenceConfig(**icfg)).extract(pts)
    agree = keypoint_agreement(res_x, res_f)
    assert agree["overlap"] >= 0.9, agree
    assert agree["att_relmax_matched"] <= 1e-3, agree
    # descriptors of coordinate-matched keypoints agree to tolerance
    fx = {tuple(k): f for k, f in zip(np.asarray(res_x.keypoints),
                                      np.asarray(res_x.features))}
    ff = {tuple(k): f for k, f in zip(np.asarray(res_f.keypoints),
                                      np.asarray(res_f.features))}
    for k in set(fx) & set(ff):
        np.testing.assert_allclose(ff[k], fx[k], rtol=1e-3, atol=1e-4)


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


def test_lane_pack_bit_exact(rng):
    """Lane packing (p clusters per MXU pass, block-diagonal weights) must
    be BIT-exact vs the unpacked kernel: the kron zero blocks contribute
    exact +0.0 to the f32 accumulator and the pack/unpack round trip is
    the identity permutation. Paper-width tower so the plan actually packs
    (det (2,2,1), desc (4,4))."""
    cfg = ModelConfig()                       # full paper widths, ns=64
    model = Feat3DNet(cfg)
    clusters = rng.randn(16, cfg.num_samples, 3).astype(np.float32) * 1.5
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(clusters),
                           training=False,
                           keypoints=jnp.zeros((16, 1, 3), jnp.float32))
    weights = folded_weights(variables, cfg)
    with pltpu.force_tpu_interpret_mode():
        d0, a0 = fused_describe_clusters(weights, jnp.asarray(clusters), cfg,
                                         tile=8, lane_pack=False)
        d1, a1 = fused_describe_clusters(weights, jnp.asarray(clusters), cfg,
                                         tile=8, lane_pack=True)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a0))


def test_flat_2d_kernel_bit_exact(rng):
    """The slot-major fully-2D kernel must be BIT-exact vs the rank-3
    kernel across the selection branches: in-ball, partial balls,
    empty-ball nearest fallback, and duplicate-point ties (the stable
    tournament must pick the FIRST min-distance slot)."""
    cfg = ModelConfig()                       # full paper widths, ns=64
    model = Feat3DNet(cfg)
    clusters = rng.randn(32, cfg.num_samples, 3).astype(np.float32) * 1.5
    clusters[3] += 30.0                       # empty ball -> fallback
    clusters[5, 20:] = clusters[5, :44]       # duplicates -> ties
    clusters[7] = 9.0                         # identical far points -> tie+empty
    clusters[9, 32:] += 30.0                  # partial ball
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(clusters),
                           training=False,
                           keypoints=jnp.zeros((32, 1, 3), jnp.float32))
    weights = folded_weights(variables, cfg)
    with pltpu.force_tpu_interpret_mode():
        d0, a0 = fused_describe_clusters(weights, jnp.asarray(clusters), cfg,
                                         tile=16)
        d1, a1 = fused_describe_clusters_2d(weights, jnp.asarray(clusters),
                                            cfg, tile=16)
        # hoisted-mask variant (off by default — measured slower on chip —
        # but kept): the XLA-side mask must reproduce the in-kernel
        # membership chain bit for bit across the same branches
        d2, a2 = fused_describe_clusters_2d(weights, jnp.asarray(clusters),
                                            cfg, tile=16, hoist_mask=True)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a0))
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(d0))
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(a0))


def test_plan_packs_pass_counts():
    """The pack planner must never pick a p with MORE 128×128 MXU passes
    than unpacked, must fill the K=3 input layers, and every transition it
    emits must be alignment-legal (Mosaic rejects row-concats of column
    slices at non-128-aligned lane offsets — found on the real chip)."""
    from feat3dnet_tpu.ops.fused_describe import (_can_transition, _mlp_dims,
                                                  _mxu_passes, _plan_packs)

    cfg = ModelConfig()
    det_dims, desc_dims = _mlp_dims(cfg)
    for dims, tail_ps in ((det_dims, (1,)), (desc_dims, (1, 2))):
        plan, tail = _plan_packs(64 * 64, dims, tail_ps=tail_ps)
        prev, prev_c = 1, None
        for (k, c), p in zip(dims, plan):
            assert _mxu_passes(64 * 64, k, c, p) <= _mxu_passes(64 * 64, k, c, 1)
            assert prev_c is None or _can_transition(prev, p, prev_c)
            prev, prev_c = p, c
        assert _can_transition(prev, tail, prev_c)
        assert tail in tail_ps
        assert plan[0] > 1, "K=3 input layer should pack"
    # tiny-width towers must fall back to no packing rather than emit an
    # alignment-illegal tail
    plan, tail = _plan_packs(8 * 8, ((3, 8), (8, 8)), tail_ps=(1, 2))
    assert tail in (1, 2)


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


def test_transposed_kernel_matches_2d(rng):
    """Lane-dense transposed kernel (fused_describe_clusters_t): same
    contract as the slot-major 2-D kernel — checked on mixed clusters
    (in-ball, partial, empty-ball fallback) incl. non-tile-multiple
    batches. Matmul operand order differs (Wᵀ@H vs H@W), so the CPU
    check is allclose; on-chip equality is gate-checked."""
    from feat3dnet_tpu.ops.fused_describe import (fused_describe_clusters_t,
                                                  pack_clusters_lanes,
                                                  pack_clusters_lanes_jnp,
                                                  transpose_folded_weights)

    cfg = ModelConfig(num_samples=8, feature_dim=32, base_scale=1.0)
    model = Feat3DNet(cfg)
    clusters = rng.randn(21, 8, 3).astype(np.float32) * 0.8
    clusters[5] += 5.0          # empty ball -> nearest fallback
    clusters[9, 4:] += 4.0      # partial ball
    keypoints = jnp.zeros((21, 1, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(clusters),
                           training=False, keypoints=keypoints)
    variables = jax.tree.map(
        lambda x: x + 0.05 if x.ndim == 1 else x, variables)
    weights = folded_weights(variables, cfg)
    weights_t = transpose_folded_weights(weights)

    packed = pack_clusters_lanes(clusters)
    assert packed.shape == (8 * 8, 21)
    np.testing.assert_array_equal(
        packed, np.asarray(pack_clusters_lanes_jnp(jnp.asarray(clusters))))

    with pltpu.force_tpu_interpret_mode():
        d2d, a2d = fused_describe_clusters_2d(
            weights, jnp.asarray(clusters), cfg, tile=8)
        dt, at = fused_describe_clusters_t(
            weights_t, jnp.asarray(packed), cfg, tile=8)
    np.testing.assert_allclose(np.asarray(dt), np.asarray(d2d),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(at), np.asarray(a2d),
                               rtol=1e-4, atol=1e-5)


def test_fused_detect_unfolded_matches_model_tight(rng):
    """unfolded=True replays the XLA detector's exact op sequence (raw
    Dense + flax eval BN, division normalization) instead of BN-folded
    weights — agreement must be far tighter than the folded serving
    envelope (folding multiplies W by gamma/sigma before the matmul's
    operand rounding, which is the envelope's root cause)."""
    from feat3dnet_tpu.ops.fused_describe import (
        detector_weights_unfolded, fused_detect_clusters_2d)

    cfg = ModelConfig(num_samples=16, feature_dim=32, base_scale=1.7)
    model = Feat3DNet(cfg)
    clusters = rng.randn(32, 16, 3).astype(np.float32) * 1.2
    clusters[3] += 30.0                       # empty ball -> fallback
    clusters[5, 8:] = clusters[5, :8]         # duplicates -> ties
    clusters[9, 10:] += 30.0                  # partial ball
    keypoints = jnp.zeros((32, 1, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(clusters),
                           training=False, keypoints=keypoints)
    variables = jax.tree.map(
        lambda x: x + 0.05 if x.ndim == 1 else x, variables)
    want = model.apply(variables, jnp.asarray(clusters), training=False,
                       keypoints=keypoints)
    wu = detector_weights_unfolded(variables, cfg)
    with pltpu.force_tpu_interpret_mode():
        att, ori = fused_detect_clusters_2d(wu, jnp.asarray(clusters),
                                            cfg, tile=8, unfolded=True)
    np.testing.assert_allclose(np.asarray(att),
                               np.asarray(want.attention[:, 0]),
                               rtol=1e-6, atol=1e-7)
    # orientation carries ~5e-7 accumulation-order residue on the 2d
    # layout (row-major mm vs the model's rank-4 dot) — still ~1000x
    # inside the folded envelope
    np.testing.assert_allclose(
        np.stack([np.cos(np.asarray(ori)), np.sin(np.asarray(ori))], -1),
        np.stack([np.cos(np.asarray(want.orientation[:, 0])),
                  np.sin(np.asarray(want.orientation[:, 0]))], -1),
        rtol=1e-5, atol=1e-6)
