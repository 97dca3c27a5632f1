"""Multi-device tests on the virtual 8-device CPU mesh: DP train step
equivalence with single-device, keypoint-sharded attention equivalence."""
import numpy as np

import jax
import jax.numpy as jnp

from feat3dnet_tpu.config import ModelConfig, TrainConfig
from feat3dnet_tpu.models import Feat3DNet
from feat3dnet_tpu.parallel import (
    keypoint_sharded_attention, make_dp_train_step, make_mesh, shard_batch,
)
from feat3dnet_tpu.train.trainer import init_state, make_train_step

CFG = ModelConfig(num_clusters=8, num_samples=8, feature_dim=16, base_scale=10.0,
                  detector_mlp=(8,), detector_mlp2=(8,), descriptor_mlp=(8, 8))
TCFG = TrainConfig(batch_size=8, num_points=64)


def _batch(rng, b=8, n=64):
    a = rng.randn(b, n, 3).astype(np.float32)
    p = a + 0.01 * rng.randn(b, n, 3).astype(np.float32)
    ng = a + 0.2 * rng.randn(b, n, 3).astype(np.float32)
    return tuple(jnp.asarray(x) for x in (a, p, ng))


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_dp_step_matches_single_device(rng):
    model = Feat3DNet(CFG)
    state, tx = init_state(model, TCFG, CFG, jax.random.PRNGKey(0))
    batch = _batch(rng)

    single = jax.jit(make_train_step(model, tx, 1.0, CFG.attention))
    s1, m1 = single(state, *batch)

    mesh = make_mesh()
    dp = make_dp_train_step(model, tx, 1.0, CFG.attention, mesh, donate_state=False)
    sharded = shard_batch(batch, mesh)
    s2, m2 = dp(state, *sharded)

    # GSPMD partitioning must be arithmetically equivalent to the
    # single-device program (same global BN moments, same grad all-reduce).
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5, atol=1e-6)
    # Post-Adam params: elements whose true gradient is ~0 (dead relu paths)
    # can flip sign under the partitioned f32 reduction order, and Adam's
    # normalized update turns any sign flip into a ±lr step — so compare
    # with atol of a few lr, plus exact batch-stats agreement.
    lr = TCFG.learning_rate
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=3 * lr)
    for a, b in zip(jax.tree.leaves(s1.batch_stats), jax.tree.leaves(s2.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_keypoint_sharded_attention_matches_unsharded(rng):
    cfg = ModelConfig(num_clusters=-1, num_samples=8, feature_dim=16, base_scale=2.0,
                      detector_mlp=(8,), detector_mlp2=(8,), descriptor_mlp=(8, 8))
    model = Feat3DNet(cfg)
    cloud = jnp.asarray((rng.rand(1, 128, 3).astype(np.float32) - 0.5) * 8.0)
    valid = jnp.ones((1, 128), bool)
    variables = model.init(jax.random.PRNGKey(0), cloud, training=False)

    out = model.apply(variables, cloud, training=False, keypoints=cloud, valid_mask=valid)
    want_att = np.asarray(out.end_points["attention"][0])

    mesh = make_mesh()
    fn = keypoint_sharded_attention(model, mesh)
    att, ori = fn(variables, cloud, valid)
    np.testing.assert_allclose(np.asarray(att), want_att, rtol=1e-4, atol=1e-5)


def test_inference_pipeline_with_mesh(rng):
    """Keypoint-sharded attention path inside the inference pipeline must
    agree with the single-device chunked path."""
    from feat3dnet_tpu.config import InferenceConfig
    from feat3dnet_tpu.inference import InferencePipeline

    cfg = ModelConfig(num_clusters=-1, num_samples=8, feature_dim=16, base_scale=2.0,
                      detector_mlp=(8,), detector_mlp2=(8,), descriptor_mlp=(8, 8))
    icfg = InferenceConfig(max_keypoints=16, keypoint_chunk=1024)
    model = Feat3DNet(cfg)
    cloud = (rng.rand(300, 6).astype(np.float32) - 0.5) * 10.0
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(cloud[None, :, :3]), training=False)

    single = InferencePipeline(model, variables, cfg, icfg)
    meshed = InferencePipeline(model, variables, cfg, icfg, mesh=make_mesh())
    r1 = single.extract(cloud)
    r2 = meshed.extract(cloud)
    assert r1.num_keypoints == r2.num_keypoints
    np.testing.assert_allclose(r1.keypoints, r2.keypoints, atol=1e-5)
    np.testing.assert_allclose(r1.features, r2.features, rtol=1e-4, atol=1e-5)


def test_fused_dp_step_matches_fused_single(rng):
    """The fused DP step (stacked batch sharded over the mesh, augmentation
    in-jit) must match the fused single-device step — same tolerance story
    as the unfused DP equivalence test above."""
    from feat3dnet_tpu.parallel import make_fused_dp_train_step
    from feat3dnet_tpu.train.trainer import make_fused_train_step

    model = Feat3DNet(CFG)
    state, tx = init_state(model, TCFG, CFG, jax.random.PRNGKey(0))
    a, p, n = _batch(rng)
    stacked = jnp.concatenate([a, p, n], axis=0)
    aug = ("RotateSmall", "Jitter")

    single = jax.jit(make_fused_train_step(
        model, tx, 1.0, CFG.attention, augmentations=aug, aug_seed=3))
    s1, m1 = single(state, stacked)

    mesh = make_mesh()
    dp = make_fused_dp_train_step(model, tx, 1.0, CFG.attention, mesh,
                                  augmentations=aug, aug_seed=3,
                                  donate_state=False)
    from jax.sharding import NamedSharding, PartitionSpec
    sharded = jax.device_put(stacked, NamedSharding(mesh, PartitionSpec("data")))
    s2, m2 = dp(state, sharded)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5, atol=1e-6)
    lr = TCFG.learning_rate
    for x, y in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=3 * lr)
    for x, y in zip(jax.tree.leaves(s1.batch_stats), jax.tree.leaves(s2.batch_stats)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-6)


def _assert_step_close(s1, m1, s2, m2, lr):
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5, atol=1e-6)
    for x, y in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=3 * lr)
    for x, y in zip(jax.tree.leaves(s1.batch_stats),
                    jax.tree.leaves(s2.batch_stats)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-6)
    l1, t1 = jax.tree.flatten(m1)
    l2, t2 = jax.tree.flatten(m2)
    assert t1 == t2
    for x, y in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-5)


def test_shardmap_dp_step_matches_fused_single(rng):
    """shard_map DP (explicit psum reductions, role-aligned resharding of
    the stacked triplet batch) == fused single-device step — including the
    histogram metrics, whose inputs are all_gathered inside the shard."""
    from feat3dnet_tpu.parallel import make_shardmap_fused_dp_train_step
    from feat3dnet_tpu.train.trainer import make_fused_train_step

    model = Feat3DNet(CFG)
    state, tx = init_state(model, TCFG, CFG, jax.random.PRNGKey(0))
    stacked = jnp.concatenate(_batch(rng), axis=0)
    aug = ("RotateSmall", "Jitter")

    single = jax.jit(make_fused_train_step(
        model, tx, 1.0, CFG.attention, augmentations=aug, aug_seed=3))
    s1, m1 = single(state, stacked)

    mesh = make_mesh()
    dp_model = Feat3DNet(CFG, bn_axis_name="data")
    dp = make_shardmap_fused_dp_train_step(
        dp_model, tx, 1.0, CFG.attention, mesh, augmentations=aug,
        aug_seed=3, donate_state=False)
    from jax.sharding import NamedSharding, PartitionSpec
    sharded = jax.device_put(stacked, NamedSharding(mesh, PartitionSpec("data")))
    s2, m2 = dp(state, sharded)
    _assert_step_close(s1, m1, s2, m2, TCFG.learning_rate)


def test_shardmap_dp_fused_towers_matches_single(rng):
    """The point of the shard_map DP path: cfg.fused_towers (Pallas tower
    kernels, not GSPMD-partitionable) trained data-parallel with psum'd BN
    moments == the fused-towers single-device step."""
    from feat3dnet_tpu.config import ModelConfig as MC
    from feat3dnet_tpu.parallel import make_shardmap_fused_dp_train_step
    from feat3dnet_tpu.train.trainer import make_fused_train_step

    cfg = MC(num_clusters=8, num_samples=8, feature_dim=16, base_scale=10.0,
             detector_mlp=(8,), detector_mlp2=(8,), descriptor_mlp=(8, 8),
             fused_towers=True)
    model = Feat3DNet(cfg)
    state, tx = init_state(model, TCFG, cfg, jax.random.PRNGKey(0))
    stacked = jnp.concatenate(_batch(rng), axis=0)

    single = jax.jit(make_fused_train_step(model, tx, 1.0, cfg.attention))
    s1, m1 = single(state, stacked)

    mesh = make_mesh()
    dp_model = Feat3DNet(cfg, bn_axis_name="data")
    dp = make_shardmap_fused_dp_train_step(
        dp_model, tx, 1.0, cfg.attention, mesh, donate_state=False)
    from jax.sharding import NamedSharding, PartitionSpec
    sharded = jax.device_put(stacked, NamedSharding(mesh, PartitionSpec("data")))
    s2, m2 = dp(state, sharded)
    _assert_step_close(s1, m1, s2, m2, TCFG.learning_rate)


def test_shardmap_dp_rejects_unplumbed_model():
    from feat3dnet_tpu.parallel import make_shardmap_fused_dp_train_step
    import pytest

    model = Feat3DNet(CFG)   # no bn_axis_name
    with pytest.raises(ValueError, match="bn_axis_name"):
        make_shardmap_fused_dp_train_step(model, None, 1.0, True, make_mesh())


def test_chained_step_matches_sequential(rng):
    """k scanned steps in one dispatch must be BIT-equal to k sequential
    fused-step calls: the augmentation key derives from state.step inside
    the scan body, so the RNG streams coincide step for step."""
    from feat3dnet_tpu.train.trainer import (make_chained_train_step,
                                             make_fused_train_step)

    model = Feat3DNet(CFG)
    state, tx = init_state(model, TCFG, CFG, jax.random.PRNGKey(0))
    aug = ("RotateSmall", "Jitter")
    k = 3
    batches = [jnp.concatenate(_batch(rng), axis=0) for _ in range(k)]

    single = jax.jit(make_fused_train_step(
        model, tx, 1.0, CFG.attention, augmentations=aug, aug_seed=3))
    s_seq, losses = state, []
    for b in batches:
        s_seq, m = single(s_seq, b)
        losses.append(float(m["loss"]))

    chained = jax.jit(make_chained_train_step(
        model, tx, 1.0, CFG.attention, augmentations=aug, aug_seed=3))
    s_chn, m_k = chained(state, jnp.stack(batches))

    assert int(s_chn.step) == int(s_seq.step) == k
    np.testing.assert_array_equal(np.asarray(m_k["loss"]),
                                  np.asarray(losses, np.float32))
    for x, y in zip(jax.tree.leaves(s_seq.params), jax.tree.leaves(s_chn.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(jax.tree.leaves(s_seq.batch_stats),
                    jax.tree.leaves(s_chn.batch_stats)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_chained_dp_step_matches_chained_single(rng):
    """Chained DP (k steps scanned, batch axis sharded over the mesh) ==
    chained single-device, same tolerances as the one-step DP test."""
    from feat3dnet_tpu.parallel import make_chained_dp_train_step
    from feat3dnet_tpu.train.trainer import make_chained_train_step

    model = Feat3DNet(CFG)
    state, tx = init_state(model, TCFG, CFG, jax.random.PRNGKey(0))
    aug = ("RotateSmall",)
    k = 2
    stack = jnp.stack([jnp.concatenate(_batch(rng), axis=0) for _ in range(k)])

    single = jax.jit(make_chained_train_step(
        model, tx, 1.0, CFG.attention, augmentations=aug, aug_seed=3))
    s1, m1 = single(state, stack)

    mesh = make_mesh()
    dp = make_chained_dp_train_step(model, tx, 1.0, CFG.attention, mesh,
                                    augmentations=aug, aug_seed=3,
                                    donate_state=False)
    from jax.sharding import NamedSharding, PartitionSpec
    sharded = jax.device_put(stack, NamedSharding(mesh, PartitionSpec(None, "data")))
    s2, m2 = dp(state, sharded)

    loss1, loss2 = np.asarray(m1["loss"]), np.asarray(m2["loss"])
    # step 1 runs from identical params -> tight; step >=2 runs from params
    # that already carry the documented +-lr Adam divergence between the
    # sharded and unsharded reductions, so its loss inherits an O(lr)-scaled
    # drift (observed ~3e-5)
    np.testing.assert_allclose(loss1[0], loss2[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(loss1[1:], loss2[1:], rtol=1e-3, atol=1e-4)
    lr = TCFG.learning_rate
    # the one-step DP test bounds params at 3*lr; over k chained steps the
    # runs can step ~+-lr apart PER STEP, so the bound scales with k
    for x, y in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=(2 * k + 1) * lr)
    # BN moments from step >=2 are computed through the +-lr-diverged
    # params, so the EMA stats inherit an O(k*lr)-scaled drift too
    for x, y in zip(jax.tree.leaves(s1.batch_stats), jax.tree.leaves(s2.batch_stats)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-3, atol=k * 2e-6)


def test_chained_shardmap_dp_matches_chained_single(rng):
    """Chained shard_map DP (fused-towers-capable path, k steps scanned)
    == chained single-device, with the same k-scaled tolerance story as
    the GSPMD chained test above."""
    from feat3dnet_tpu.parallel import make_chained_shardmap_dp_train_step
    from feat3dnet_tpu.train.trainer import make_chained_train_step

    model = Feat3DNet(CFG)
    state, tx = init_state(model, TCFG, CFG, jax.random.PRNGKey(0))
    aug = ("RotateSmall",)
    k = 2
    stack = jnp.stack([jnp.concatenate(_batch(rng), axis=0) for _ in range(k)])

    single = jax.jit(make_chained_train_step(
        model, tx, 1.0, CFG.attention, augmentations=aug, aug_seed=3))
    s1, m1 = single(state, stack)

    mesh = make_mesh()
    dp_model = Feat3DNet(CFG, bn_axis_name="data")
    dp = make_chained_shardmap_dp_train_step(
        dp_model, tx, 1.0, CFG.attention, mesh, augmentations=aug,
        aug_seed=3, donate_state=False)
    from jax.sharding import NamedSharding, PartitionSpec
    sharded = jax.device_put(stack, NamedSharding(mesh, PartitionSpec(None, "data")))
    s2, m2 = dp(state, sharded)

    loss1, loss2 = np.asarray(m1["loss"]), np.asarray(m2["loss"])
    np.testing.assert_allclose(loss1[0], loss2[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(loss1[1:], loss2[1:], rtol=1e-3, atol=1e-4)
    lr = TCFG.learning_rate
    for x, y in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=(2 * k + 1) * lr)
    for x, y in zip(jax.tree.leaves(s1.batch_stats), jax.tree.leaves(s2.batch_stats)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-3, atol=k * 2e-6)


def test_quantized_fused_step_single_and_dp(rng):
    """int16 upload path: the fused step accepting (q, scale) must land
    within the quantization perturbation of the f32 step, and the DP
    variant (q sharded, scale replicated) must match it at the usual DP
    tolerances."""
    from feat3dnet_tpu.data.quant import quantize_clouds
    from feat3dnet_tpu.parallel import make_fused_dp_train_step
    from feat3dnet_tpu.train.trainer import make_fused_train_step

    model = Feat3DNet(CFG)
    state, tx = init_state(model, TCFG, CFG, jax.random.PRNGKey(0))
    stacked = np.concatenate([np.asarray(x) for x in _batch(rng)], axis=0)
    q, scale = quantize_clouds(stacked)

    single = jax.jit(make_fused_train_step(model, tx, 1.0, CFG.attention))
    s_f32, m_f32 = single(state, jnp.asarray(stacked))
    s_q, m_q = single(state, (jnp.asarray(q), jnp.asarray(scale)))
    # inputs differ by <= scale/2 (~sub-mm at these ranges); the loss must
    # track within a loose Lipschitz-ish band, params within a few lr
    np.testing.assert_allclose(float(m_q["loss"]), float(m_f32["loss"]),
                               rtol=5e-2, atol=1e-3)
    lr = TCFG.learning_rate
    for x, y in zip(jax.tree.leaves(s_q.params), jax.tree.leaves(s_f32.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-3, atol=3 * lr)

    mesh = make_mesh()
    dp = make_fused_dp_train_step(model, tx, 1.0, CFG.attention, mesh,
                                  donate_state=False, quantized=True)
    from jax.sharding import NamedSharding, PartitionSpec
    batch = jax.device_put(
        (q, scale), (NamedSharding(mesh, PartitionSpec("data")),
                     NamedSharding(mesh, PartitionSpec())))
    s_dp, m_dp = dp(state, batch)
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_q["loss"]),
                               rtol=1e-5, atol=1e-6)
    for x, y in zip(jax.tree.leaves(s_dp.params), jax.tree.leaves(s_q.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=3 * lr)


def test_cloud_mesh_extract_batch(rng):
    """Cloud-per-device throughput serving (pipeline cloud_mesh): per-cloud
    results must be BIT-equal to single-device extract() on each cloud
    alone — each shard runs the same batched-extraction core a
    single-device extract_batch of B/n_devices clouds would. Also checks
    the non-multiple batch (padding clouds dropped) and extract_many
    routing."""
    from feat3dnet_tpu.config import InferenceConfig
    from feat3dnet_tpu.inference import InferencePipeline

    cfg = ModelConfig(num_clusters=-1, num_samples=8, feature_dim=16,
                      base_scale=2.0, detector_mlp=(8, 16), detector_mlp2=(8,),
                      descriptor_mlp=(8, 8))
    model = Feat3DNet(cfg)
    v = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 64, 3)),
                   training=False)
    v = jax.tree.map(lambda x: x + 0.1 * rng.randn(*x.shape).astype(np.float32), v)

    def cloud(n):
        return (rng.rand(n, 3).astype(np.float32) - 0.5) * 15.0

    clouds = [cloud(n) for n in (300, 250, 400, 350, 280, 320, 260, 380)]
    icfg = InferenceConfig(use_hashed_grouping=True, keypoint_chunk=256,
                           max_keypoints=32, nms_radius=1.0)
    single = InferencePipeline(model, v, cfg, icfg)
    meshed = InferencePipeline(model, v, cfg, icfg, cloud_mesh=make_mesh())

    batch = meshed.extract_batch(clouds)
    singles = [single.extract(c) for c in clouds]
    for rb, rs in zip(batch, singles):
        assert rb.num_keypoints == rs.num_keypoints
        np.testing.assert_array_equal(rb.keypoints, rs.keypoints)
        np.testing.assert_array_equal(rb.attention, rs.attention)
        np.testing.assert_array_equal(rb.features, rs.features)

    # non-multiple batch: 5 clouds on 8 devices (3 padding replicas dropped)
    part = meshed.extract_batch(clouds[:5])
    assert len(part) == 5
    for rb, rs in zip(part, singles[:5]):
        np.testing.assert_array_equal(rb.features, rs.features)

    # extract_many routes through the mesh in mesh-sized chunks
    many = meshed.extract_many(clouds[:3], batch_size=1)
    assert len(many) == 3
    for rb, rs in zip(many, singles[:3]):
        np.testing.assert_array_equal(rb.features, rs.features)
