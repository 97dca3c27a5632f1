"""End-to-end inference pipeline tests (small shapes, CPU)."""
import os

import numpy as np

import jax

from feat3dnet_tpu.config import InferenceConfig, ModelConfig
from feat3dnet_tpu.data.io import load_descriptors, save_point_cloud
from feat3dnet_tpu.inference import InferencePipeline
from feat3dnet_tpu.models import Feat3DNet

CFG = ModelConfig(num_clusters=-1, num_samples=8, feature_dim=16, base_scale=2.0,
                  detector_mlp=(8, 16), detector_mlp2=(8,), descriptor_mlp=(8, 8))
ICFG = InferenceConfig(nms_radius=0.5, max_keypoints=32, keypoint_chunk=1024)


def _pipeline(cloud):
    import jax.numpy as jnp
    model = Feat3DNet(CFG)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(cloud[None, :, :3]),
                           training=False)
    return InferencePipeline(model, variables, CFG, ICFG)


def test_extract_detect_and_describe(rng):
    cloud = (rng.rand(300, 6).astype(np.float32) - 0.5) * 10.0
    pipe = _pipeline(cloud)
    res = pipe.extract(cloud)
    assert 0 < res.num_keypoints <= 32
    assert res.keypoints.shape == (res.num_keypoints, 3)
    assert res.features.shape == (res.num_keypoints, 16)
    # descriptors L2-normalized
    np.testing.assert_allclose(np.linalg.norm(res.features, axis=1), 1.0, atol=1e-4)
    # keypoints must be actual cloud points (NMS selects from the cloud)
    d = np.min(np.linalg.norm(res.keypoints[:, None] - cloud[None, :, :3], axis=-1), axis=1)
    assert np.max(d) < 1e-5


def test_extract_with_external_keypoints(rng):
    cloud = (rng.rand(300, 6).astype(np.float32) - 0.5) * 10.0
    pipe = _pipeline(cloud)
    kp = cloud[:7, :3].copy()
    res = pipe.extract(cloud, keypoints=kp)
    assert res.num_keypoints == 7
    np.testing.assert_allclose(res.keypoints, kp, atol=1e-6)
    assert res.features.shape == (7, 16)


def test_process_directory_roundtrip(tmp_path, rng):
    data_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    data_dir.mkdir()
    for i in range(2):
        cloud = (rng.rand(200, 6).astype(np.float32) - 0.5) * 8.0
        save_point_cloud(str(data_dir / f"c{i}.bin"), cloud)
    pipe = _pipeline(np.zeros((200, 6), np.float32))
    n = pipe.process_directory(str(data_dir), str(out_dir), log=lambda *a: None)
    assert n == 2
    xyz, feat = load_descriptors(str(out_dir / "c0.bin"), feature_dim=16)
    assert xyz.shape[1] == 3 and feat.shape[1] == 16 and xyz.shape[0] > 0


def test_randomize_points_changes_order_not_validity(rng):
    cloud = (rng.rand(256, 6).astype(np.float32) - 0.5) * 10.0
    pipe = _pipeline(cloud)
    res = pipe.extract(cloud, rng=np.random.RandomState(3))
    assert res.num_keypoints > 0


def test_warmup_precompiles_serving_shapes(rng):
    """warmup() must populate the executable cache so real requests at the
    warmed (bucket, batch) shapes add no new executables."""
    cloud = (rng.rand(300, 6).astype(np.float32) - 0.5) * 10.0
    pipe = _pipeline(cloud)
    times = pipe.warmup(point_counts=[300], batch_sizes=(1, 2))
    assert set(times) == {(300, 1), (300, 2)}
    assert all(t > 0 for t in times.values())
    keys_after_warm = set(pipe._extract_fns)
    assert keys_after_warm                      # something compiled
    r = pipe.extract(cloud)
    pipe.extract_batch([cloud, cloud[:250]])
    assert set(pipe._extract_fns) == keys_after_warm
    assert r.num_keypoints > 0


def test_non_dividing_keypoint_chunk(rng):
    """A keypoint_chunk that doesn't divide the bucket must not misalign
    attention (regression: lax.dynamic_slice clamps the last chunk start)."""
    from feat3dnet_tpu.config import InferenceConfig
    icfg = InferenceConfig(nms_radius=0.5, max_keypoints=32, keypoint_chunk=3000)
    cloud = (rng.rand(300, 6).astype(np.float32) - 0.5) * 10.0
    pipe = _pipeline(cloud)
    pipe_odd = InferencePipeline(pipe.model, pipe.variables, CFG, icfg)
    r1 = pipe.extract(cloud)
    r2 = pipe_odd.extract(cloud)
    assert r1.num_keypoints == r2.num_keypoints
    np.testing.assert_allclose(r1.keypoints, r2.keypoints, atol=1e-6)
    np.testing.assert_allclose(r1.features, r2.features, rtol=1e-5, atol=1e-6)
