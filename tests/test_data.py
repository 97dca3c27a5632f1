"""Data pipeline tests: IO round-trips, triplet sampling invariants,
augmentation distributions."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from feat3dnet_tpu.data import (
    TripletDataset, augment_clouds, load_descriptors, load_point_cloud, prefetch,
)
from feat3dnet_tpu.data.augment import resolve_augmentations
from feat3dnet_tpu.data.datagenerator import crop_and_resample
from feat3dnet_tpu.data.io import save_descriptors, save_point_cloud


def _make_dataset(tmp_path, n_clouds=6, n_pts=200):
    rng = np.random.RandomState(0)
    lines = []
    for i in range(n_clouds):
        cloud = rng.randn(n_pts, 6).astype(np.float32) * 3.0
        save_point_cloud(str(tmp_path / f"{i}.bin"), cloud)
        pos = (i + 1) % n_clouds
        nonneg = (i + 2) % n_clouds
        lines.append(f"{i}.bin | {pos} | {nonneg}")
    (tmp_path / "train.txt").write_text("\n".join(lines))
    return str(tmp_path / "train.txt")


def test_bin_roundtrip(tmp_path, rng):
    cloud = rng.randn(50, 6).astype(np.float32)
    p = str(tmp_path / "c.bin")
    save_point_cloud(p, cloud)
    np.testing.assert_array_equal(load_point_cloud(p, num_cols=6), cloud)


def test_descriptor_roundtrip(tmp_path, rng):
    xyz = rng.randn(10, 3).astype(np.float32)
    feat = rng.randn(10, 32).astype(np.float32)
    p = str(tmp_path / "d.bin")
    save_descriptors(p, xyz, feat)
    x2, f2 = load_descriptors(p, feature_dim=32)
    np.testing.assert_array_equal(x2, xyz)
    np.testing.assert_array_equal(f2, feat)


def test_vendored_example_data_loads():
    from feat3dnet_tpu.data.io import example_cloud_path, example_data_dir

    assert "reference" not in example_data_dir(), \
        "vendored examples/data should resolve without the reference mount"
    cloud = load_point_cloud(example_cloud_path("oxford_270.bin"), num_cols=6)
    assert cloud.shape == (16384, 6)
    for name in ("oxford_456.bin", "kitti_00_001554.bin", "kitti_00_004534.bin"):
        assert load_point_cloud(example_cloud_path(name), num_cols=6).shape[1] == 6


def test_crop_and_resample(rng):
    cloud = rng.randn(500, 6).astype(np.float32) * 15.0
    out = crop_and_resample(cloud, 256, np.random.RandomState(0), crop_radius=20.0)
    assert out.shape == (256, 6)
    assert np.all(np.sum(out[:, :3] ** 2, axis=1) <= 400.0 + 1e-3)
    # short cloud duplicate-pads
    small = rng.randn(10, 6).astype(np.float32)
    out = crop_and_resample(small, 64, np.random.RandomState(0), crop_radius=100.0)
    assert out.shape == (64, 6)


def test_triplet_sampling_respects_nonnegatives(tmp_path):
    ds = TripletDataset(_make_dataset(tmp_path))
    r = np.random.RandomState(0)
    for anchor in range(ds.size):
        for _ in range(20):
            pos, neg = ds.sample_triplet_indices(anchor, r)
            assert pos in ds.meta[anchor].positives
            assert neg not in ds.meta[anchor].positives
            assert neg not in ds.meta[anchor].nonnegatives


def test_epoch_determinism_and_sharding(tmp_path):
    path = _make_dataset(tmp_path)
    full = TripletDataset(path, seed=7)
    s0 = TripletDataset(path, seed=7, shard_index=0, num_shards=2)
    s1 = TripletDataset(path, seed=7, shard_index=1, num_shards=2)
    order = full.epoch_order(3)
    np.testing.assert_array_equal(order, full.epoch_order(3))  # deterministic
    merged = np.empty_like(order)
    merged[0::2] = s0.epoch_order(3)
    merged[1::2] = s1.epoch_order(3)
    np.testing.assert_array_equal(merged, order)  # shards partition the epoch


def test_epoch_triplets_batches(tmp_path):
    ds = TripletDataset(_make_dataset(tmp_path))
    batches = list(ds.epoch_triplets(epoch=0, batch_size=2, num_points=64))
    assert len(batches) == 3  # 6 clouds / batch 2
    a, p, n = batches[0]
    assert a.shape == (2, 64, 6) and p.shape == (2, 64, 6) and n.shape == (2, 64, 6)


def test_prefetch(tmp_path):
    ds = TripletDataset(_make_dataset(tmp_path))
    direct = [a.sum() for a, _, _ in ds.epoch_triplets(0, 2, 64)]
    fetched = [a.sum() for a, _, _ in prefetch(ds.epoch_triplets(0, 2, 64))]
    np.testing.assert_allclose(direct, fetched)


def test_prefetch_propagates_errors():
    def bad():
        yield 1
        raise RuntimeError("boom")
    it = prefetch(bad())
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        next(it)


def test_resolve_augmentations():
    assert resolve_augmentations(["Rotate1D"], upright_axis=2) == ["RotateZ"]
    assert resolve_augmentations(["Rotate1D"], upright_axis=1) == ["RotateY"]
    with pytest.raises(KeyError):
        resolve_augmentations(["Nope"])


def test_augment_jitter_bounds(rng):
    xyz = jnp.zeros((2, 100, 3))
    out = augment_clouds(jax.random.PRNGKey(0), xyz, ("Jitter",))
    assert float(jnp.max(jnp.abs(out))) <= 0.05 + 1e-6
    assert float(jnp.std(out)) > 0.003


def test_augment_rotate_z_preserves_z_and_norms(rng):
    xyz = jnp.asarray(rng.randn(3, 50, 3).astype(np.float32))
    out = augment_clouds(jax.random.PRNGKey(1), xyz, ("RotateZ",))
    np.testing.assert_allclose(np.asarray(out[..., 2]), np.asarray(xyz[..., 2]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(out, axis=-1)),
        np.asarray(jnp.linalg.norm(xyz, axis=-1)), rtol=1e-4, atol=1e-5)
    # independent angles per cloud
    a0 = np.arctan2(np.asarray(out[0, 0, 1]), np.asarray(out[0, 0, 0]))
    a1 = np.arctan2(np.asarray(out[1, 0, 1]), np.asarray(out[1, 0, 0]))
    assert abs(a0 - a1) > 1e-3


def test_augment_scale_range(rng):
    xyz = jnp.ones((4, 10, 3))
    out = augment_clouds(jax.random.PRNGKey(2), xyz, ("Scale",))
    s = np.asarray(out[:, 0, 0])
    assert np.all(s >= 0.8) and np.all(s <= 1.25)
    # scale uniform per cloud (all points share the factor)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out[:, :1, :1]) * np.ones((1, 10, 3)), rtol=1e-6)


def test_augment_rotate_small_is_small(rng):
    xyz = jnp.asarray(rng.randn(2, 80, 3).astype(np.float32))
    out = augment_clouds(jax.random.PRNGKey(3), xyz, ("RotateSmall",))
    cos = jnp.sum(out * xyz, -1) / (jnp.linalg.norm(out, axis=-1) * jnp.linalg.norm(xyz, axis=-1) + 1e-9)
    # max rotation angle is bounded by sqrt(3)*0.18 rad ≈ 0.31
    assert float(jnp.min(cos)) > np.cos(0.35)


def test_augment_chain(rng):
    xyz = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    out = augment_clouds(jax.random.PRNGKey(4), xyz, ("Jitter", "RotateSmall", "Shift", "RotateZ"))
    assert out.shape == xyz.shape
    assert np.isfinite(np.asarray(out)).all()


def test_quantize_clouds_error_bound(rng):
    from feat3dnet_tpu.data.quant import quantize_clouds

    x = (rng.rand(18, 256, 3).astype(np.float32) - 0.5) * 80.0  # ±40 m
    q, scale = quantize_clouds(x)
    assert q.dtype == np.int16 and scale.dtype == np.float32
    recon = q.astype(np.float32) * scale
    # round-to-nearest: worst-case error is half a quantization step, plus
    # a few f32 ulps of |x| from the divide/multiply roundtrip itself
    assert np.abs(recon - x).max() <= scale / 2 + np.abs(x).max() * 4e-7
    # ±40 m at int16 full scale -> ~0.6 mm steps
    assert scale < 2e-3
    # degenerate all-zero input must not divide by zero
    q0, s0 = quantize_clouds(np.zeros((4, 3), np.float32))
    assert np.all(q0 == 0) and s0 > 0
