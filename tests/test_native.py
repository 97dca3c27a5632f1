"""Native loader tests: semantics vs the numpy oracle, threading, and
TripletDataset integration."""
import os
import time

import numpy as np
import pytest

from feat3dnet_tpu.data.datagenerator import TripletDataset, crop_and_resample
from feat3dnet_tpu.data.io import save_point_cloud
from feat3dnet_tpu.utils.native import (
    load_processed, load_processed_batch, native_available,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native library not built")


def _write_cloud(path, rng, n=500, scale=15.0):
    cloud = rng.randn(n, 6).astype(np.float32) * scale
    save_point_cloud(str(path), cloud)
    return cloud


def test_native_crop_and_shape(tmp_path, rng):
    cloud = _write_cloud(tmp_path / "c.bin", rng)
    out = load_processed(str(tmp_path / "c.bin"), 6, 20.0, 256, seed=1)
    assert out.shape == (256, 6)
    # all rows cropped to radius
    assert np.all(np.sum(out[:, :3] ** 2, axis=1) <= 400.0 + 1e-3)
    # every output row exists in the original cloud
    matches = (out[:, None, :] == cloud[None, :, :]).all(-1).any(1)
    assert matches.all()


def test_native_no_replacement_when_enough(tmp_path, rng):
    cloud = _write_cloud(tmp_path / "c.bin", rng, n=400, scale=1.0)  # all within crop
    out = load_processed(str(tmp_path / "c.bin"), 6, 20.0, 256, seed=7)
    # without replacement -> all rows distinct
    assert len(np.unique(out, axis=0)) == 256


def test_native_duplicate_pad_when_short(tmp_path, rng):
    cloud = _write_cloud(tmp_path / "c.bin", rng, n=50, scale=1.0)
    out = load_processed(str(tmp_path / "c.bin"), 6, 20.0, 128, seed=3)
    assert out.shape == (128, 6)
    # first 50 rows are the original cloud in order
    np.testing.assert_array_equal(out[:50], cloud)


def test_native_deterministic_per_seed(tmp_path, rng):
    _write_cloud(tmp_path / "c.bin", rng)
    a = load_processed(str(tmp_path / "c.bin"), 6, 20.0, 128, seed=11)
    b = load_processed(str(tmp_path / "c.bin"), 6, 20.0, 128, seed=11)
    c = load_processed(str(tmp_path / "c.bin"), 6, 20.0, 128, seed=12)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_native_batch(tmp_path, rng):
    paths = []
    for i in range(8):
        _write_cloud(tmp_path / f"{i}.bin", rng)
        paths.append(str(tmp_path / f"{i}.bin"))
    out = load_processed_batch(paths, 6, 20.0, 128, seeds=list(range(8)), num_threads=4)
    assert out.shape == (8, 128, 6)
    single = load_processed(paths[3], 6, 20.0, 128, seed=3)
    np.testing.assert_array_equal(out[3], single)


def test_native_missing_file_raises(tmp_path):
    with pytest.raises(IOError):
        load_processed(str(tmp_path / "nope.bin"), 6, 20.0, 128, seed=0)


def test_dataset_native_path(tmp_path, rng):
    lines = []
    for i in range(4):
        _write_cloud(tmp_path / f"{i}.bin", rng, n=300, scale=3.0)
        lines.append(f"{i}.bin | {(i + 1) % 4} | {(i + 2) % 4}")
    (tmp_path / "train.txt").write_text("\n".join(lines))
    ds_native = TripletDataset(str(tmp_path / "train.txt"), use_native=True)
    ds_numpy = TripletDataset(str(tmp_path / "train.txt"), use_native="no")
    assert ds_native.use_native and not ds_numpy.use_native
    batches_n = list(ds_native.epoch_triplets(0, 2, 64))
    batches_p = list(ds_numpy.epoch_triplets(0, 2, 64))
    assert len(batches_n) == len(batches_p) == 2
    for (a, p, n) in batches_n:
        assert a.shape == (2, 64, 6) and p.shape == (2, 64, 6) and n.shape == (2, 64, 6)
