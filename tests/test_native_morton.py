"""Native Morton sort/pack (native/morton_pack.cpp) vs the numpy mirror.

The native path must be BIT-identical — the hashed kernels' exactness
proofs transfer only if the layout is the same array. Skipped when the
toolchain is unavailable (pure-numpy fallback covers functionality).
"""
import numpy as np
import pytest

from feat3dnet_tpu.ops.hash_grid import build_sorted_cloud_host
from feat3dnet_tpu.utils.native import native_available


pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native library unavailable")


def _compare(xyz, valid, cell, block):
    a = build_sorted_cloud_host(xyz, valid, cell_size=cell,
                                block_size=block, use_native=False)
    b = build_sorted_cloud_host(xyz, valid, cell_size=cell,
                                block_size=block, use_native=True)
    np.testing.assert_array_equal(b.pts4, a.pts4)
    np.testing.assert_array_equal(b.blk_bbox, a.blk_bbox)
    np.testing.assert_array_equal(b.inv_perm, a.inv_perm)
    np.testing.assert_array_equal(b.orig_idx, a.orig_idx)


def test_native_matches_numpy_random(rng):
    xyz = (rng.rand(700, 3).astype(np.float32) - 0.5) * 30
    _compare(xyz, None, 2.0, 64)


def test_native_matches_numpy_masked_and_padded(rng):
    xyz = (rng.rand(1000, 3).astype(np.float32) - 0.5) * 50
    xyz[:300] = xyz[:1] + rng.randn(300, 3).astype(np.float32) * 0.3
    valid = rng.rand(1000) > 0.25
    for block in (64, 256):
        _compare(xyz, valid, 2.0, block)


def test_native_matches_numpy_duplicates_and_ties(rng):
    """Duplicate coordinates exercise the stable-sort tie order."""
    base = (rng.rand(100, 3).astype(np.float32) - 0.5) * 8
    xyz = np.concatenate([base, base, base[::-1]], axis=0)
    _compare(xyz, None, 1.0, 64)


def test_native_matches_numpy_offset_cloud(rng):
    xyz = (rng.rand(500, 3).astype(np.float32) - 0.5) * 10 + 5000.0
    _compare(xyz, None, 2.0, 128)


def test_native_large_cloud(rng):
    """Submap scale (also the perf case that motivated the port)."""
    xyz = rng.rand(120000, 3).astype(np.float32) * np.array(
        [100, 100, 10], np.float32)
    _compare(xyz, None, 2.0, 256)


def test_native_matches_numpy_nonfinite(rng):
    """NaN/inf coords (unsanitized sensor dropout) are treated as invalid
    points by all builder implementations — without this, NaN comparison
    semantics diverge between numpy (clip->undefined int cast) and C
    (fmin/fmax ignore NaN) and the layouts silently differ."""
    xyz = (rng.rand(400, 3).astype(np.float32) - 0.5) * 20
    xyz[7, 1] = np.nan
    xyz[123] = np.inf
    xyz[200, 0] = -np.inf
    _compare(xyz, None, 2.0, 64)
    valid = rng.rand(400) > 0.2
    _compare(xyz, valid, 2.0, 64)
