"""Op-level tests: each TPU op vs a numpy oracle implementing the exact
reference CUDA semantics (the strategy the reference itself uses for
query_ball_point2 — cross-check against a dense scipy reference,
tf_grouping_op_test.py:30-65 — extended here to every op)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from feat3dnet_tpu.ops import (
    ball_query,
    farthest_point_sample,
    gather_points,
    group_points,
    knn_points,
    nms_keypoints,
    pairwise_sqdist,
    prob_sample,
)
from feat3dnet_tpu.ops.fps import farthest_point_sample_pallas


# ---------------------------------------------------------------------------
# numpy oracles (reference CUDA semantics, tf_grouping_g.cu / tf_sampling_g.cu)
# ---------------------------------------------------------------------------

def ball_query_oracle(xyz, centers, radius, nsample):
    """Literal transcription of query_ball_point_gpu semantics
    (tf_grouping_g.cu:3-52), with the per-center (bug-free) nearest fallback."""
    b, n, _ = xyz.shape
    m = centers.shape[1]
    idx = np.zeros((b, m, nsample), np.int32)
    cnt = np.zeros((b, m), np.int32)
    for bi in range(b):
        for j in range(m):
            c = 0
            nearest_d, nearest_k = np.inf, -1
            for k in range(n):
                d = max(np.sqrt(np.sum((centers[bi, j] - xyz[bi, k]) ** 2)), 1e-20)
                if d < nearest_d:
                    nearest_d, nearest_k = d, k
                if c == nsample:
                    continue
                if d < radius:
                    if c == 0:
                        idx[bi, j, :] = k
                    idx[bi, j, c] = k
                    c += 1
            if c == 0:
                idx[bi, j, :] = nearest_k
            cnt[bi, j] = c
    return idx, cnt


def fps_oracle(xyz, npoint):
    """farthestpointsamplingKernel semantics (tf_sampling_g.cu:105-170)."""
    b, n, _ = xyz.shape
    out = np.zeros((b, npoint), np.int32)
    for bi in range(b):
        temp = np.full(n, 1e38, np.float64)
        old = 0
        out[bi, 0] = 0
        for j in range(1, npoint):
            d = np.sum((xyz[bi] - xyz[bi, old]) ** 2, axis=1)
            temp = np.minimum(temp, d)
            old = int(np.argmax(temp))
            out[bi, j] = old
    return out


# ---------------------------------------------------------------------------


def test_pairwise_sqdist(rng):
    a = rng.randn(2, 5, 3).astype(np.float32)
    b = rng.randn(2, 7, 3).astype(np.float32)
    got = np.asarray(pairwise_sqdist(jnp.asarray(a), jnp.asarray(b)))
    want = np.sum((a[:, :, None] - b[:, None]) ** 2, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pairwise_sqdist_far_from_origin(rng):
    # Numerical robustness at the reference's validation offsets (+51200 m).
    a = rng.randn(1, 4, 3).astype(np.float32) + 51200.0
    b = a + 0.01 * rng.randn(1, 4, 3).astype(np.float32)
    got = np.asarray(pairwise_sqdist(jnp.asarray(a), jnp.asarray(b)))
    want = np.sum((a[:, :, None].astype(np.float64) - b[:, None]) ** 2, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-4)


@pytest.mark.parametrize("n,m,ns,radius", [(128, 16, 8, 0.5), (200, 33, 16, 0.3), (64, 8, 70, 1.0)])
def test_ball_query_matches_oracle(rng, n, m, ns, radius):
    xyz = rng.rand(2, n, 3).astype(np.float32)
    centers = rng.rand(2, m, 3).astype(np.float32)
    idx, cnt = ball_query(jnp.asarray(xyz), jnp.asarray(centers), radius, ns)
    idx_o, cnt_o = ball_query_oracle(xyz, centers, radius, ns)
    np.testing.assert_array_equal(np.asarray(cnt), cnt_o)
    np.testing.assert_array_equal(np.asarray(idx), idx_o)


def test_ball_query_empty_ball_uses_nearest(rng):
    xyz = np.array([[[10.0, 0, 0], [11.0, 0, 0], [9.5, 0, 0]]], np.float32)
    centers = np.array([[[0.0, 0, 0]]], np.float32)
    idx, cnt = ball_query(jnp.asarray(xyz), jnp.asarray(centers), 1.0, 4)
    assert int(cnt[0, 0]) == 0
    np.testing.assert_array_equal(np.asarray(idx)[0, 0], [2, 2, 2, 2])  # nearest is index 2


def test_ball_query_valid_mask(rng):
    xyz = rng.rand(1, 50, 3).astype(np.float32)
    centers = xyz[:, :4].copy()
    mask = np.ones((1, 50), bool)
    mask[0, ::2] = False  # invalidate even indices
    idx, cnt = ball_query(jnp.asarray(xyz), jnp.asarray(centers), 0.4, 12,
                          valid_mask=jnp.asarray(mask))
    idx = np.asarray(idx)
    # every selected slot within cnt must be an odd (valid) index
    for j in range(4):
        c = int(cnt[0, j])
        assert np.all(idx[0, j, :c] % 2 == 1)


def test_ball_query_per_center_radii(rng):
    """QueryBallPoint2 variant: per-cluster radii tensor."""
    xyz = rng.rand(1, 100, 3).astype(np.float32)
    centers = rng.rand(1, 10, 3).astype(np.float32)
    radii = np.full((1, 10), 0.3, np.float32)
    idx_a, cnt_a = ball_query(jnp.asarray(xyz), jnp.asarray(centers), jnp.asarray(radii), 8)
    idx_b, cnt_b = ball_query(jnp.asarray(xyz), jnp.asarray(centers), 0.3, 8)
    np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_b))
    np.testing.assert_array_equal(np.asarray(cnt_a), np.asarray(cnt_b))


def test_group_points_and_grad(rng):
    points = rng.randn(2, 30, 4).astype(np.float32)
    idx = rng.randint(0, 30, size=(2, 5, 6)).astype(np.int32)
    out = np.asarray(group_points(jnp.asarray(points), jnp.asarray(idx)))
    for b in range(2):
        for m in range(5):
            for s in range(6):
                np.testing.assert_array_equal(out[b, m, s], points[b, idx[b, m, s]])

    # Gradient = scatter-add of upstream cotangent (reference grad kernel
    # semantics, tf_grouping_g.cu:115-132, but deterministic).
    g = rng.randn(2, 5, 6, 4).astype(np.float32)
    grad = jax.grad(lambda p: jnp.sum(group_points(p, jnp.asarray(idx)) * g))(jnp.asarray(points))
    want = np.zeros_like(points)
    for b in range(2):
        for m in range(5):
            for s in range(6):
                want[b, idx[b, m, s]] += g[b, m, s]
    np.testing.assert_allclose(np.asarray(grad), want, rtol=1e-5, atol=1e-5)


def test_gather_points(rng):
    pts = rng.randn(2, 20, 3).astype(np.float32)
    idx = rng.randint(0, 20, size=(2, 7)).astype(np.int32)
    out = np.asarray(gather_points(jnp.asarray(pts), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_array_equal(out[b], pts[b, idx[b]])


@pytest.mark.parametrize("n,npoint", [(100, 10), (257, 32)])
def test_fps_matches_oracle(rng, n, npoint):
    xyz = rng.randn(3, n, 3).astype(np.float32)
    got = np.asarray(farthest_point_sample(jnp.asarray(xyz), npoint))
    want = fps_oracle(xyz, npoint)
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_interpret_matches_scan(rng):
    from feat3dnet_tpu.ops.fps import farthest_point_sample_scan
    xyz = rng.randn(2, 256, 3).astype(np.float32)
    want = np.asarray(farthest_point_sample_scan(jnp.asarray(xyz), 32))
    import jax.experimental.pallas as pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(farthest_point_sample_pallas(jnp.asarray(xyz), 32))
    np.testing.assert_array_equal(got, want)


def test_fps_valid_mask(rng):
    xyz = rng.randn(1, 64, 3).astype(np.float32)
    mask = np.ones((1, 64), bool)
    mask[0, 32:] = False
    idx = np.asarray(farthest_point_sample(jnp.asarray(xyz), 16, valid_mask=jnp.asarray(mask)))
    assert np.all(idx < 32)


def test_knn_points(rng):
    xyz = rng.randn(2, 40, 3).astype(np.float32)
    centers = rng.randn(2, 6, 3).astype(np.float32)
    d2, idx = knn_points(5, jnp.asarray(xyz), jnp.asarray(centers))
    d2, idx = np.asarray(d2), np.asarray(idx)
    full = np.sum((centers[:, :, None] - xyz[:, None]) ** 2, axis=-1)
    for b in range(2):
        for m in range(6):
            want = np.argsort(full[b, m], kind="stable")[:5]
            np.testing.assert_array_equal(idx[b, m], want)
            np.testing.assert_allclose(d2[b, m], full[b, m][want], rtol=1e-5)


def test_prob_sample_distribution(rng):
    probs = jnp.asarray([[0.0, 1.0, 3.0, 0.0]])
    u = jnp.asarray(rng.rand(1, 4000).astype(np.float32))
    idx = np.asarray(prob_sample(probs, u))
    counts = np.bincount(idx.ravel(), minlength=4)
    assert counts[0] == 0 and counts[3] == 0
    assert abs(counts[2] / counts[1] - 3.0) < 0.3


def test_nms_keypoints_basic():
    # Three clusters of points; within each, a single clear max.
    xyz = np.array([[[0, 0, 0], [0.1, 0, 0], [5, 0, 0], [5.1, 0, 0], [10, 0, 0]]], np.float32)
    att = np.array([[1.0, 2.0, 5.0, 4.0, 3.0]], np.float32)
    kp, ka, num = nms_keypoints(jnp.asarray(xyz), jnp.asarray(att),
                                nms_radius=0.5, max_keypoints=4, tile=4)
    assert int(num[0]) == 3
    # Winners: idx 1 (att 2), idx 2 (att 5), idx 4 (att 3); sorted desc by att.
    np.testing.assert_allclose(np.asarray(ka)[0, :3], [5.0, 3.0, 2.0])
    np.testing.assert_allclose(np.asarray(kp)[0, 0], [5, 0, 0])
    # pad repeats the strongest keypoint
    np.testing.assert_allclose(np.asarray(kp)[0, 3], np.asarray(kp)[0, 0])


def test_nms_min_response_ratio():
    xyz = np.array([[[0, 0, 0], [5, 0, 0], [10, 0, 0]]], np.float32)
    att = np.array([[100.0, 0.5, 50.0]], np.float32)
    kp, ka, num = nms_keypoints(jnp.asarray(xyz), jnp.asarray(att),
                                nms_radius=0.5, max_keypoints=3,
                                min_response_ratio=0.02, tile=3)
    assert int(num[0]) == 2  # 0.5 < 0.02*100 pruned
