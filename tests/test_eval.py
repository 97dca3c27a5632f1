"""Eval tests: matching, rigid fit, RANSAC with outliers, FPR@95, validator."""
import numpy as np

import jax
import jax.numpy as jnp

from feat3dnet_tpu.eval import (
    ClusterPairValidator, estimate_rigid_transform, fpr_at_95_recall,
    match_descriptors, precision_at_thresholds, precision_recall,
    ransac_rigid,
)


def _random_rigid(rng):
    a = rng.randn(3, 3)
    q, _ = np.linalg.qr(a)
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = rng.randn(3) * 2.0
    return q.astype(np.float32), t.astype(np.float32)


def test_match_descriptors(rng):
    a = rng.randn(20, 8).astype(np.float32)
    b = a[[3, 7, 11]] + 1e-4
    idx, dist = match_descriptors(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_array_equal(np.asarray(idx), [3, 7, 11])
    assert np.all(np.asarray(dist) < 1e-2)


def test_estimate_rigid_transform_exact(rng):
    r, t = _random_rigid(rng)
    src = rng.randn(50, 3).astype(np.float32)
    dst = src @ r.T + t
    est = estimate_rigid_transform(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(np.asarray(est.rotation), r, atol=1e-4)
    np.testing.assert_allclose(np.asarray(est.translation), t, atol=1e-4)
    np.testing.assert_allclose(np.asarray(est.apply(jnp.asarray(src))), dst, atol=1e-4)


def test_estimate_rigid_transform_weighted(rng):
    r, t = _random_rigid(rng)
    src = rng.randn(50, 3).astype(np.float32)
    dst = src @ r.T + t
    dst[40:] += 100.0  # corrupted
    w = np.ones(50, np.float32)
    w[40:] = 0.0
    est = estimate_rigid_transform(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(est.rotation), r, atol=1e-4)


def test_ransac_rigid_with_outliers(rng):
    r, t = _random_rigid(rng)
    src = rng.randn(200, 3).astype(np.float32) * 5.0
    dst = src @ r.T + t
    n_out = 120  # 60% outliers
    dst[:n_out] = rng.randn(n_out, 3).astype(np.float32) * 20.0
    est, mask, count = ransac_rigid(jax.random.PRNGKey(0), jnp.asarray(src),
                                    jnp.asarray(dst), inlier_threshold=0.5,
                                    num_hypotheses=512)
    assert int(count) >= 75
    np.testing.assert_allclose(np.asarray(est.rotation), r, atol=1e-3)
    np.testing.assert_allclose(np.asarray(est.translation), t, atol=1e-2)
    assert np.asarray(mask)[:n_out].sum() < 5  # outliers rejected


def test_fpr_at_95():
    pos = np.linspace(0.0, 1.0, 100)
    neg_far = pos + 10.0
    assert fpr_at_95_recall(pos, neg_far) == 0.0
    neg_same = pos.copy()
    assert abs(fpr_at_95_recall(pos, neg_same) - 0.95) < 0.02


def test_precision_at_thresholds():
    errors = np.array([0.1, 0.3, 0.8, 1.5, 3.0])
    valid = np.ones(5, bool)
    p = precision_at_thresholds(errors, valid, thresholds=(0.5, 1.0, 2.0))
    assert p[0.5] == 2 / 5 and p[1.0] == 3 / 5 and p[2.0] == 4 / 5


def test_precision_recall_hand_computed():
    """prec_rec.m semantics on a 4-sample case with distinct scores:
    thresholds descend; at each, selection is score >= t."""
    score = np.array([0.1, 0.4, 0.35, 0.8])
    target = np.array([0, 0, 1, 1])
    prec, tpr, fpr, thresh = precision_recall(score, target, num_thresh=4)
    # hazen quantiles of [.1,.35,.4,.8] at 1/4, 2/4, 3/4 = .225, .375, .6;
    # plus min=.1 → descending [.6, .375, .225, .1]
    np.testing.assert_allclose(thresh, [0.6, 0.375, 0.225, 0.1])
    # selections: {.8}, {.4,.8}, {.35,.4,.8}, all
    np.testing.assert_allclose(tpr, [0.5, 0.5, 1.0, 1.0])
    np.testing.assert_allclose(fpr, [0.0, 0.5, 0.5, 1.0])
    np.testing.assert_allclose(prec, [1.0, 0.5, 2 / 3, 0.5])


def test_precision_recall_perfect_and_instance_count():
    rng = np.random.RandomState(0)
    pos = rng.rand(200) + 2.0
    neg = rng.rand(200)
    score = np.concatenate([pos, neg])
    target = np.concatenate([np.ones(200), np.zeros(200)])
    prec, tpr, fpr, thresh = precision_recall(score, target)
    # a perfectly separable scorer sweeps through (fpr=0, tpr=1)
    assert np.any((fpr == 0.0) & (tpr == 1.0))
    assert np.all(np.diff(tpr) >= -1e-12) and np.all(np.diff(fpr) >= -1e-12)
    # instanceCount grouping (prec_rec.m:146-163): rows summarizing k
    # identical-score instances must reproduce the per-instance curves
    score_g = np.array([0.9, 0.5, 0.1])
    count_g = np.array([4, 4, 4])
    target_g = np.array([3, 2, 0])          # positives within each group
    score_i = np.repeat(score_g, 4)
    target_i = np.array([1, 1, 1, 0, 1, 1, 0, 0, 0, 0, 0, 0])
    pg, tg, fg, thg = precision_recall(score_g, target_g,
                                       instance_count=count_g, num_thresh=3)
    pi, ti, fi, thi = precision_recall(score_i, target_i, num_thresh=3)
    # same unique scores → same threshold grid → identical curve points
    np.testing.assert_allclose(thg, thi)
    np.testing.assert_allclose(pg, pi)
    np.testing.assert_allclose(tg, ti)
    np.testing.assert_allclose(fg, fi)


def test_cluster_pair_validator(tmp_path, rng):
    """Synthetic clusters: positive pairs identical, negative pairs unrelated
    — a random-init model should separate them (FPR near 0)."""
    from feat3dnet_tpu.config import ModelConfig
    from feat3dnet_tpu.models import Feat3DNet

    n_pairs = 12
    lines = ["idx label"]
    for i in range(n_pairs):
        c0 = (rng.rand(100, 6).astype(np.float32) - 0.5) * 4.0
        label = i % 2
        c1 = c0 + 0.001 if label == 1 else (rng.rand(100, 6).astype(np.float32) - 0.5) * 4.0
        c0.tofile(str(tmp_path / f"{i}_0.bin"))
        c1.astype(np.float32).tofile(str(tmp_path / f"{i}_1.bin"))
        lines.append(f"{i} {label}")
    (tmp_path / "filenames.txt").write_text("\n".join(lines))

    cfg = ModelConfig(num_clusters=-1, num_samples=8, feature_dim=16, base_scale=2.0,
                      detector_mlp=(8,), detector_mlp2=(8,), descriptor_mlp=(8, 8))
    model = Feat3DNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 3)), training=False)
    validator = ClusterPairValidator(model, cfg, str(tmp_path),
                                     batch=8, max_cluster_points=128)
    fpr = validator(variables)
    assert 0.0 <= fpr <= 0.2
