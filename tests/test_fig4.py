"""Fig.4 evaluation pipeline tests on synthetic geometry."""
import os

import numpy as np

from feat3dnet_tpu.eval.fig4 import (
    PairStatistic, evaluate_pair, precision_curve, read_groundtruths,
)
from feat3dnet_tpu.dataprep.kitti import write_groundtruths


def test_groundtruths_roundtrip(tmp_path):
    pairs = [(0, 3, np.array([1.0, 2.0, 3.0]), np.array([1.0, 0.0, 0.0, 0.0]))]
    path = str(tmp_path / "groundtruths.txt")
    write_groundtruths(path, pairs)
    got = read_groundtruths(path)
    assert got[0][0] == 0 and got[0][1] == 3
    np.testing.assert_allclose(got[0][2], [1, 2, 3])
    np.testing.assert_allclose(got[0][3], [1, 0, 0, 0])


def test_evaluate_pair_perfect_matches(rng):
    # cloud2 = cloud1 shifted by t; identical descriptors per keypoint
    cloud1 = rng.rand(500, 3).astype(np.float32) * 20.0
    t = np.array([5.0, 0.0, 0.0])
    cloud2 = (cloud1 - t).astype(np.float32)          # T(p2) = p2 + t = p1
    kp1 = cloud1[:40]
    kp2 = cloud2[:40]
    desc = rng.randn(40, 16).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    stat = evaluate_pair(cloud1, kp1, desc, cloud2, kp2, desc,
                         np.eye(3), t)
    assert stat.num_putative == 40          # full overlap
    assert stat.num_correct == 40           # identical descriptors match 1:1
    assert np.max(stat.match_errors) < 1e-4


def test_evaluate_pair_no_overlap(rng):
    cloud1 = rng.rand(100, 3).astype(np.float32)
    cloud2 = cloud1 + 100.0
    kp = cloud1[:10]
    desc = rng.randn(10, 8).astype(np.float32)
    stat = evaluate_pair(cloud1, kp, desc, cloud2, kp + 100.0, desc,
                         np.eye(3), np.zeros(3))      # WRONG transform
    assert stat.num_putative == 0


def test_precision_curve():
    stats = [PairStatistic(4, 2, np.array([0.05, 0.5, 2.0, 5.0]))]
    d, p = precision_curve(stats, distances=np.array([0.1, 1.0, 3.0, 10.0]))
    np.testing.assert_allclose(p, [25.0, 50.0, 75.0, 100.0])
