"""Visualization smoke tests (headless Agg backend, files written)."""
import os

import numpy as np

from feat3dnet_tpu.eval.visualize import plot_alignment, plot_matches, plot_point_clouds


def test_plot_point_clouds(tmp_path, rng):
    c = rng.rand(200, 3).astype(np.float32)
    out = plot_point_clouds(c, c + 1.0, out_path=str(tmp_path / "c.png"))
    assert os.path.getsize(out) > 1000


def test_plot_matches_and_alignment(tmp_path, rng):
    c1 = rng.rand(300, 3).astype(np.float32) * 10
    c2 = c1 + np.array([2.0, 0, 0], np.float32)
    kp1, kp2 = c1[:20], c2[:20]
    matches = np.arange(20)
    inliers = np.ones(20, bool); inliers[::4] = False
    p1 = plot_matches(c1, kp1, c2, kp2, matches, inliers,
                      out_path=str(tmp_path / "m.png"))
    p2 = plot_alignment(c1, c2, np.eye(3), np.array([-2.0, 0, 0]),
                        out_path=str(tmp_path / "a.png"))
    assert os.path.getsize(p1) > 1000 and os.path.getsize(p2) > 1000
