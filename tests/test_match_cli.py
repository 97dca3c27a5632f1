"""match CLI end-to-end on synthetic registrable descriptor files, plus the
fig4 directory driver."""
import json
import os

import numpy as np

from feat3dnet_tpu.cli.match import main as match_main
from feat3dnet_tpu.data.io import save_descriptors, save_point_cloud


def _make_pair(tmp_path, rng, n_kp=60, inlier_noise=0.02):
    """Two clouds related by a rigid transform with mostly-matching
    descriptors."""
    from tests.test_eval import _random_rigid
    r, t = _random_rigid(rng)
    kp2 = rng.rand(n_kp, 3).astype(np.float32) * 20.0
    kp1 = (kp2 @ r.T + t + inlier_noise * rng.randn(n_kp, 3)).astype(np.float32)
    desc = rng.randn(n_kp, 32).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    # corrupt 20% of descriptors in cloud 2 (outlier matches)
    desc2 = desc.copy()
    bad = rng.choice(n_kp, n_kp // 5, replace=False)
    desc2[bad] = rng.randn(len(bad), 32).astype(np.float32)
    desc2 /= np.linalg.norm(desc2, axis=1, keepdims=True)

    save_descriptors(str(tmp_path / "a.bin"), kp1, desc)
    save_descriptors(str(tmp_path / "b.bin"), kp2, desc2)
    save_point_cloud(str(tmp_path / "cloud_a.bin"),
                     np.concatenate([kp1, np.zeros_like(kp1)], 1))
    save_point_cloud(str(tmp_path / "cloud_b.bin"),
                     np.concatenate([kp2, np.zeros_like(kp2)], 1))
    return r, t


def test_match_cli_recovers_transform(tmp_path, rng):
    r, t = _make_pair(tmp_path, rng)
    result = match_main([
        "--desc1", str(tmp_path / "a.bin"), "--desc2", str(tmp_path / "b.bin"),
        "--cloud1", str(tmp_path / "cloud_a.bin"),
        "--cloud2", str(tmp_path / "cloud_b.bin"),
        "--inlier_threshold", "0.5", "--num_hypotheses", "512",
        "--plot_dir", str(tmp_path / "figs")])
    assert result["num_inliers"] >= 40
    np.testing.assert_allclose(np.array(result["rotation"]), r, atol=0.05)
    np.testing.assert_allclose(np.array(result["translation"]), t, atol=0.2)
    assert os.path.exists(str(tmp_path / "figs" / "matches.png"))
    assert os.path.exists(str(tmp_path / "figs" / "alignment.png"))


def test_fig4_directory_driver(tmp_path, rng):
    from feat3dnet_tpu.dataprep.kitti import write_groundtruths
    from feat3dnet_tpu.eval.fig4 import evaluate_dataset

    # identical clouds, identity transform, shared descriptors -> perfect
    cloud = rng.rand(500, 3).astype(np.float32) * 20.0
    kp = cloud[:30]
    desc = rng.randn(30, 32).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    data, results = tmp_path / "data", tmp_path / "res"
    data.mkdir(), results.mkdir()
    for idx in (0, 1):
        save_point_cloud(str(data / f"{idx}.bin"),
                         np.concatenate([cloud, np.zeros_like(cloud)], 1))
        save_descriptors(str(results / f"{idx}.bin"), kp, desc)
    write_groundtruths(str(data / "groundtruths.txt"),
                       [(0, 1, np.zeros(3), np.array([1.0, 0, 0, 0]))])
    stats, summary = evaluate_dataset(str(data), str(results), log=lambda *a: None)
    assert summary["pairs"] == 1
    assert summary["total_correct"] == summary["total_putative"] == 30
    assert summary["precision_at_1m"] == 100.0


def test_train_cli_dp_on_virtual_mesh(tmp_path, rng):
    """--num_devices 2 drives the sharded train step through the CLI."""
    from feat3dnet_tpu.cli.train import main as train_main

    train_dir = tmp_path / "train"
    train_dir.mkdir()
    lines = []
    for i in range(4):
        cloud = (rng.rand(300, 6).astype(np.float32) - 0.5) * 12.0
        cloud.tofile(str(train_dir / f"{i}.bin"))
        lines.append(f"{i}.bin | {(i + 1) % 4} | {(i + 2) % 4}")
    (train_dir / "train.txt").write_text("\n".join(lines))

    state = train_main([
        "--data_dir", str(tmp_path), "--num_points", "128",
        "--num_clusters", "8", "--num_samples", "8", "--feature_dim", "16",
        "--batch_size", "2", "--num_epochs", "1", "--num_devices", "2",
        "--checkpoint_every_n_steps", "100", "--summary_every_n_steps", "1",
        "--log_dir", str(tmp_path / "run")])
    assert int(state.step) == 2
