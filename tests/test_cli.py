"""CLI smoke tests: a miniature two-stage training run + inference over the
outputs, all through the argparse drivers (the reference's train.sh flow)."""
import json
import os

import numpy as np
import pytest


@pytest.fixture
def tiny_dataset(tmp_path):
    rng = np.random.RandomState(0)
    train_dir = tmp_path / "train"
    clusters = tmp_path / "clusters"
    train_dir.mkdir()
    clusters.mkdir()
    lines = []
    for i in range(4):
        cloud = (rng.rand(300, 6).astype(np.float32) - 0.5) * 12.0
        cloud.tofile(str(train_dir / f"{i}.bin"))
        lines.append(f"{i}.bin | {(i + 1) % 4} | {(i + 2) % 4}")
    (train_dir / "train.txt").write_text("\n".join(lines))
    # validation cluster pairs
    vlines = ["idx label"]
    for i in range(4):
        c = (rng.rand(60, 6).astype(np.float32) - 0.5) * 4.0
        label = i % 2
        c.tofile(str(clusters / f"{i}_0.bin"))
        other = c + 0.001 if label else (rng.rand(60, 6).astype(np.float32) - 0.5) * 4.0
        other.astype(np.float32).tofile(str(clusters / f"{i}_1.bin"))
        vlines.append(f"{i} {label}")
    (clusters / "filenames.txt").write_text("\n".join(vlines))
    return tmp_path


def test_train_cli_two_stage_and_infer(tiny_dataset, tmp_path):
    from feat3dnet_tpu.cli.train import main as train_main
    from feat3dnet_tpu.cli.infer import main as infer_main

    common = ["--data_dir", str(tiny_dataset), "--num_points", "128",
              "--num_clusters", "8", "--num_samples", "8",
              "--feature_dim", "16", "--batch_size", "2",
              "--validate_every_n_steps", "2", "--checkpoint_every_n_steps", "2",
              "--summary_every_n_steps", "1"]

    stage1_dir = str(tmp_path / "s1")
    state = train_main(common + [
        "--noattention", "--noregress", "--num_epochs", "1",
        "--augmentation", "Jitter", "RotateSmall", "Shift",
        "--log_dir", stage1_dir])
    assert int(state.step) == 2  # 4 anchors / batch 2
    assert os.path.exists(os.path.join(stage1_dir, "metrics.jsonl"))

    stage2_dir = str(tmp_path / "s2")
    state2 = train_main(common + [
        "--num_epochs", "1",
        "--augmentation", "Jitter", "RotateSmall", "Shift", "Rotate1D",
        "--checkpoint", stage1_dir, "--restore_exclude", "detection",
        "--log_dir", stage2_dir])
    # resumed step counter from stage 1 ckpt
    assert int(state2.step) == 4

    # metrics stream contains loss and fp_rate entries
    rows = [json.loads(l) for l in open(os.path.join(stage2_dir, "metrics.jsonl"))]
    assert any("loss" in r for r in rows)
    assert any("fp_rate" in r for r in rows)

    out_dir = str(tmp_path / "desc_out")
    infer_main(["--data_dir", str(tiny_dataset / "train"),
                "--output_dir", out_dir,
                "--checkpoint", os.path.join(stage2_dir, "ckpt"),
                "--num_samples", "8", "--feature_dim", "16",
                "--max_keypoints", "16", "--batch_size", "2"])
    outs = [f for f in os.listdir(out_dir) if f.endswith(".bin")]
    assert len(outs) == 4


def test_train_cli_steps_per_dispatch(tiny_dataset, tmp_path):
    """--steps_per_dispatch k chains k optimizer steps per device dispatch;
    per-inner-step metrics must still stream at the summary cadence and the
    step counter/checkpoint cadence must match the unchained loop."""
    from feat3dnet_tpu.cli.train import main as train_main

    log_dir = str(tmp_path / "chained")
    state = train_main([
        "--data_dir", str(tiny_dataset), "--num_points", "128",
        "--num_clusters", "8", "--num_samples", "8",
        "--feature_dim", "16", "--batch_size", "2",
        "--noattention", "--noregress", "--num_epochs", "2",
        "--steps_per_dispatch", "2", "--upload_quant", "int16",
        "--augmentation", "Jitter", "RotateSmall",
        "--validate_every_n_steps", "2", "--checkpoint_every_n_steps", "2",
        "--summary_every_n_steps", "1",
        "--log_dir", log_dir])
    # 4 anchors / batch 2 = 2 steps per epoch -> one 2-step chunk each
    assert int(state.step) == 4
    rows = [json.loads(l) for l in open(os.path.join(log_dir, "metrics.jsonl"))]
    loss_steps = [r["step"] for r in rows if "loss" in r]
    assert loss_steps == [1, 2, 3, 4]  # every inner step logged
    assert any("fp_rate" in r for r in rows)
    assert os.path.isdir(os.path.join(log_dir, "ckpt"))


def test_train_cli_fused_towers_dp(tiny_dataset, tmp_path):
    """--fused_towers with --num_devices routes through the shard_map DP
    builders (Pallas tower kernels run per-shard, BN moments psum'd) —
    the full CLI loop must train, log, and checkpoint as usual."""
    from feat3dnet_tpu.cli.train import main as train_main

    log_dir = str(tmp_path / "fused_dp")
    state = train_main([
        "--data_dir", str(tiny_dataset), "--num_points", "128",
        "--num_clusters", "8", "--num_samples", "8",
        "--feature_dim", "16", "--batch_size", "2",
        "--noattention", "--noregress", "--num_epochs", "1",
        "--fused_towers", "--num_devices", "2",
        "--steps_per_dispatch", "2",
        "--augmentation", "Jitter", "RotateSmall",
        "--validate_every_n_steps", "2", "--checkpoint_every_n_steps", "2",
        "--summary_every_n_steps", "1",
        "--log_dir", log_dir])
    assert int(state.step) == 2
    rows = [json.loads(l) for l in open(os.path.join(log_dir, "metrics.jsonl"))]
    assert [r["step"] for r in rows if "loss" in r] == [1, 2]
    assert os.path.isdir(os.path.join(log_dir, "ckpt"))
