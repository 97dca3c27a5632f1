"""Scaled end-to-end accuracy demonstration (round-3, VERDICT #4).

The closest in-environment proxy for the blocked real-data accuracy gate
(Oxford/KITTI + the TF1 checkpoint are unreachable — zero egress): a
few-hundred-place structured synthetic dataset in the exact reference
directory layout, trained with the REAL two-stage recipe
(scripts/train_two_stage.sh protocol = reference train.sh:8-23) for
thousands of steps, then evaluated on HELD-OUT places:

  * FPR@95 on held-out cluster pairs (the reference validation metric,
    train.py:260-315);
  * Fig.4 keypoint-matching precision via eval/fig4 (fig4_step1/2.m);
  * RANSAC registration success (rotation/translation error vs known SE3)
    via the full inference pipeline + eval/matching + eval/ransac.

Outputs land in examples/results/scaled_accuracy/: stage metrics.jsonl
mirrors, summary.json, and the precision curve. ~15-30 min on the v5e.

    python examples/scaled_accuracy_run.py
    python examples/scaled_accuracy_run.py --places 48 --stage2_epochs 4  # smoke
"""
import argparse
import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synthetic_training_demo import make_place as _make_patch_place  # noqa: E402


def make_place(rng, extent=18.0):
    """Structured scene: planar patches + vertical poles + box corners —
    geometry with distinctive local structure for descriptors to latch on."""
    parts = [_make_patch_place(rng, n_patches=20, extent=extent)]
    # poles (tree-trunk/lamp-post-like vertical structures)
    for _ in range(8):
        base = (rng.rand(3) - 0.5) * np.array([2 * extent, 2 * extent, 0.5])
        h = 2.0 + 4.0 * rng.rand()
        z = rng.rand(140, 1) * h
        ang = rng.rand(140, 1) * 2 * np.pi
        rad = 0.1 + 0.1 * rng.rand()
        parts.append(base + np.concatenate(
            [rad * np.cos(ang), rad * np.sin(ang), z], axis=1))
    # box corners (building-corner-like intersections of 3 planes)
    for _ in range(5):
        c = (rng.rand(3) - 0.5) * np.array([2 * extent, 2 * extent, 3.0])
        s = 1.0 + 2.0 * rng.rand()
        for axes in ((0, 1), (0, 2), (1, 2)):
            uv = rng.rand(70, 2) * s
            pts = np.tile(c, (70, 1))
            pts[:, axes[0]] += uv[:, 0]
            pts[:, axes[1]] += uv[:, 1]
            parts.append(pts)
    cloud = np.concatenate(parts, axis=0).astype(np.float32)
    keep = np.sum(cloud[:, :2] ** 2, axis=1) < extent * extent
    return cloud[keep]


def se3_view(rng, place, max_shift=2.0, noise=0.02):
    """Apply a known z-rotation + shift: view = place @ Rz(theta).T + t.
    Returns (view, theta, t)."""
    theta = rng.rand() * 2 * np.pi
    c, s = np.cos(theta), np.sin(theta)
    rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    t = np.zeros(3, np.float32)
    t[:2] = (rng.rand(2).astype(np.float32) - 0.5) * 2 * max_shift
    view = place @ rz.T + t
    view = view + rng.randn(*view.shape).astype(np.float32) * noise
    return view.astype(np.float32), theta, t


def _write6(path, xyz):
    np.concatenate([xyz, np.zeros_like(xyz)], axis=1).astype(
        np.float32).tofile(path)


def _cluster_pairs(folder, rng, places, n_pairs, crop_radius=4.0):
    """Reference clusters/ layout: {i}_0.bin/{i}_1.bin + filenames.txt."""
    os.makedirs(folder, exist_ok=True)
    lines = ["idx label"]
    for k in range(n_pairs):
        label = k % 2
        pa = rng.randint(len(places))
        place = places[pa]
        center = place[rng.randint(place.shape[0])]
        crop = place[np.linalg.norm(place - center, axis=1) < crop_radius] - center
        v0, _, _ = se3_view(rng, crop, max_shift=0.2)
        if label:
            v1, _, _ = se3_view(rng, crop, max_shift=0.2)
        else:
            pb = (pa + 1 + rng.randint(len(places) - 1)) % len(places)
            other = places[pb]
            c2 = other[rng.randint(other.shape[0])]
            v1, _, _ = se3_view(
                rng, other[np.linalg.norm(other - c2, axis=1) < crop_radius] - c2,
                max_shift=0.2)
        _write6(os.path.join(folder, f"{k}_0.bin"), v0)
        _write6(os.path.join(folder, f"{k}_1.bin"), v1)
        lines.append(f"{k} {label}")
    with open(os.path.join(folder, "filenames.txt"), "w") as f:
        f.write("\n".join(lines))


def build_dataset(root, rng, n_places, n_views, n_val_pairs, n_test_pairs):
    train = os.path.join(root, "train")
    os.makedirs(train)
    places = [make_place(rng) for _ in range(n_places)]

    lines = []
    idx = 0
    for place in places:
        ids = []
        for _ in range(n_views):
            view, _, _ = se3_view(rng, place)
            _write6(os.path.join(train, f"{idx}.bin"), view)
            ids.append(idx)
            idx += 1
        pos = " ".join(str(j) for j in ids)
        for i in ids:
            lines.append(f"{i}.bin | {pos} | {pos}")
    with open(os.path.join(train, "train.txt"), "w") as f:
        f.write("\n".join(lines))

    # training-time validation pairs from TRAIN places (reference protocol)
    _cluster_pairs(os.path.join(root, "clusters"), rng, places, n_val_pairs)

    # HELD-OUT: fresh places never seen in training
    test_places = [make_place(rng) for _ in range(n_test_pairs)]
    _cluster_pairs(os.path.join(root, "clusters_test"), rng, test_places,
                   n_val_pairs)
    test = os.path.join(root, "test")
    os.makedirs(test)
    gt_lines = ["idx1 idx2 t1 t2 t3 q1 q2 q3 q4"]
    for k, place in enumerate(test_places):
        v0, _, _ = se3_view(rng, place)                 # cloud a (reference frame)
        v1, theta, t = se3_view(rng, place)             # cloud b = Rg v? no:
        # v0 = place·R0+t0+e, v1 = place·R1+t1+e. The fig4/gt convention is
        # cloud_a ≈ R·cloud_b + t. Generate v1 FROM v0's frame instead so
        # the relative SE3 is exactly known: v1 = Rz(theta)·v0 + t (+noise).
        c, s = np.cos(theta), np.sin(theta)
        rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        v1 = v0 @ rz.T + t + rng.randn(*v0.shape).astype(np.float32) * 0.02
        a, b = 2 * k, 2 * k + 1
        _write6(os.path.join(test, f"{a}.bin"), v0)
        _write6(os.path.join(test, f"{b}.bin"), v1)
        # cloud_a = R·cloud_b + t_gt with R = Rz(-theta), t_gt = -R t
        r_inv = rz.T
        t_gt = -r_inv @ t
        q = np.array([np.cos(-theta / 2), 0.0, 0.0, np.sin(-theta / 2)])
        gt_lines.append(
            f"{a} {b} {t_gt[0]:.6f} {t_gt[1]:.6f} {t_gt[2]:.6f} "
            f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}")
    with open(os.path.join(test, "groundtruths.txt"), "w") as f:
        f.write("\n".join(gt_lines))
    return root


def evaluate_registration(pipe, test_dir, out):
    """Extract → mutual matches → RANSAC → compare vs known SE3."""
    import jax
    import jax.numpy as jnp

    from feat3dnet_tpu.eval.fig4 import read_groundtruths
    from feat3dnet_tpu.eval.matching import match_descriptors, mutual_matches
    from feat3dnet_tpu.eval.ransac import ransac_rigid
    from feat3dnet_tpu.dataprep.oxford import rotmat_from_quat
    from feat3dnet_tpu.data.io import load_point_cloud

    pairs = read_groundtruths(os.path.join(test_dir, "groundtruths.txt"))
    rot_errs, trans_errs, inliers, successes = [], [], [], []
    for a, b, t_gt, q_gt in pairs:
        ca = load_point_cloud(os.path.join(test_dir, f"{a}.bin"), 6)
        cb = load_point_cloud(os.path.join(test_dir, f"{b}.bin"), 6)
        ra = pipe.extract(ca)
        rb = pipe.extract(cb)
        fa, fb = jnp.asarray(ra.features), jnp.asarray(rb.features)
        nn_in_a, _ = match_descriptors(fa, fb)     # per-B nearest in A
        mutual = np.asarray(mutual_matches(fa, fb))
        sel = np.nonzero(mutual)[0]
        if sel.size < 3:
            successes.append(False)
            continue
        src = jnp.asarray(rb.keypoints[sel])
        dst = jnp.asarray(ra.keypoints[np.asarray(nn_in_a)[sel]])
        tf, _, n_in = ransac_rigid(jax.random.PRNGKey(0), src, dst,
                                   inlier_threshold=1.0)
        r_est = np.asarray(tf.rotation)
        t_est = np.asarray(tf.translation)
        r_gt = rotmat_from_quat(q_gt)
        cosang = (np.trace(r_est.T @ r_gt) - 1) / 2
        rot_err = np.degrees(np.arccos(np.clip(cosang, -1, 1)))
        trans_err = np.linalg.norm(t_est - t_gt)
        rot_errs.append(float(rot_err))
        trans_errs.append(float(trans_err))
        inliers.append(int(n_in))
        successes.append(bool(rot_err < 5.0 and trans_err < 2.0))
    out["registration"] = {
        "n_pairs": len(pairs),
        "success_rate": float(np.mean(successes)) if successes else 0.0,
        "median_rot_err_deg": float(np.median(rot_errs)) if rot_errs else None,
        "median_trans_err_m": float(np.median(trans_errs)) if trans_errs else None,
        "median_inliers": float(np.median(inliers)) if inliers else None,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--places", type=int, default=240)
    p.add_argument("--views", type=int, default=4)
    p.add_argument("--val_pairs", type=int, default=96)
    p.add_argument("--test_pairs", type=int, default=24)
    p.add_argument("--stage1_epochs", type=int, default=4)
    p.add_argument("--stage2_epochs", type=int, default=24)
    p.add_argument("--num_points", type=int, default=4096)
    p.add_argument("--num_clusters", type=int, default=256)
    p.add_argument("--num_samples", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=6)
    p.add_argument("--learning_rate", type=float, default=5e-5)
    p.add_argument("--lr_schedule", default="constant",
                   choices=["constant", "cosine"])
    p.add_argument("--warmup_steps", type=int, default=0)
    p.add_argument("--keep_dir", default=None)
    p.add_argument("--eval_only", action="store_true",
                   help="skip dataset build + training; evaluate the "
                        "existing --keep_dir run_stage2 checkpoint")
    p.add_argument("--results_dir",
                   default=os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                        "results", "scaled_accuracy"))
    args = p.parse_args()

    from feat3dnet_tpu.cli.train import main as train_main
    from feat3dnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    root = args.keep_dir or tempfile.mkdtemp(prefix="f3d_scaled_")
    if not args.eval_only:
        rng = np.random.RandomState(0)
        print("building dataset...", flush=True)
        build_dataset(root, rng, args.places, args.views, args.val_pairs,
                      args.test_pairs)
        print(f"dataset at {root}: {args.places} places x {args.views} views",
              flush=True)

    # combined two-stage horizon for the cosine schedule (see below)
    spe = args.places * args.views // args.batch_size
    total = spe * (args.stage1_epochs + args.stage2_epochs)
    common = [
        "--data_dir", root, "--num_points", str(args.num_points),
        "--num_clusters", str(args.num_clusters),
        "--num_samples", str(args.num_samples),
        "--batch_size", str(args.batch_size),
        "--learning_rate", str(args.learning_rate),
        "--validate_every_n_steps", "100",
        "--summary_every_n_steps", "20",
        "--checkpoint_every_n_steps", "500",
    ]
    if args.lr_schedule != "constant":
        # ONE global schedule across both stages: same combined-horizon
        # decay_steps in each stage; stage 2 resumes the schedule count
        # from the restored opt_state (see cli/train --lr_schedule help)
        common += ["--lr_schedule", args.lr_schedule,
                   "--warmup_steps", str(args.warmup_steps),
                   "--decay_steps", str(total)]
    s1 = os.path.join(root, "run_stage1")
    s2 = os.path.join(root, "run_stage2")
    if not args.eval_only:
        # stage 1: descriptor-only, rotation-free augs (train.sh:8-13)
        train_main(common + [
            "--log_dir", s1, "--noattention", "--noregress",
            "--augmentation", "Jitter", "RotateSmall", "Shift",
            "--num_epochs", str(args.stage1_epochs)])
        # stage 2: full model, restore minus detection scope, add Rotate1D
        train_main(common + [
            "--log_dir", s2, "--checkpoint", s1,
            "--restore_exclude", "detection",
            "--augmentation", "Jitter", "RotateSmall", "Shift", "Rotate1D",
            "--num_epochs", str(args.stage2_epochs)])

    # ---- held-out evaluation with the stage-2 final weights --------------
    import jax

    from feat3dnet_tpu.config import InferenceConfig, ModelConfig, TrainConfig
    from feat3dnet_tpu.eval.fig4 import evaluate_dataset
    from feat3dnet_tpu.eval.validate import ClusterPairValidator
    from feat3dnet_tpu.inference import InferencePipeline
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.train.trainer import init_state
    from feat3dnet_tpu.utils.checkpoint import CheckpointManager

    cfg = ModelConfig(num_clusters=args.num_clusters,
                      num_samples=args.num_samples)
    model = Feat3DNet(cfg)
    # the restore target's opt_state tree must match the checkpoint's:
    # the cosine schedule keeps its count in opt_state ('constant' keeps
    # the reference's plain float-lr structure)
    from feat3dnet_tpu.train.trainer import make_optimizer
    tx = make_optimizer(args.learning_rate, None, args.lr_schedule,
                        args.warmup_steps,
                        total if args.lr_schedule != "constant" else 0)
    state, _ = init_state(
        model, TrainConfig(batch_size=args.batch_size,
                           num_points=args.num_points),
        cfg, jax.random.PRNGKey(0), tx=tx)
    state = CheckpointManager(os.path.join(s2, "ckpt")).restore(state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    print(f"restored stage-2 step {int(state.step)}", flush=True)

    summary = {"final_step": int(state.step)}
    val = ClusterPairValidator(model, cfg, os.path.join(root, "clusters_test"))
    summary["heldout_fpr95"] = float(val(variables))
    print(f"held-out FPR@95: {summary['heldout_fpr95']:.4f}", flush=True)

    pipe = InferencePipeline(model, variables, cfg, InferenceConfig())
    test_dir = os.path.join(root, "test")
    result_dir = os.path.join(root, "test_results")
    pipe.process_directory(test_dir, result_dir, data_dim=6)
    stats, agg = evaluate_dataset(test_dir, result_dir)
    summary["fig4"] = {k: float(v) for k, v in agg.items()}
    evaluate_registration(pipe, test_dir, summary)

    # matched-budget protocol (the handcrafted baseline serves its FULL
    # 1024-keypoint budget; the default ratio gate prunes to ~150 — the
    # r5 sweep showed the precision gap at matched budgets is mostly this
    # keypoint-budget accounting, examples/eval_inference_sweep.py)
    summary["matched_budget"] = {}
    for name, icfg in {
        "kp1024_ratio0_nms02": InferenceConfig(min_response_ratio=0.0,
                                               nms_radius=0.2),
        "kp1024_ratio0_nms015": InferenceConfig(min_response_ratio=0.0,
                                                nms_radius=0.15),
    }.items():
        mpipe = InferencePipeline(model, variables, cfg, icfg)
        mdir = os.path.join(root, f"test_results_{name}")
        mpipe.process_directory(test_dir, mdir, data_dim=6)
        _, magg = evaluate_dataset(test_dir, mdir,
                                   log=lambda *a, **k: None)
        entry = {"fig4": {k: float(v) for k, v in magg.items()}}
        evaluate_registration(mpipe, test_dir, entry)
        summary["matched_budget"][name] = entry
        print(name, json.dumps(entry), flush=True)

    os.makedirs(args.results_dir, exist_ok=True)
    for stage, d in (("stage1", s1), ("stage2", s2)):
        src = os.path.join(d, "metrics.jsonl")
        if os.path.exists(src):
            shutil.copy(src, os.path.join(args.results_dir,
                                          f"metrics_{stage}.jsonl"))
    spath = os.path.join(args.results_dir, "summary.json")
    if os.path.exists(spath):
        # keep the handcrafted-baseline section (examples/
        # handcrafted_baseline.py appends it; the seeded test split is
        # identical as long as the dataset args are, so it stays valid)
        prev = json.load(open(spath))
        if "handcrafted_baseline" in prev and args.places == 240 \
                and args.views == 4 and args.val_pairs == 96 \
                and args.test_pairs == 24:
            summary["handcrafted_baseline"] = prev["handcrafted_baseline"]
    with open(spath, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    if not args.keep_dir:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
