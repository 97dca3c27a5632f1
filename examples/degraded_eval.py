"""Degraded-views evaluation: learned vs handcrafted under lidar-like
corruption (round 4, VERDICT #4 follow-up).

The clean synthetic proxy (scaled_accuracy_run) gives both views of a pair
the SAME point set up to SE3 + 0.02 m jitter — the easiest possible case
for a classical geometric descriptor, and the leak-fixed handcrafted
baseline (88.5 % precision@1m / 91.7 % registration) indeed beats the
learned model there (64.3 % / 83 %). That clean number alone cannot say
whether learning buys anything. Real lidar views differ by partial
overlap, occlusion, and density variation — the regime 3DFeatNet targets
(reference Readme.md's Oxford revisits). This script rebuilds the held-out
pair protocol with INDEPENDENT per-view degradation:

  * independent random subsampling (no shared point identities at all),
  * a random occlusion sector per view (distinct visible geometry),
  * stronger additive noise,

then runs BOTH pipelines (the committed 4,480-step stage-2 checkpoint and
examples/handcrafted_baseline.HandcraftedExtractor) through the IDENTICAL
eval/fig4 + eval/ransac protocol at each severity level, and appends a
"degraded_eval" section to examples/results/scaled_accuracy/summary.json.

    python examples/degraded_eval.py [--pairs 24]
"""
import argparse
import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from handcrafted_baseline import HandcraftedExtractor  # noqa: E402
from scaled_accuracy_run import (_write6, evaluate_registration,  # noqa: E402
                                 make_place, se3_view)

LEVELS = {
    # keep_frac, occlusion sector (deg), noise sigma (m)
    "clean": (1.0, 0.0, 0.02),
    "mild": (0.7, 45.0, 0.03),
    "hard": (0.5, 90.0, 0.08),
}


def degrade(rng, view, keep_frac, sector_deg, noise):
    """Independent per-view corruption: random subsample + a random
    occlusion sector (about the sensor origin) + additive noise."""
    keep = rng.rand(view.shape[0]) < keep_frac
    if sector_deg > 0.0:
        ang0 = rng.rand() * 2 * np.pi
        ang = np.arctan2(view[:, 1], view[:, 0])
        d = np.abs(np.angle(np.exp(1j * (ang - ang0))))
        keep &= d > np.radians(sector_deg) / 2
    out = view[keep]
    return (out + rng.randn(*out.shape) * noise).astype(np.float32)


def build_degraded_test(root, rng, n_pairs, keep_frac, sector_deg, noise):
    """Held-out places; exact relative SE3 known; each view independently
    degraded AFTER the transform (same groundtruths.txt format as
    scaled_accuracy_run.build_dataset)."""
    os.makedirs(root)
    gt_lines = ["idx1 idx2 t1 t2 t3 q1 q2 q3 q4"]
    for k in range(n_pairs):
        place = make_place(rng)
        v0, _, _ = se3_view(rng, place, noise=0.0)
        theta = rng.rand() * 2 * np.pi
        c, s = np.cos(theta), np.sin(theta)
        rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        t = np.zeros(3, np.float32)
        t[:2] = (rng.rand(2).astype(np.float32) - 0.5) * 4.0
        v1 = v0 @ rz.T + t
        d0 = degrade(rng, v0, keep_frac, sector_deg, noise)
        d1 = degrade(rng, v1, keep_frac, sector_deg, noise)
        a, b = 2 * k, 2 * k + 1
        _write6(os.path.join(root, f"{a}.bin"), d0)
        _write6(os.path.join(root, f"{b}.bin"), d1)
        r_inv = rz.T
        t_gt = -r_inv @ t
        q = np.array([np.cos(-theta / 2), 0.0, 0.0, np.sin(-theta / 2)])
        gt_lines.append(
            f"{a} {b} {t_gt[0]:.6f} {t_gt[1]:.6f} {t_gt[2]:.6f} "
            f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}")
    with open(os.path.join(root, "groundtruths.txt"), "w") as f:
        f.write("\n".join(gt_lines))


def eval_pipeline(pipe, test_dir, work_dir, feature_dim):
    from feat3dnet_tpu.data.io import load_point_cloud, save_descriptors
    from feat3dnet_tpu.eval.fig4 import evaluate_dataset

    result_dir = os.path.join(work_dir, "results")
    os.makedirs(result_dir, exist_ok=True)
    for fname in sorted(f for f in os.listdir(test_dir)
                        if f.endswith(".bin")):
        cloud = load_point_cloud(os.path.join(test_dir, fname), 6)
        res = pipe.extract(cloud)
        kp = np.asarray(res.keypoints)[:res.num_keypoints]
        ft = np.asarray(res.features)[:res.num_keypoints]
        save_descriptors(os.path.join(result_dir, fname), kp, ft)
    _, agg = evaluate_dataset(test_dir, result_dir, feature_dim=feature_dim)
    out = {"fig4": {k: float(v) for k, v in agg.items()}}
    evaluate_registration(pipe, test_dir, out)
    shutil.rmtree(result_dir, ignore_errors=True)
    return out


class _TrimmedPipe:
    """evaluate_registration consumes .keypoints/.features full-size; the
    learned pipeline right-pads to max_keypoints — trim to num_keypoints
    so padded rows never enter matching (same convention as
    process_directory outputs)."""

    def __init__(self, pipe):
        self._pipe = pipe

    def extract(self, cloud):
        res = self._pipe.extract(cloud)
        n = int(res.num_keypoints)

        class R:
            keypoints = np.asarray(res.keypoints)[:n]
            features = np.asarray(res.features)[:n]
            num_keypoints = n
        return R


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pairs", type=int, default=24)
    p.add_argument("--ckpt",
                   default=os.path.join(
                       os.path.dirname(os.path.abspath(__file__)),
                       "results", "scaled_accuracy", "ckpt"))
    p.add_argument("--results_dir",
                   default=os.path.join(
                       os.path.dirname(os.path.abspath(__file__)),
                       "results", "scaled_accuracy"))
    args = p.parse_args()

    import jax
    if os.environ.get("F3D_CPU"):
        # JAX_PLATFORMS=cpu is too late here (sitecustomize preloads
        # jax) — the config update is the working escape hatch
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from feat3dnet_tpu.config import InferenceConfig, ModelConfig, TrainConfig
    from feat3dnet_tpu.inference import InferencePipeline
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.train.trainer import init_state
    from feat3dnet_tpu.utils import enable_compilation_cache
    from feat3dnet_tpu.utils.checkpoint import CheckpointManager

    enable_compilation_cache()
    cfg = ModelConfig(num_clusters=256, num_samples=64)
    model = Feat3DNet(cfg)
    state, _ = init_state(model, TrainConfig(), cfg, jax.random.PRNGKey(0))
    state = CheckpointManager(os.path.abspath(args.ckpt)).restore(state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    print(f"learned weights: step {int(state.step)}", flush=True)
    learned = _TrimmedPipe(
        InferencePipeline(model, variables, cfg, InferenceConfig()))
    handcrafted = HandcraftedExtractor(max_keypoints=1024)

    out = {"pairs": args.pairs, "levels": {}}
    for level, (keep, sector, noise) in LEVELS.items():
        rng = np.random.RandomState(7)
        root = tempfile.mkdtemp(prefix=f"f3d_degraded_{level}_")
        test_dir = os.path.join(root, "test")
        build_degraded_test(test_dir, rng, args.pairs, keep, sector, noise)
        entry = {"keep_frac": keep, "occlusion_sector_deg": sector,
                 "noise_m": noise}
        for name, pipe, fd in (("learned", learned, cfg.feature_dim),
                               ("handcrafted", handcrafted, 24)):
            entry[name] = eval_pipeline(pipe, test_dir, root, fd)
            print(f"{level:5s} {name:11s}: p@1m "
                  f"{entry[name]['fig4']['precision_at_1m']:.1f}%  reg "
                  f"{entry[name]['registration']['success_rate']:.2f}",
                  flush=True)
        out["levels"][level] = entry
        shutil.rmtree(root, ignore_errors=True)

    spath = os.path.join(args.results_dir, "summary.json")
    full = json.load(open(spath)) if os.path.exists(spath) else {}
    full["degraded_eval"] = out
    with open(spath, "w") as f:
        json.dump(full, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
