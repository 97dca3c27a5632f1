"""Non-learned baseline for the scaled accuracy run (round-4, VERDICT #4).

The learned numbers (held-out Fig.4 precision@1m 64.3 %, registration
success 83 % — examples/results/scaled_accuracy/summary.json) had no
comparison anchor. This runs a HANDCRAFTED descriptor pipeline through the
IDENTICAL protocol on the IDENTICAL held-out pairs:

  * the dataset is rebuilt with the same seed/args as
    scaled_accuracy_run.py (deterministic: same rng(0) call sequence →
    bit-identical test places, views, and groundtruths);
  * keypoints: farthest-point sampling (non-learned, same max_keypoints
    budget as the learned pipeline's NMS);
  * descriptors: classical z-rotation-invariant local features over the
    same radius-2.0 neighborhoods — PCA shape features
    (linearity/planarity/sphericity, smallest-eigenvector verticality),
    an 8-bin relative-height histogram, an 8-bin horizontal-radius
    histogram, and log density — L2-normalized (24-D);
  * evaluation: the same eval/fig4 precision protocol
    (reference fig4_step1.m:9-10 thresholds) and the same
    mutual-match + eval/ransac registration as evaluate_registration.

Appends a "handcrafted_baseline" section to
examples/results/scaled_accuracy/summary.json.

    python examples/handcrafted_baseline.py
"""
import argparse
import dataclasses
import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scaled_accuracy_run import build_dataset, evaluate_registration  # noqa: E402


def fps_numpy(xyz: np.ndarray, k: int, seed_idx: int = 0) -> np.ndarray:
    """Plain numpy farthest-point sampling (host baseline — no model)."""
    n = xyz.shape[0]
    k = min(k, n)
    idx = np.empty(k, np.int64)
    idx[0] = seed_idx
    d = np.sum((xyz - xyz[seed_idx]) ** 2, axis=1)
    for i in range(1, k):
        idx[i] = int(np.argmax(d))
        d = np.minimum(d, np.sum((xyz - xyz[idx[i]]) ** 2, axis=1))
    return idx


def handcrafted_descriptor(neigh: np.ndarray, radius: float) -> np.ndarray:
    """24-D z-rotation-invariant local descriptor of a centered
    neighborhood (m, 3). Returns zeros for degenerate (<4 pt) balls."""
    out = np.zeros(24, np.float32)
    m = neigh.shape[0]
    if m >= 4:
        cov = np.cov(neigh.T)
        w, v = np.linalg.eigh(cov)            # ascending
        w = np.maximum(w[::-1], 1e-12)        # λ1 ≥ λ2 ≥ λ3
        e3 = v[:, 0]                          # smallest-λ direction
        s = w.sum()
        out[0] = (w[0] - w[1]) / w[0]         # linearity
        out[1] = (w[1] - w[2]) / w[0]         # planarity
        out[2] = w[2] / w[0]                  # sphericity
        out[3] = abs(e3[2])                   # normal verticality
        out[4] = np.sqrt(w[0] / s)
        out[5] = np.sqrt(w[2] / s)
        out[6] = np.log1p(float(m)) / 8.0     # density
        zs = neigh[:, 2]
        hh, _ = np.histogram(zs, bins=8, range=(-radius, radius))
        out[7:15] = hh / m
        rr = np.linalg.norm(neigh[:, :2], axis=1)
        rh, _ = np.histogram(rr, bins=8, range=(0.0, radius))
        out[15:23] = rh / m
        out[23] = float(np.std(zs)) / radius
    nrm = np.linalg.norm(out)
    return out / nrm if nrm > 1e-8 else out


@dataclasses.dataclass
class BaselineResult:
    keypoints: np.ndarray
    features: np.ndarray
    attention: np.ndarray
    num_keypoints: int


class HandcraftedExtractor:
    """Duck-typed InferencePipeline.extract for the baseline pipeline."""

    def __init__(self, max_keypoints: int = 1024, radius: float = 2.0):
        self.max_keypoints = max_keypoints
        self.radius = radius

    def extract(self, cloud: np.ndarray) -> BaselineResult:
        xyz = np.asarray(cloud[:, :3], np.float32)
        # break point-ORDER correspondence between the two views of a pair:
        # the dataset's se3_view preserves point ordering, so FPS from a
        # fixed seed index would pick exactly corresponding points in both
        # clouds — index leakage no real system has (the learned pipeline's
        # NMS keypoints are order-insensitive). Permute deterministically
        # from the cloud CONTENTS so repeated calls stay reproducible.
        seed = int(np.abs(xyz[:16]).sum() * 1e3) % (2 ** 31)
        xyz = xyz[np.random.RandomState(seed).permutation(xyz.shape[0])]
        idx = fps_numpy(xyz, self.max_keypoints)
        kp = xyz[idx]
        descs = np.empty((kp.shape[0], 24), np.float32)
        for i, c in enumerate(kp):
            d2 = np.sum((xyz - c) ** 2, axis=1)
            neigh = xyz[d2 < self.radius ** 2] - c
            descs[i] = handcrafted_descriptor(neigh, self.radius)
        return BaselineResult(keypoints=kp, features=descs,
                              attention=np.ones(kp.shape[0], np.float32),
                              num_keypoints=kp.shape[0])


def main():
    p = argparse.ArgumentParser()
    # MUST mirror scaled_accuracy_run defaults — same rng(0) call sequence
    p.add_argument("--places", type=int, default=240)
    p.add_argument("--views", type=int, default=4)
    p.add_argument("--val_pairs", type=int, default=96)
    p.add_argument("--test_pairs", type=int, default=24)
    p.add_argument("--max_keypoints", type=int, default=1024)
    p.add_argument("--results_dir",
                   default=os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                        "results", "scaled_accuracy"))
    args = p.parse_args()

    from feat3dnet_tpu.data.io import load_point_cloud, save_descriptors
    from feat3dnet_tpu.eval.fig4 import evaluate_dataset

    root = tempfile.mkdtemp(prefix="f3d_baseline_")
    rng = np.random.RandomState(0)
    print("rebuilding the seeded dataset (test split identical to the "
          "learned run)...", flush=True)
    build_dataset(root, rng, args.places, args.views, args.val_pairs,
                  args.test_pairs)

    test_dir = os.path.join(root, "test")
    result_dir = os.path.join(root, "baseline_results")
    os.makedirs(result_dir, exist_ok=True)
    ext = HandcraftedExtractor(max_keypoints=args.max_keypoints)
    bins = sorted(f for f in os.listdir(test_dir) if f.endswith(".bin"))
    for i, fname in enumerate(bins):
        cloud = load_point_cloud(os.path.join(test_dir, fname), 6)
        res = ext.extract(cloud)
        save_descriptors(os.path.join(result_dir, fname),
                         res.keypoints, res.features)
        print(f"baseline {i + 1}/{len(bins)}: {fname}", flush=True)

    stats, agg = evaluate_dataset(test_dir, result_dir, feature_dim=24)
    summary = {"fig4": {k: float(v) for k, v in agg.items()}}
    evaluate_registration(ext, test_dir, summary)
    summary["descriptor"] = "PCA shape + height/radius histograms (24-D)"
    summary["keypoints"] = f"FPS {args.max_keypoints}"
    print(json.dumps(summary, indent=2))

    os.makedirs(args.results_dir, exist_ok=True)
    spath = os.path.join(args.results_dir, "summary.json")
    full = json.load(open(spath)) if os.path.exists(spath) else {}
    full["handcrafted_baseline"] = summary
    with open(spath, "w") as f:
        json.dump(full, f, indent=2)
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
