"""Does a training variant (bf16-stored residuals / fused Pallas towers)
train like the default f32 XLA towers? (round-4 shipping check)

Same seeded synthetic dataset, same train CLI, two runs differing ONLY in
the variant flag; compares the validation FPR@95 trajectories and final
losses. Not bit-exact by design (resid16 rounds the forward to the bf16
grid at the squash points; fused_towers reassociates matmul/BN
accumulation); the claim being checked is CONVERGENCE EQUIVALENCE.

    python benchmarks/probe_resid16_convergence.py \
        [--variant resid16|fused_towers] [--places 48 --epochs 10]
"""
import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))

import numpy as np


def read_metrics(log_dir):
    out = []
    with open(os.path.join(log_dir, "metrics.jsonl")) as f:
        for line in f:
            out.append(json.loads(line))
    return out


VARIANTS = {
    "resid16": ["--residual_dtype", "bfloat16"],
    "fused_towers": ["--fused_towers"],
}


def main(places: int = 48, epochs: int = 10, variant: str = "resid16"):
    from scaled_accuracy_run import build_dataset

    from feat3dnet_tpu.cli.train import main as train_main
    from feat3dnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    root = tempfile.mkdtemp(prefix=f"f3d_{variant}_")
    rng = np.random.RandomState(0)
    build_dataset(root, rng, places, 3, 48, 4)

    common = ["--data_dir", root, "--num_points", "4096",
              "--num_clusters", "256", "--batch_size", "6",
              "--learning_rate", "5e-5", "--num_epochs", str(epochs),
              "--validate_every_n_steps", "20",
              "--summary_every_n_steps", "10",
              "--checkpoint_every_n_steps", "100000", "--seed", "0"]
    runs = {}
    for tag, extra in (("f32", []), (variant, VARIANTS[variant])):
        log_dir = os.path.join(root, f"run_{tag}")
        train_main(common + ["--log_dir", log_dir] + extra)
        runs[tag] = read_metrics(log_dir)

    def series(ms, key):
        return [(m["step"], m[key]) for m in ms if key in m]

    out = {}
    for tag, ms in runs.items():
        losses = series(ms, "loss")
        fprs = series(ms, "fp_rate")
        out[tag] = {
            "final_loss_avg10": round(float(np.mean([v for _, v in losses[-10:]])), 4),
            "fpr_trajectory": [(s, round(v, 3)) for s, v in fprs],
            "final_fpr95": round(fprs[-1][1], 4) if fprs else None,
        }
    print(json.dumps(out, indent=1))
    d = abs(out["f32"]["final_fpr95"] - out[variant]["final_fpr95"])
    print(f"final FPR@95 delta: {d:.4f}")
    print("CONVERGENCE", "OK" if d <= 0.10 else "DIVERGED")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--places", type=int, default=48)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--variant", default="resid16", choices=sorted(VARIANTS))
    a = ap.parse_args()
    main(a.places, a.epochs, a.variant)
