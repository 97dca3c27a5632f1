"""End-to-end registration demo over the bundled example clouds.

The reference workflow this replaces: inference_example.sh (TF1 descriptor
extraction) + scripts/computeAndVisualizeMatches.m (MATLAB NN matching +
RANSAC + plots). Pairs: (oxford_270, oxford_456) and
(kitti_00_001554, kitti_00_004534) — the KITTI pair is BASELINE.md
config 5's dense-submap end-to-end path (FPS/attention keypoints,
descriptors, RANSAC registration).

    python examples/register_examples.py [--tf1_checkpoint ckpt.npz]

Without a checkpoint the model runs at random init — descriptors are not
discriminative, but every stage (two-pass inference with on-device NMS,
matching, vectorized RANSAC, figure rendering) is exercised for real.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAIRS = [("oxford_270", "oxford_456"),
         ("kitti_00_001554", "kitti_00_004534")]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", default=None,
                   help="defaults to the vendored examples/data")
    p.add_argument("--out_dir", default="./example_results")
    p.add_argument("--tf1_checkpoint", default=None)
    p.add_argument("--plots", action="store_true")
    args = p.parse_args()

    from feat3dnet_tpu.cli.infer import main as infer_main
    from feat3dnet_tpu.cli.match import main as match_main
    from feat3dnet_tpu.data.io import example_data_dir
    from feat3dnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    if args.data_dir is None:
        args.data_dir = example_data_dir()

    infer_args = ["--data_dir", args.data_dir, "--output_dir", args.out_dir]
    if args.tf1_checkpoint:
        infer_args += ["--tf1_checkpoint", args.tf1_checkpoint]
    t0 = time.time()
    infer_main(infer_args)
    print(f"[inference] {time.time() - t0:.1f}s for 4 clouds")

    for a, b in PAIRS:
        margs = ["--desc1", os.path.join(args.out_dir, a + ".bin"),
                 "--desc2", os.path.join(args.out_dir, b + ".bin"),
                 "--cloud1", os.path.join(args.data_dir, a + ".bin"),
                 "--cloud2", os.path.join(args.data_dir, b + ".bin")]
        if args.plots:
            margs += ["--plot_dir", os.path.join(args.out_dir, f"figs_{a}_{b}")]
        t0 = time.time()
        result = match_main(margs)
        print(f"[{a} <-> {b}] inliers {result['num_inliers']}/{result['num_matches']}"
              f" in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
