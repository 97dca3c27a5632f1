"""Sweep the hashed merge-kernel layout (Morton block L × center tile TC)
on the 120k-point dense-submap extraction (VERDICT r2 weak #3: the merge
pays ~ns·15 VPU element-ops per (center, candidate) pair — smaller blocks
cut per-step slack, more blocks cost grid sequencing; measure, don't guess).

    python benchmarks/sweep_merge.py [--points 120000] [--repeats 3]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=120000)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--configs", default="256x128,128x128,128x256,512x128,256x256")
    ap.add_argument("--cloud", default="synthetic",
                    choices=("synthetic", "oxford", "kitti"),
                    help="oxford/kitti sweep the bundled real clouds "
                         "(per-bucket tuning — ROADMAP item 6)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from feat3dnet_tpu.config import InferenceConfig, ModelConfig
    from feat3dnet_tpu.inference import InferencePipeline
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    if args.cloud == "synthetic":
        rng = np.random.RandomState(0)
        big = np.concatenate([
            rng.rand(args.points, 3).astype(np.float32)
            * np.array([100, 100, 10], np.float32),
            np.zeros((args.points, 3), np.float32)], axis=1)
    else:
        from feat3dnet_tpu.data.io import example_cloud_path, load_point_cloud
        fname = ("oxford_270.bin" if args.cloud == "oxford"
                 else "kitti_00_001554.bin")
        big = load_point_cloud(example_cloud_path(fname), num_cols=6)

    cfg = ModelConfig(num_clusters=-1)
    model = Feat3DNet(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 3)),
                   training=False)

    pipes = {}
    ref_kp = None
    for spec in args.configs.split(","):
        L, tc = (int(x) for x in spec.split("x"))
        pipes[spec] = InferencePipeline(
            model, v, cfg, InferenceConfig(hash_block=L, hash_tile=tc))
        t0 = time.time()
        res = pipes[spec].extract(big)
        print(f"{spec}: compile+first {time.time()-t0:.1f}s", flush=True)
        if ref_kp is None:
            ref_kp = res.num_keypoints
        elif res.num_keypoints != ref_kp:
            print(f"  WARNING: keypoint count {res.num_keypoints} != {ref_kp}",
                  flush=True)
    # INTERLEAVED warm timing (single-process sequential sweeps drift ±15%)
    times = {k: [] for k in pipes}
    for i in range(args.repeats):
        for spec, pipe in pipes.items():
            t0 = time.time()
            pipe.extract(big * (1.0 + 1e-5 * (i + 1)))
            times[spec].append(time.time() - t0)
    for spec in pipes:
        print(f"{spec}: warm median {np.median(times[spec]):.3f}s", flush=True)


if __name__ == "__main__":
    main()
