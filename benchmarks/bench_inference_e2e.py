"""End-to-end extraction latency (fused single-dispatch pipeline) over the
bundled reference example clouds and a synthetic dense submap.

    python benchmarks/bench_inference_e2e.py [--big]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def time_cloud(pipe, cloud, label, repeats=5):
    t = time.time()
    res = pipe.extract(cloud)
    print(f"{label}: first (compile) {time.time() - t:.1f}s", flush=True)
    ts = []
    for i in range(repeats):
        t = time.time()
        res = pipe.extract(cloud * (1.0 + 1e-5 * (i + 1)))
        ts.append(time.time() - t)
    print(f"{label}: {cloud.shape[0]} pts, warm median {np.median(ts):.3f}s, "
          f"{res.num_keypoints} keypoints")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--big", action="store_true", help="also run a 120k-pt submap")
    args = p.parse_args()

    from feat3dnet_tpu.config import InferenceConfig, ModelConfig
    from feat3dnet_tpu.data.io import example_data_dir, load_point_cloud
    from feat3dnet_tpu.inference import InferencePipeline
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = ModelConfig(num_clusters=-1)
    model = Feat3DNet(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 3)), training=False)
    pipe = InferencePipeline(model, v, cfg, InferenceConfig())

    ex = example_data_dir()
    if os.path.isdir(ex):
        time_cloud(pipe, load_point_cloud(f"{ex}/oxford_270.bin", 6), "oxford_270")
        time_cloud(pipe, load_point_cloud(f"{ex}/kitti_00_001554.bin", 6), "kitti_00_001554")

    if args.big:
        rng = np.random.RandomState(0)
        big = np.concatenate([
            rng.rand(120000, 3).astype(np.float32) * np.array([100, 100, 10], np.float32),
            np.zeros((120000, 3), np.float32)], axis=1)
        time_cloud(pipe, big, "synthetic 120k submap", repeats=3)


if __name__ == "__main__":
    main()
