"""Op-level micro-benchmarks.

The TPU equivalent of the reference's standalone kernel harnesses
(tf_ops/grouping/test/: CPU vs naive/block/grid CUDA ball-query and
selection-sort timings). Compares the framework's op formulations across
workload shapes and prints a wall-time table. Run on whatever backend is
live (TPU by default in this environment; force CPU with
jax.config jax_platforms=cpu).

    python benchmarks/bench_ops.py [--shapes small,inference,kitti]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

SHAPES = {
    # (n_points, n_centers, nsample, radius_over_extent)
    "small":     (4096, 512, 64, 0.1),       # training step shape
    "bench":     (64, 7500, 64, 1.0),        # 64-pt clusters (centers axis = batch)
    "inference": (16384, 8192, 64, 0.1),     # oxford attention chunk
    "kitti":     (32768, 4096, 64, 0.05),    # dense submap chunk
}


def timed(fn, *args, repeats=5):
    out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).sum())
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).sum())
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    from feat3dnet_tpu.ops import ball_query, group_points, knn_points
    from feat3dnet_tpu.ops.fps import farthest_point_sample_pallas, farthest_point_sample_scan
    from feat3dnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    p = argparse.ArgumentParser()
    p.add_argument("--shapes", default="small,bench")
    p.add_argument("--repeats", type=int, default=5)
    args = p.parse_args()

    rng = np.random.RandomState(0)
    print(f"backend: {jax.default_backend()}")
    for name in args.shapes.split(","):
        n, m, ns, rfrac = SHAPES[name]
        if name == "bench":
            xyz = jnp.asarray(rng.rand(m, n, 3).astype(np.float32) * 4.0)
            centers = jnp.asarray(np.zeros((m, 1, 3), np.float32) + 2.0)
            radius = 2.0
        else:
            xyz = jnp.asarray(rng.rand(1, n, 3).astype(np.float32) * 40.0)
            centers = xyz[:, :m]
            radius = 40.0 * rfrac

        bq = jax.jit(lambda a, b: ball_query(a, b, radius, ns))
        t = timed(bq, xyz, centers, repeats=args.repeats)
        print(f"{name:10s} ball_query   {t * 1e3:8.1f} ms   "
              f"({xyz.shape[0]}x{centers.shape[1]}q x {n}pts, ns={ns})")

        if name != "bench":
            t = timed(jax.jit(lambda a: farthest_point_sample_scan(a, 512)), xyz,
                      repeats=args.repeats)
            print(f"{name:10s} fps(scan)    {t * 1e3:8.1f} ms")
            t = timed(jax.jit(lambda a: farthest_point_sample_pallas(a, 512)), xyz,
                      repeats=args.repeats)
            print(f"{name:10s} fps(pallas)  {t * 1e3:8.1f} ms")
            t = timed(jax.jit(lambda a, b: knn_points(ns, a, b)), xyz, centers,
                      repeats=args.repeats)
            print(f"{name:10s} knn(top_k)   {t * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
