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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from feat3dnet_tpu.config import InferenceConfig, ModelConfig
    from feat3dnet_tpu.inference import InferencePipeline
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.RandomState(0)
    big = np.concatenate([
        rng.rand(args.points, 3).astype(np.float32)
        * np.array([100, 100, 10], np.float32),
        np.zeros((args.points, 3), np.float32)], axis=1)

    cfg = ModelConfig(num_clusters=-1)
    model = Feat3DNet(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 3)),
                   training=False)

    ref_kp = None
    for spec in args.configs.split(","):
        L, tc = (int(x) for x in spec.split("x"))
        pipe = InferencePipeline(
            model, v, cfg, InferenceConfig(hash_block=L, hash_tile=tc))
        t0 = time.time()
        res = pipe.extract(big)
        print(f"L={L} tc={tc}: compile+first {time.time()-t0:.1f}s", flush=True)
        ts = []
        for i in range(args.repeats):
            t0 = time.time()
            res = pipe.extract(big * (1.0 + 1e-5 * (i + 1)))
            ts.append(time.time() - t0)
        print(f"L={L} tc={tc}: warm median {np.median(ts):.3f}s "
              f"({res.num_keypoints} kp)", flush=True)
        if ref_kp is None:
            ref_kp = res.num_keypoints
        elif res.num_keypoints != ref_kp:
            print(f"  WARNING: keypoint count {res.num_keypoints} != {ref_kp}",
                  flush=True)


if __name__ == "__main__":
    main()
