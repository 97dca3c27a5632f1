"""On-chip throughput of batched multi-cloud extraction (extract_batch).

Packs B small clouds into ONE dispatch (cloud-pure hitmask isolation, see
inference/pipeline.extract_batch) and compares clouds/s against the
sequential extract() loop and the pipelined extract_many() on the same
clouds — interleaved in one session (BENCHMARKS.md drift rule).

    python benchmarks/bench_extract_batch.py [--n 8] [--big]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from feat3dnet_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from feat3dnet_tpu.config import InferenceConfig, ModelConfig
    from feat3dnet_tpu.data.io import example_cloud_path, load_point_cloud
    from feat3dnet_tpu.inference import InferencePipeline
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.utils.synthetic import synthetic_submap

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="clouds per batch")
    ap.add_argument("--big", action="store_true",
                    help="120k synthetic submaps instead of oxford 16k")
    ap.add_argument("--fused", action="store_true",
                    help="use the fused detector kernel")
    args = ap.parse_args()

    cfg = ModelConfig(num_clusters=-1)
    model = Feat3DNet(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 3)),
                   training=False)
    pipe = InferencePipeline(
        model, v, cfg, InferenceConfig(use_fused_detector=args.fused))

    rng = np.random.RandomState(0)
    if args.big:
        base = synthetic_submap()[:, :3]
    else:
        base = load_point_cloud(example_cloud_path("oxford_270.bin"),
                                num_cols=6)[:, :3]
    # keep the packed union on the fori merge driver (B·bucket ≤ 131072 —
    # past it the 2-D grid sequencing dominates; see extract_many docs)
    from feat3dnet_tpu.config import bucket_for
    n_max = max(1, 131072 // bucket_for(base.shape[0]))
    if args.n > n_max:
        print(f"capping --n {args.n} -> {n_max} "
              f"(B·bucket ≤ 131072 fori ceiling)", flush=True)
        args.n = n_max
    # distinct clouds: jitter each copy so executables see real variation
    clouds = [base + rng.randn(1, 3).astype(np.float32) * 0.3
              for _ in range(args.n)]

    bs = max(2, args.n // 2)
    # warm all four paths
    pipe.extract(clouds[0])
    pipe.extract_batch(clouds)
    pipe.extract_many(clouds)
    pipe.extract_many(clouds, batch_size=bs)

    results = {}
    for _ in range(3):
        t0 = time.time()
        for c in clouds:
            pipe.extract(c)
        results.setdefault("serial extract", []).append(time.time() - t0)

        t0 = time.time()
        pipe.extract_many(clouds)
        results.setdefault("extract_many", []).append(time.time() - t0)

        t0 = time.time()
        pipe.extract_batch(clouds)
        results.setdefault("extract_batch", []).append(time.time() - t0)

        t0 = time.time()
        pipe.extract_many(clouds, batch_size=bs)
        results.setdefault(f"many bs={bs}", []).append(time.time() - t0)

    n = len(clouds)
    for k, ts in results.items():
        t = float(np.median(ts))
        print(f"{k:15s} {n / t:6.2f} clouds/s  ({t:.3f}s / {n})", flush=True)


if __name__ == "__main__":
    main()
