"""Interleaved same-session A/B of the density-keyed auto layout's two
choices (128 vs 256 Morton blocks) on the real example clouds + the 120k
synthetic submap. Two pinned pipelines alternate extracts in one process,
so compile-service/device drift (BENCHMARKS.md session-drift rule) cannot
masquerade as a layout effect.

    python benchmarks/sweep_layout_auto.py
"""
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
    from feat3dnet_tpu.ops.hash_grid import estimate_ball_points
    from feat3dnet_tpu.utils.synthetic import synthetic_submap

    cfg = ModelConfig(num_clusters=-1)
    model = Feat3DNet(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 3)),
                   training=False)

    clouds = {
        "oxford_16k": load_point_cloud(example_cloud_path("oxford_270.bin"),
                                       num_cols=6),
        "kitti_29k": load_point_cloud(
            example_cloud_path("kitti_00_001554.bin"), num_cols=6),
        "synth_120k": synthetic_submap(),
    }
    pipes = {
        128: InferencePipeline(model, v, cfg, InferenceConfig(hash_block=128)),
        256: InferencePipeline(model, v, cfg, InferenceConfig(hash_block=256)),
    }

    for name, cloud in clouds.items():
        est = estimate_ball_points(cloud[:, :3], float(cfg.base_scale))
        auto = 128 if est >= cfg.num_samples else 256
        for p in pipes.values():
            p.extract(cloud)              # warm/compile both layouts
        times = {k: [] for k in pipes}
        for r in range(7):
            for k, p in pipes.items():    # interleaved
                t0 = time.time()
                p.extract(cloud * (1.0 + 1e-5 * (r + 1)))
                times[k].append(time.time() - t0)
        meds = {k: float(np.median(ts)) for k, ts in times.items()}
        best = min(meds, key=meds.get)
        print(f"{name:11s} est_ball={est:6.1f} auto->{auto}  "
              f"128: {meds[128]:.4f}s  256: {meds[256]:.4f}s  "
              f"best={best} auto_{'OK' if best == auto or abs(meds[128]-meds[256]) < 0.004 else 'MISS'}",
              flush=True)


if __name__ == "__main__":
    main()
