"""On-chip A/B of the fused detector-only kernel in the hashed extract.

`InferenceConfig(use_fused_detector=True)` replaces the attention pass's
chunked XLA detector (which materializes every (chunk, ns, C) inter-layer
activation in HBM) with ops/fused_describe.fused_detect_clusters_2d.
Interleaved same-session A/B (BENCHMARKS.md session-drift rule) on the
synthetic 120k submap, the kitti 29k cloud, and oxford 16k, plus an
agreement check (keypoint overlap + attention tolerance) at full scale.

    python benchmarks/probe_fused_detector.py [--ckpt DIR]

--ckpt points at an Orbax checkpoint directory: the agreement numbers are
then measured at TRAINED weights — the number ROADMAP item 7 needs before
use_fused_detector can default on (random-init attention is near-flat, so
its keypoint overlap is the worst case). The 4,480-step stage-2
checkpoint of the scaled synthetic run is COMMITTED at
examples/results/scaled_accuracy/ckpt (measured there: kp overlap 0.9785
@120k, matched-att relmax 1.4e-2)."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None,
                   help="Orbax checkpoint dir (a training run's ckpt/); "
                        "measures agreement at trained weights")
    args = p.parse_args()

    from feat3dnet_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from feat3dnet_tpu.config import InferenceConfig, ModelConfig
    from feat3dnet_tpu.data.io import example_cloud_path, load_point_cloud
    from feat3dnet_tpu.inference import InferencePipeline
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.utils.synthetic import (keypoint_agreement,
                                               synthetic_submap)

    cfg = ModelConfig(num_clusters=-1)
    model = Feat3DNet(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 3)),
                   training=False)
    if args.ckpt:
        from feat3dnet_tpu.config import TrainConfig
        from feat3dnet_tpu.train.trainer import init_state
        from feat3dnet_tpu.utils.checkpoint import CheckpointManager

        state, _ = init_state(model, TrainConfig(), cfg,
                              jax.random.PRNGKey(0))
        state = CheckpointManager(os.path.abspath(args.ckpt)).restore(state)
        v = {"params": state.params, "batch_stats": state.batch_stats}
        print(f"trained weights: step {int(state.step)} from {args.ckpt}",
              flush=True)

    clouds = {
        "oxford_16k": load_point_cloud(example_cloud_path("oxford_270.bin"),
                                       num_cols=6),
        "kitti_29k": load_point_cloud(
            example_cloud_path("kitti_00_001554.bin"), num_cols=6),
        "synth_120k": synthetic_submap(),
    }

    pipes = {
        "xla  ": InferencePipeline(model, v, cfg, InferenceConfig()),
        "fused": InferencePipeline(model, v, cfg,
                                   InferenceConfig(use_fused_detector=True)),
    }

    # agreement at full scale (coordinate-matched — see keypoint_agreement)
    rx = pipes["xla  "].extract(clouds["synth_120k"])
    rf = pipes["fused"].extract(clouds["synth_120k"])
    agree = keypoint_agreement(rx, rf)
    print(f"agreement @120k: kp overlap {agree['overlap']:.4f} "
          f"({agree['num_a']} vs {agree['num_b']}), matched-att relmax "
          f"{agree['att_relmax_matched']:.2e}", flush=True)

    for name, cloud in clouds.items():
        for p in pipes.values():          # warm both
            p.extract(cloud)
        times = {k: [] for k in pipes}
        for r in range(5):
            for k, p in pipes.items():    # interleaved
                t0 = time.time()
                p.extract(cloud)
                times[k].append(time.time() - t0)
        for k in pipes:
            print(f"{name:11s} {k}  median {np.median(times[k]):.4f}s",
                  flush=True)


if __name__ == "__main__":
    main()
