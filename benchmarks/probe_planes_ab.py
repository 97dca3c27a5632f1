"""On-chip A/B: planes-fused detector vs the pre-r4 fused path vs XLA.

The r4 planes path (F3D_PLANES=1, the default under use_fused_detector)
keeps the attention pass in the merge kernel's lane-dense plane layout
(ops/fused_describe.fused_detect_planes_t) — no (M, ns, 4) epilogue
materialization. The pre-r4 fused path (F3D_PLANES=0) un-transposes and
runs the rank-3 fused_detect_clusters_2d. Since a single clean-session
number cannot distinguish compile-service drift from a real regression
(BENCHMARKS.md drift rule), this probe compiles ALL THREE variants in one
process and interleaves timings.

F3D_PLANES is read at executable BUILD time (pipeline._extract_fn), so
each pipeline is warmed on every cloud with its env value set.

    python benchmarks/probe_planes_ab.py [--ckpt DIR]
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
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None,
                   help="Orbax checkpoint dir; measures agreement at "
                        "trained weights")
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

    variants = {
        "xla   ": (InferenceConfig(), None),
        "fold  ": (InferenceConfig(use_fused_detector=True), "0"),
        "planes": (InferenceConfig(use_fused_detector=True), "1"),
    }
    pipes = {k: InferencePipeline(model, v, cfg, icfg)
             for k, (icfg, _) in variants.items()}

    def set_env(k):
        env = variants[k][1]
        if env is None:
            os.environ.pop("F3D_PLANES", None)
        else:
            os.environ["F3D_PLANES"] = env

    # warm every (pipeline, bucket) with the right env at build time
    results = {}
    for k, pipe in pipes.items():
        set_env(k)
        for name, cloud in clouds.items():
            t0 = time.time()
            out = pipe.extract(cloud)
            print(f"warm {k} {name}: {time.time() - t0:.1f}s", flush=True)
            if name == "synth_120k":
                results[k] = out

    for a, b in (("xla   ", "planes"), ("fold  ", "planes")):
        agree = keypoint_agreement(results[a], results[b])
        print(f"agreement @120k {a.strip()} vs {b}: kp overlap "
              f"{agree['overlap']:.4f} ({agree['num_a']} vs "
              f"{agree['num_b']}), matched-att relmax "
              f"{agree['att_relmax_matched']:.2e}", flush=True)

    for name, cloud in clouds.items():
        times = {k: [] for k in pipes}
        for r in range(7):
            for k, pipe in pipes.items():    # interleaved
                set_env(k)                   # harmless post-build; safety
                t0 = time.time()
                pipe.extract(cloud)
                times[k].append(time.time() - t0)
        for k in pipes:
            med = np.median(times[k])
            print(f"{name:11s} {k} median {med:.4f}s "
                  f"(all: {['%.3f' % t for t in times[k]]})", flush=True)


if __name__ == "__main__":
    main()
