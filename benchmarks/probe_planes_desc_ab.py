"""On-chip A/B: planes-consuming descriptor tail vs the r4 rank-3 tail.

The r5 tail (F3D_PLANES_DESC=1, default) gathers the NMS keypoints'
clusters straight from the merge kernel's lane-dense planes into the
transposed serving kernel's (ns·8, K) layout
(ops/fused_describe.pack_planes_keypoints_t) and describes them with
fused_describe_clusters_t — the fused extract then never materializes an
(M/K, ns, 3) array. The r4 tail (F3D_PLANES_DESC=0) un-transposes planes
to (K, ns, 3) offsets and runs fused_describe_clusters_2d.

Both ride the fused-detector planes path (use_fused_detector=True,
F3D_PLANES=1), so the attention pass and keypoint set are IDENTICAL —
descriptors compare row-for-row. The descriptor kernels differ (_t vs 2d
operand order), so agreement is the serving rounding envelope, same
contract the on-chip gate checks for kernel_t vs the model path.

Interleaved same-process timings (BENCHMARKS.md drift rule).

    python benchmarks/probe_planes_desc_ab.py [--ckpt DIR]
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
    p.add_argument("--ckpt", default=None)
    args = p.parse_args()

    from feat3dnet_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from feat3dnet_tpu.config import InferenceConfig, ModelConfig
    from feat3dnet_tpu.data.io import example_cloud_path, load_point_cloud
    from feat3dnet_tpu.inference import InferencePipeline
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.utils.synthetic import synthetic_submap

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

    os.environ["F3D_PLANES"] = "1"
    variants = {"desc_2d": "0", "desc_t ": "1"}
    pipes = {k: InferencePipeline(model, v, cfg,
                                  InferenceConfig(use_fused_detector=True))
             for k in variants}

    # warm every (pipeline, bucket) with the right env at BUILD time
    results = {}
    for k, pipe in pipes.items():
        os.environ["F3D_PLANES_DESC"] = variants[k]
        for name, cloud in clouds.items():
            t0 = time.time()
            out = pipe.extract(cloud)
            print(f"warm {k} {name}: {time.time() - t0:.1f}s", flush=True)
            results[(k, name)] = out

    for name in clouds:
        a = results[("desc_2d", name)]
        b = results[("desc_t ", name)]
        assert np.array_equal(a.keypoints, b.keypoints), (
            f"{name}: keypoint sets differ — the tails must share the "
            "attention path")
        n = int(a.num_keypoints)
        fa, fb = a.features[:n], b.features[:n]
        cos = np.sum(fa * fb, 1) / np.maximum(
            np.linalg.norm(fa, axis=1) * np.linalg.norm(fb, axis=1), 1e-12)
        print(f"{name:11s} desc agreement: min cos {cos.min():.6f}  "
              f"maxdiff {np.abs(fa - fb).max():.2e}  ({n} kp)", flush=True)

    for name, cloud in clouds.items():
        times = {k: [] for k in pipes}
        for r in range(7):
            for k, pipe in pipes.items():    # interleaved
                t0 = time.time()
                pipe.extract(cloud)
                times[k].append(time.time() - t0)
        for k in pipes:
            med = np.median(times[k])
            print(f"{name:11s} {k} median {med:.4f}s "
                  f"(all: {['%.3f' % t for t in times[k]]})", flush=True)


if __name__ == "__main__":
    main()
