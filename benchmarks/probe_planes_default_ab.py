"""On-chip A/B: the r5 DEFAULT-path planes feed vs the grouped route.

The default hashed extract (no fused detector, no CSR) historically
un-transposed the merge kernel's lane-dense planes into a full (M, ns, 3)
grouped tensor for the chunked XLA detector — 42x lane-padded (4 GiB
physical for 96 MiB logical at 131k points; probe_extract_roofline).
F3D_DEFAULT_PLANES=1 (the r5 default) instead feeds the SAME chunked XLA
detector from three per-coordinate (M, ns) planes
(ops/hash_grid.finish_planes), assembling only each lax.map chunk's
(chunk, ns, 3) slice — pure data movement, outputs BIT-identical
(tests/test_hash_bq.py::test_default_planes_extract_bit_equal, and
asserted here on chip with real clouds).

Interleaved same-process timings (BENCHMARKS.md drift rule).

    python benchmarks/probe_planes_default_ab.py [--ckpt DIR]
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

    variants = {"grouped": "0", "planes ": "1"}
    pipes = {}
    for k, env in variants.items():    # env read at pipeline BUILD time
        os.environ["F3D_DEFAULT_PLANES"] = env
        pipes[k] = InferencePipeline(model, v, cfg, InferenceConfig())

    results = {}
    for k, pipe in pipes.items():
        for name, cloud in clouds.items():
            t0 = time.time()
            out = pipe.extract(cloud)
            print(f"warm {k} {name}: {time.time() - t0:.1f}s", flush=True)
            results[(k, name)] = out

    for name in clouds:
        a = results[("grouped", name)]
        b = results[("planes ", name)]
        assert np.array_equal(a.keypoints, b.keypoints), f"{name}: keypoints"
        assert np.array_equal(a.attention, b.attention), f"{name}: attention"
        assert np.array_equal(a.features, b.features), f"{name}: features"
        print(f"{name:11s} BIT-EQUAL ({int(a.num_keypoints)} kp)", flush=True)

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
