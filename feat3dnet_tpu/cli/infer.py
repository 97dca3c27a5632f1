"""Inference CLI (reference flag surface: inference.py:25-59).

    python -m feat3dnet_tpu.cli.infer \\
        --data_dir example_data --output_dir out \\
        --checkpoint ckpt           # Orbax dir, or --tf1_checkpoint ckpt.npz
"""
from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Extract keypoints + descriptors")
    p.add_argument("--model", type=str, default="3DFeatNet")
    p.add_argument("--data_dim", type=int, default=6)
    p.add_argument("--num_points", type=int, default=-1)
    p.add_argument("--base_scale", type=float, default=2.0)
    p.add_argument("--num_samples", type=int, default=64)
    p.add_argument("--feature_dim", type=int, default=32, choices=[16, 32, 64, 128])
    p.add_argument("--use_keypoints_from", default=None)
    p.add_argument("--randomize_points", action="store_true")
    p.add_argument("--nms_radius", type=float, default=0.5)
    p.add_argument("--min_response_ratio", type=float, default=1e-2)
    p.add_argument("--max_keypoints", type=int, default=1024)
    p.add_argument("--batch_size", type=int, default=1,
                   help="clouds packed per device dispatch (extract_batch; "
                        "per-cloud results are bit-equal to batch_size=1)")
    p.add_argument("--use_fused_detector", action="store_true",
                   help="fused detector-only Pallas kernel for the "
                        "attention pass (faster; serving-envelope rounding "
                        "vs the default XLA path)")
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--checkpoint", type=str, default=None, help="Orbax checkpoint dir")
    p.add_argument("--tf1_checkpoint", type=str, default=None, help="TF1 npz export")
    p.add_argument("--output_dir", type=str, required=True)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from feat3dnet_tpu.config import InferenceConfig, ModelConfig, TrainConfig
    from feat3dnet_tpu.inference import InferencePipeline
    from feat3dnet_tpu.models import get_network
    from feat3dnet_tpu.train.trainer import init_state
    from feat3dnet_tpu.utils import enable_compilation_cache
    from feat3dnet_tpu.utils.logging import setup_logging

    enable_compilation_cache()
    logger = setup_logging()
    logger.info("Arguments: %s", vars(args))

    mcfg = ModelConfig(num_clusters=-1, base_scale=args.base_scale,
                       num_samples=args.num_samples, feature_dim=args.feature_dim)
    icfg = InferenceConfig(nms_radius=args.nms_radius,
                           min_response_ratio=args.min_response_ratio,
                           max_keypoints=args.max_keypoints,
                           num_points=args.num_points,
                           randomize_points=args.randomize_points,
                           use_fused_detector=args.use_fused_detector)

    model = get_network(args.model)(mcfg)
    state, _ = init_state(model, TrainConfig(num_points=512), mcfg, jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    if args.tf1_checkpoint:
        from feat3dnet_tpu.utils.tf1_loader import load_tf1_arrays, restore_tf1_variables
        variables, restored, skipped = restore_tf1_variables(
            variables, load_tf1_arrays(args.tf1_checkpoint), ignore_missing=True)
        logger.info("TF1 restore: %d restored, %d skipped", len(restored), len(skipped))
    elif args.checkpoint:
        from feat3dnet_tpu.utils.checkpoint import CheckpointManager
        mgr = CheckpointManager(args.checkpoint)
        state = mgr.restore(state)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        logger.info("Restored checkpoint at step %d", int(state.step))
    else:
        logger.warning("No checkpoint given — running with random init")

    pipe = InferencePipeline(model, variables, mcfg, icfg)
    n = pipe.process_directory(args.data_dir, args.output_dir,
                               data_dim=args.data_dim,
                               keypoints_dir=args.use_keypoints_from,
                               log=logger.info,
                               batch_size=args.batch_size)
    logger.info("Done: %d files", n)


if __name__ == "__main__":
    main()
