"""One-command TF1 descriptor-parity gate (SURVEY.md §7.2).

Runs the moment a real reference checkpoint export lands:

    python -m feat3dnet_tpu.cli.verify_parity --npz ckpt.npz \\
        [--cloud examples/data/oxford_270.bin] \\
        [--reference_output ref_out/oxford_270.bin] \\
        [--cosine_threshold 0.999]

Steps:
  1. strictly restore the TF1 npz export into the model
     (utils/tf1_loader.py; export recipe in its module docstring —
     reference ckpt semantics: train.py:187-232, utils.py:18-30);
  2. extract keypoints + descriptors from --cloud via the standard
     pipeline and cross-check the fused Pallas serving path against the
     XLA model path at the same keypoints (internal consistency gate);
  3. if --reference_output is given (a [xyz|desc] .bin produced by the
     reference's inference.py on the same cloud), recompute OUR descriptors
     AT the reference's keypoints (the --use_keypoints_from path, so NMS
     differences cannot confound the comparison) and report per-keypoint
     cosine similarity. Exit 0 iff median cosine >= --cosine_threshold.
"""
from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TF1 checkpoint descriptor-parity gate")
    p.add_argument("--npz", required=True, help="TF1 checkpoint exported to .npz")
    p.add_argument("--cloud", default=None,
                   help="point cloud .bin (default: vendored oxford_270.bin)")
    p.add_argument("--data_dim", type=int, default=6)
    p.add_argument("--reference_output", default=None,
                   help="[xyz|desc] .bin the reference wrote for the same cloud")
    p.add_argument("--feature_dim", type=int, default=32, choices=[16, 32, 64, 128])
    p.add_argument("--base_scale", type=float, default=2.0)
    p.add_argument("--num_samples", type=int, default=64)
    p.add_argument("--cosine_threshold", type=float, default=0.999)
    p.add_argument("--restore_exclude", nargs="*", default=None)
    p.add_argument("--no_bn", action="store_true",
                   help="checkpoint was trained with USE_BN=False "
                        "(reference config.py:2) — no bn/* variables")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import numpy as np

    import jax
    import jax.numpy as jnp

    from feat3dnet_tpu.config import InferenceConfig, ModelConfig
    from feat3dnet_tpu.data.io import (example_cloud_path, load_descriptors,
                                       load_point_cloud)
    from feat3dnet_tpu.inference import InferencePipeline
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.utils import enable_compilation_cache
    from feat3dnet_tpu.utils.tf1_loader import load_tf1_arrays, restore_tf1_variables

    enable_compilation_cache()

    cfg = ModelConfig(num_clusters=-1, feature_dim=args.feature_dim,
                      base_scale=args.base_scale, num_samples=args.num_samples,
                      use_bn=not args.no_bn)
    model = Feat3DNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 3)),
                           training=False)

    arrays = load_tf1_arrays(args.npz)
    variables, restored, skipped = restore_tf1_variables(
        variables, arrays, restore_exclude=args.restore_exclude)
    print(f"restored {len(restored)} TF1 variables, skipped {len(skipped)} "
          f"(optimizer slots / global_step / excluded scopes)")
    model_like = [s for s in skipped
                  if not any(t in s for t in ("Adam", "beta1_power",
                                              "beta2_power", "global_step"))]
    if model_like:
        print("WARNING: skipped model-looking variables:", flush=True)
        for s in model_like:
            print(f"  {s}")

    cloud_path = args.cloud or example_cloud_path("oxford_270.bin")
    cloud = load_point_cloud(cloud_path, num_cols=args.data_dim)
    pipe = InferencePipeline(model, variables, cfg, InferenceConfig())
    res = pipe.extract(cloud)
    print(f"{cloud_path}: {res.num_keypoints} keypoints, "
          f"descriptor norm mean {np.linalg.norm(res.features, axis=1).mean():.4f}")

    if cfg.use_bn:
        # internal gate: fused serving kernel vs XLA model path at the same
        # keypoints (guards the folded-BN serving path with real weights).
        # No-BN models have nothing to fold — they serve via the XLA path
        # (inference/serving.py), so this sub-gate does not apply.
        from feat3dnet_tpu.ops import ball_query, group_points
        from feat3dnet_tpu.ops.fused_describe import folded_weights, fused_describe_clusters

        xyz = jnp.asarray(cloud[None, :, :3])
        kp = jnp.asarray(res.keypoints[None])
        idx, _ = ball_query(xyz, kp, cfg.base_scale, cfg.num_samples)
        clusters = (group_points(xyz, idx) - kp[:, :, None, :])[0]
        desc_fused, _ = fused_describe_clusters(folded_weights(variables, cfg),
                                                clusters, cfg)
        cos_int = np.sum(np.asarray(desc_fused) * res.features, axis=1)
        print(f"fused-vs-XLA cosine: min {cos_int.min():.6f} "
              f"median {np.median(cos_int):.6f}")

    if args.reference_output is None:
        print("no --reference_output given: checkpoint loads and runs; "
              "drop the reference inference.py output here for the full gate")
        return 0

    ref_xyz, ref_desc = load_descriptors(args.reference_output,
                                         feature_dim=args.feature_dim)
    # descriptors at the REFERENCE's keypoints — NMS cannot confound
    res_at_ref = pipe.extract(cloud, keypoints=ref_xyz)
    ours = res_at_ref.features
    ref_n = ref_desc / np.maximum(np.linalg.norm(ref_desc, axis=1, keepdims=True), 1e-8)
    ours_n = ours / np.maximum(np.linalg.norm(ours, axis=1, keepdims=True), 1e-8)
    cos = np.sum(ref_n * ours_n, axis=1)
    stats = {"n": len(cos), "min": float(cos.min()),
             "p5": float(np.percentile(cos, 5)),
             "median": float(np.median(cos)), "mean": float(cos.mean())}
    print("descriptor cosine vs reference:", stats)
    ok = stats["median"] >= args.cosine_threshold
    print("PARITY", "PASS" if ok else "FAIL",
          f"(median {stats['median']:.6f} vs threshold {args.cosine_threshold})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
