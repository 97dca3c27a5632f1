"""Descriptor matching + RANSAC registration demo CLI.

Port of scripts/computeAndVisualizeMatches.m: load two [xyz|descriptor]
.bin outputs of the inference CLI, nearest-neighbor match, RANSAC rigid
fit (1.0 m inlier threshold), report the transform + inlier count, and
optionally render match/alignment figures.

    python -m feat3dnet_tpu.cli.match --desc1 out/a.bin --desc2 out/b.bin \\
        --cloud1 data/a.bin --cloud2 data/b.bin --plot_dir figs
"""
from __future__ import annotations

import argparse
import json


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Match descriptors + register clouds")
    p.add_argument("--desc1", required=True, help="[xyz|desc] .bin of cloud 1")
    p.add_argument("--desc2", required=True, help="[xyz|desc] .bin of cloud 2")
    p.add_argument("--cloud1", default=None, help="raw cloud .bin (for plots)")
    p.add_argument("--cloud2", default=None)
    p.add_argument("--data_dim", type=int, default=6)
    p.add_argument("--feature_dim", type=int, default=32)
    p.add_argument("--inlier_threshold", type=float, default=1.0)
    p.add_argument("--num_hypotheses", type=int, default=2048)
    p.add_argument("--mutual", action="store_true",
                   help="restrict to mutual nearest neighbors before RANSAC")
    p.add_argument("--plot_dir", default=None)
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from feat3dnet_tpu.data.io import load_descriptors, load_point_cloud
    from feat3dnet_tpu.eval.matching import match_descriptors, mutual_matches
    from feat3dnet_tpu.eval.ransac import ransac_rigid

    xyz1, desc1 = load_descriptors(args.desc1, args.feature_dim)
    xyz2, desc2 = load_descriptors(args.desc2, args.feature_dim)

    idx, dist = match_descriptors(jnp.asarray(desc1), jnp.asarray(desc2))
    idx = np.asarray(idx)
    valid = None
    if args.mutual:
        valid = jnp.asarray(np.asarray(
            mutual_matches(jnp.asarray(desc1), jnp.asarray(desc2))))

    src = jnp.asarray(xyz2)                      # points in cloud-2 frame
    dst = jnp.asarray(xyz1[idx])                 # their matches in cloud-1 frame
    transform, inliers, count = ransac_rigid(
        jax.random.PRNGKey(args.seed), src, dst,
        inlier_threshold=args.inlier_threshold,
        num_hypotheses=args.num_hypotheses, valid=valid)

    result = {
        "num_matches": int(idx.shape[0]),
        "num_inliers": int(count),
        "rotation": np.asarray(transform.rotation).tolist(),
        "translation": np.asarray(transform.translation).tolist(),
    }
    print(json.dumps(result, indent=2))

    if args.plot_dir:
        import os

        from feat3dnet_tpu.eval.visualize import plot_alignment, plot_matches

        os.makedirs(args.plot_dir, exist_ok=True)
        c1 = load_point_cloud(args.cloud1, args.data_dim) if args.cloud1 else xyz1
        c2 = load_point_cloud(args.cloud2, args.data_dim) if args.cloud2 else xyz2
        plot_matches(c1, xyz1, c2, xyz2, idx, np.asarray(inliers),
                     out_path=os.path.join(args.plot_dir, "matches.png"))
        plot_alignment(c1, c2, np.asarray(transform.rotation),
                       np.asarray(transform.translation),
                       out_path=os.path.join(args.plot_dir, "alignment.png"))
    return result


if __name__ == "__main__":
    main()
