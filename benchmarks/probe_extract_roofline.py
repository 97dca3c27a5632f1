"""Hashed-extract roofline (round-4, VERDICT item 5): make the 120k
extract's 0.26-0.29 s a measured '% of achievable' instead of 'fast'.

Host-side statistics:
  * Morton culling effectiveness: fraction of (center-tile, point-block)
    pairs whose radius-dilated bboxes overlap — each surviving pair is one
    'open' merge step (the kernels skip closed pairs);
  * candidate points per center (open pairs x block size / centers) vs the
    actual in-ball population — the cull's residual slack;
  * logical vs PHYSICAL (lane-padded) bytes of the grouped neighborhood
    tensor: (N, ns, 3) f32 pads its lane dim 3 -> 128 on TPU (42x), the
    same tax the r4 serving rewrite removed.

Device-side (interleaved, null-call RTT subtracted):
  * merge (grouping) full vs an ALL-CLOSED block_mask (pure grid
    sequencing + block DMA floor — zero merge work);
  * NMS ball-max full vs all-closed;
  * detector-on-grouped (the chunked XLA tower pass);
  * derived: µs per OPEN merge step, compared against the step's MXU
    lower bound (the two (L, L)@(L, tc) prefix-rank matmuls at 49 TFLOP/s)
    -> the '% of achievable' figure for BENCHMARKS.md.

    python benchmarks/probe_extract_roofline.py [--n 120000]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def bbox_open_fraction(centers_sorted, blk_bbox, tile, radius):
    """Exact host replica of the kernels' bbox cull: tile bbox (over tc
    consecutive sorted centers) vs block bbox dilated by radius."""
    nt = centers_sorted.shape[0] // tile
    tiles = centers_sorted[:nt * tile].reshape(nt, tile, 3)
    tmin, tmax = tiles.min(1), tiles.max(1)                   # (nt, 3)
    bmin, bmax = blk_bbox[:, :3], blk_bbox[:, 3:6]            # (nb, 3)
    open_mask = np.ones((nt, bmin.shape[0]), bool)
    for a in range(3):
        open_mask &= (tmin[:, a:a + 1] <= bmax[None, :, a] + radius)
        open_mask &= (tmax[:, a:a + 1] >= bmin[None, :, a] - radius)
    return open_mask


def main(n_points: int = 120000, reps: int = 5):
    from feat3dnet_tpu.config import InferenceConfig, ModelConfig, bucket_for
    from feat3dnet_tpu.inference import InferencePipeline
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.ops.hash_grid import (SortedCloud, ball_max_sorted,
                                             ball_query_grouped_sorted,
                                             build_sorted_cloud_host,
                                             estimate_ball_points)
    from feat3dnet_tpu.utils import enable_compilation_cache
    from feat3dnet_tpu.utils.synthetic import synthetic_submap

    enable_compilation_cache()
    cfg = ModelConfig(num_clusters=-1)
    icfg = InferenceConfig()
    model = Feat3DNet(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 3)),
                   training=False)
    pipe = InferencePipeline(model, v, cfg, icfg)

    big = synthetic_submap() if n_points == 120000 else None
    if big is None:
        rng = np.random.RandomState(0)
        big = rng.rand(n_points, 3).astype(np.float32) * \
            np.array([100, 100, 10], np.float32)
    n = big.shape[0]
    nb = bucket_for(n)
    padded = np.zeros((nb, 3), np.float32)
    padded[:n] = big[:, :3]
    valid = np.zeros(nb, bool)
    valid[:n] = True
    L, tc = pipe._HASH_BLOCK, pipe._HASH_TILE
    ns, r = cfg.num_samples, float(cfg.base_scale)
    sc = build_sorted_cloud_host(padded, valid, cell_size=r, block_size=L)

    # ---- host statistics --------------------------------------------------
    stats = {"n": n, "bucket": nb, "layout": [L, tc]}
    open_att = bbox_open_fraction(sc.pts4[:, :3], sc.blk_bbox, tc, r)
    open_nms = bbox_open_fraction(sc.pts4[:, :3], sc.blk_bbox, 512,
                                  float(icfg.nms_radius))
    stats["merge_steps_total"] = int(open_att.size)
    stats["merge_steps_open"] = int(open_att.sum())
    stats["merge_open_frac"] = round(float(open_att.mean()), 4)
    stats["nms_open_frac"] = round(float(open_nms.mean()), 4)
    # candidates per center vs true ball population
    cand_per_center = open_att.sum(1) * L / tc                # per tile row
    stats["candidates_per_center"] = round(float(cand_per_center.mean()), 1)
    stats["est_ball_points"] = round(
        float(estimate_ball_points(big[:, :3], r)), 1)
    stats["cull_slack_x"] = round(
        stats["candidates_per_center"] / max(stats["est_ball_points"], 1e-9), 1)
    # grouped tensor: logical vs lane-padded physical
    stats["grouped_logical_MiB"] = round(nb * ns * 3 * 4 / 2**20, 1)
    stats["grouped_padded_MiB"] = round(nb * ns * 128 * 4 / 2**20, 1)

    # ---- device measurements (interleaved, RTT-subtracted) ----------------
    pts4 = jnp.asarray(sc.pts4)
    bbox = jnp.asarray(sc.blk_bbox)
    scd = SortedCloud(pts4=pts4, blk_bbox=bbox, orig_idx=None,
                      inv_perm=None, block_size=0)
    centers = pts4[:, :3]
    att = jnp.abs(pts4[:, 0]) % 7.0 + 0.1
    nt = nb // tc
    nblk = nb // L
    mask_false = jnp.zeros((nt, nblk), bool)
    mask_false_nms = jnp.zeros((nb // 512, nblk), bool)

    core = pipe._hashed_attention_sorted(nb)

    def merge_full():
        g, _, c = ball_query_grouped_sorted(scd, centers, r, ns, tile=tc)
        return jnp.sum(c)

    def merge_floor():
        g, _, c = ball_query_grouped_sorted(scd, centers, r, ns, tile=tc,
                                            block_mask=mask_false)
        return jnp.sum(c)

    def ballmax_full():
        return jnp.sum(ball_max_sorted(pts4, bbox, att,
                                       float(icfg.nms_radius)))

    def ballmax_floor():
        return jnp.sum(ball_max_sorted(pts4, bbox, att,
                                       float(icfg.nms_radius),
                                       block_mask=mask_false_nms))

    grouped, _, _ = jax.jit(lambda: ball_query_grouped_sorted(
        scd, centers, r, ns, tile=tc))()

    def detector():
        a, o = core.detector_on_grouped(pipe.variables, grouped, centers)
        return jnp.sum(a)

    def null():
        return pts4[0, 0]

    fns = {"null": jax.jit(null), "merge_full": jax.jit(merge_full),
           "merge_floor": jax.jit(merge_floor),
           "ballmax_full": jax.jit(ballmax_full),
           "ballmax_floor": jax.jit(ballmax_floor),
           "detector": jax.jit(detector)}
    for name, fn in fns.items():
        t0 = time.time()
        float(np.asarray(fn()).ravel()[0])
        print(f"compiled {name} in {time.time()-t0:.1f}s", flush=True)

    times = {k: [] for k in fns}
    for _ in range(reps):
        for name, fn in fns.items():
            t0 = time.time()
            float(np.asarray(fn()).ravel()[0])
            times[name].append(time.time() - t0)

    rtt = float(np.median(times["null"]))
    dev = {k: float(np.median(v)) - rtt for k, v in times.items()
           if k != "null"}
    for k, t in dev.items():
        print(f"{k:14s} {t*1000:8.1f} ms (device)")

    open_steps = stats["merge_steps_open"]
    per_open_us = (dev["merge_full"] - dev["merge_floor"]) / max(open_steps, 1) * 1e6
    # MXU lower bound per open step: two (L, L)@(L, tc) prefix-rank matmuls
    mxu_bound_us = 2 * L * L * tc * 2 / 49e12 * 1e6
    stats.update({
        "rtt_ms": round(rtt * 1000, 1),
        "merge_full_ms": round(dev["merge_full"] * 1000, 1),
        "merge_floor_ms": round(dev["merge_floor"] * 1000, 1),
        "ballmax_full_ms": round(dev["ballmax_full"] * 1000, 1),
        "ballmax_floor_ms": round(dev["ballmax_floor"] * 1000, 1),
        "detector_ms": round(dev["detector"] * 1000, 1),
        "merge_us_per_open_step": round(per_open_us, 2),
        "mxu_bound_us_per_open_step": round(mxu_bound_us, 2),
        "merge_pct_of_mxu_bound": round(100 * mxu_bound_us / max(per_open_us, 1e-9), 1),
    })
    print(json.dumps(stats, indent=1))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=120000)
    ap.add_argument("--reps", type=int, default=5)
    a = ap.parse_args()
    main(a.n, a.reps)
