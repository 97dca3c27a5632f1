"""Interleaved same-session A/B of the fill-gated buffer-rank compare in
the transposed merge kernel (fill_gate=True on _bq_sorted_raw_t_fori /
_bq_sorted_raw_t) vs the default ungated loop, on the 120k synthetic
submap and the kitti 29k cloud. Both variants compile in one process and
alternate timing, so compile-service drift cannot masquerade as a kernel
effect (the first cross-process attempt mismeasured exactly that way —
see BENCHMARKS.md).

Absolute times are dominated by downloading the full (M, ns, 4) merge
buffer through the tunnel (~134 MB at 131k) — identical for both
variants, so read the DELTAS, not the levels.

    python benchmarks/probe_fill_gate.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    # tunnel-safe sync: read one scalar back to the host
    float(np.asarray(out[0]).ravel()[0])
    return out


def main():
    from feat3dnet_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from feat3dnet_tpu.data.io import example_cloud_path, load_point_cloud
    from feat3dnet_tpu.ops.hash_grid import (_bq_sorted_raw_t,
                                             _bq_sorted_raw_t_fori,
                                             build_sorted_cloud_host)
    from feat3dnet_tpu.utils.synthetic import synthetic_submap

    clouds = {
        "kitti_29k": load_point_cloud(
            example_cloud_path("kitti_00_001554.bin"), num_cols=6)[:, :3],
        "synth_120k": synthetic_submap()[:, :3],
    }
    for name, xyz in clouds.items():
        nb = 1 << int(np.ceil(np.log2(xyz.shape[0])))
        pd = np.zeros((nb, 3), np.float32)
        pd[:xyz.shape[0]] = xyz
        vl = np.zeros((nb,), bool)
        vl[:xyz.shape[0]] = True
        sc = build_sorted_cloud_host(pd, vl, cell_size=2.0, block_size=256)
        pts4 = jnp.asarray(sc.pts4)
        bbox = jnp.asarray(sc.blk_bbox)
        centers = pts4[:, :3]
        for drv_name, drv in (("fori", _bq_sorted_raw_t_fori),
                              ("grid", _bq_sorted_raw_t)):
            variants = {
                "ungated": dict(fill_gate=False),
                "gated  ": dict(fill_gate=True),
            }
            for kw in variants.values():    # warm/compile both
                timed(drv, pts4, bbox, centers, 2.0, 64, tile=256, **kw)
            times = {k: [] for k in variants}
            for r in range(7):
                for k, kw in variants.items():   # interleaved
                    t0 = time.time()
                    timed(drv, pts4, bbox, centers, 2.0, 64, tile=256, **kw)
                    times[k].append(time.time() - t0)
            for k in variants:
                print(f"{name:11s} {drv_name} {k} median "
                      f"{np.median(times[k]):.4f}s", flush=True)


if __name__ == "__main__":
    main()
