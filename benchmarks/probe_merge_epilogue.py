"""Size the merge epilogue's cost (round-4, planes-path sizing).

ball_query_grouped_sorted = raw transposed driver (lane-dense plane
outputs) + _merge_epilogue_t (un-transpose + stack to the 32x-lane-padded
(M, ns, 4) buffer) + _finish_grouped (repeat-pad on rank-3). The extract
roofline measured the whole chain at ~102 ms for 120k points; this probe
splits raw vs epilogue+finish to size the prize of a planes-consuming
detector path. Interleaved, null-RTT subtracted.

    python benchmarks/probe_merge_epilogue.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main(reps: int = 5):
    from feat3dnet_tpu.config import ModelConfig, bucket_for
    from feat3dnet_tpu.ops.hash_grid import (SortedCloud,
                                             _bq_sorted_raw_t_fori,
                                             ball_query_grouped_sorted,
                                             build_sorted_cloud_host)
    from feat3dnet_tpu.utils import enable_compilation_cache
    from feat3dnet_tpu.utils.synthetic import synthetic_submap

    enable_compilation_cache()
    big = synthetic_submap()
    n = big.shape[0]
    nb = bucket_for(n)
    padded = np.zeros((nb, 3), np.float32)
    padded[:n] = big[:, :3]
    valid = np.zeros(nb, bool)
    valid[:n] = True
    sc = build_sorted_cloud_host(padded, valid, cell_size=2.0, block_size=256)
    pts4 = jnp.asarray(sc.pts4)
    bbox = jnp.asarray(sc.blk_bbox)
    scd = SortedCloud(pts4=pts4, blk_bbox=bbox, orig_idx=None,
                      inv_perm=None, block_size=0)
    centers = pts4[:, :3]

    def full():
        g, i, c = ball_query_grouped_sorted(scd, centers, 2.0, 64, tile=256)
        return jnp.sum(c) + g[0, 0, 0]

    def raw():
        top, cnt = _bq_sorted_raw_t_fori(pts4, bbox, centers, 2.0, 64,
                                         tile=256)
        return jnp.sum(cnt) + top[0, 0, 0]

    def null():
        return pts4[0, 0]

    fns = {"null": jax.jit(null), "full": jax.jit(full), "raw": jax.jit(raw)}
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
    res = {k: round((float(np.median(v)) - rtt) * 1000, 1)
           for k, v in times.items() if k != "null"}
    res["epilogue_finish_ms"] = round(res["full"] - res["raw"], 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
