"""Tile-size sweep for the lane-dense transposed serving kernel
(`fused_describe_clusters_t`) — the named residual knob from the r4
serving roofline (BENCHMARKS.md: "a tile-size sweep on kernel_t ... are
the cheap residual knobs"). All tiles compile and time INTERLEAVED in one
process (the drift rule), per-call tunnel RTT subtracted via a null call,
and every tile's outputs are checked bit-equal to the tile-256 default
(the tile is a pure blocking choice — any mismatch is a kernel bug).

    python benchmarks/probe_kernel_t_tiles.py [--steps 128] [--bf16_act]
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


def main(tiles, steps: int = 128, reps: int = 5, batch: int = 7680,
         bf16_act: bool = False):
    from feat3dnet_tpu.config import ModelConfig
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.ops.fused_describe import (
        folded_weights, fused_describe_clusters_t, pack_clusters_lanes,
        transpose_folded_weights)
    from feat3dnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = ModelConfig()
    model = Feat3DNet(cfg)
    import bench as headline_bench

    base = headline_bench.build_cluster_batch()
    clusters = jnp.concatenate([base, base[:batch - base.shape[0]]], axis=0)
    variables = model.init(jax.random.PRNGKey(0), clusters[:8], training=False,
                           keypoints=jnp.zeros((8, 1, 3), jnp.float32))
    variables = jax.tree.map(lambda x: x + 0.05 if x.ndim == 1 else x,
                             variables)
    weights_t = transpose_folded_weights(folded_weights(variables, cfg))
    packed = jnp.asarray(pack_clusters_lanes(np.asarray(clusters)))

    def make_t(tile):
        @jax.jit
        def f(weights_t, cl, seed):
            def body(carry, eps):
                desc, att = fused_describe_clusters_t(
                    weights_t, cl * (1.0 + eps), cfg, tile=tile,
                    bf16_act=bf16_act)
                return carry + jnp.sum(desc) + jnp.sum(att), None
            acc, _ = jax.lax.scan(
                body, jnp.float32(0),
                seed + 1e-6 * jnp.arange(steps, dtype=jnp.float32))
            return acc
        return f

    @jax.jit
    def null_call(weights_t, cl, seed):
        return seed + jnp.float32(1.0)

    variants = {"null": null_call}
    for tile in tiles:
        assert batch % tile == 0, (batch, tile)
        variants[f"t{tile}"] = make_t(tile)

    for name, fn in variants.items():
        t0 = time.time()
        float(fn(weights_t, packed, jnp.float32(0.0)))
        print(f"compiled {name} in {time.time()-t0:.1f}s", flush=True)

    # bit-equality across tiles (one un-chained apply per tile)
    ref = None
    agree = {}
    for tile in tiles:
        d, a = jax.jit(lambda tile=tile: fused_describe_clusters_t(
            weights_t, packed, cfg, tile=tile, bf16_act=bf16_act))()
        d, a = np.asarray(d), np.asarray(a)
        if ref is None:
            ref = (d, a)
            agree[tile] = True
        else:
            agree[tile] = bool(np.array_equal(ref[0], d)
                               and np.array_equal(ref[1], a))
        print(f"tile={tile}: bit_equal_vs_t{tiles[0]}={agree[tile]}",
              flush=True)

    times = {n: [] for n in variants}
    for r in range(reps):
        for name, fn in variants.items():
            t0 = time.time()
            float(fn(weights_t, packed, jnp.float32(1e-5 * (r + 1))))
            times[name].append(time.time() - t0)

    rtt = float(np.median(times["null"]))
    res = {"null_call_ms": round(rtt * 1000, 2), "bf16_act": bf16_act,
           "bit_equal": agree}
    for name in variants:
        if name == "null":
            continue
        dev = float(np.median(times[name])) - rtt
        res[name] = {"ms_per_apply_dev": round(dev * 1000 / steps, 3),
                     "mdesc_per_s_dev": round(batch * steps / dev / 1e6, 3)}
        print(f"{name:6s} {res[name]['ms_per_apply_dev']:7.3f} ms/apply "
              f"(device)  {res[name]['mdesc_per_s_dev']:6.3f} M desc/s",
              flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, nargs="+", default=[256, 512, 128])
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--bf16_act", action="store_true")
    a = ap.parse_args()
    main(a.tiles, a.steps, a.reps, bf16_act=a.bf16_act)
