"""Lane-dense transposed serving kernel vs the slot-major 2-D kernel
(round 4). Interleaved same-process A/B, per-call tunnel RTT subtracted
via a null call. Also checks on-chip output agreement.

    python benchmarks/probe_kernel_t.py [--steps 128]
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


def main(tile: int = 256, steps: int = 128, reps: int = 5, batch: int = 7680):
    from feat3dnet_tpu.config import ModelConfig
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.ops.fused_describe import (
        folded_weights, fused_describe_clusters_2d, fused_describe_clusters_t,
        pack_clusters_lanes, transpose_folded_weights)
    from feat3dnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = ModelConfig()
    model = Feat3DNet(cfg)
    import bench as headline_bench

    base = headline_bench.build_cluster_batch()
    clusters = jnp.concatenate([base, base[:batch - base.shape[0]]], axis=0)
    variables = model.init(jax.random.PRNGKey(0), clusters[:8], training=False,
                           keypoints=jnp.zeros((8, 1, 3), jnp.float32))
    # perturb 1-D params (biases/BN) so descriptors are non-degenerate —
    # at raw zero-bias init the descriptor tower is exactly 0 and cosine
    # agreement is meaningless
    variables = jax.tree.map(lambda x: x + 0.05 if x.ndim == 1 else x,
                             variables)
    weights = folded_weights(variables, cfg)
    weights_t = transpose_folded_weights(weights)
    packed = jnp.asarray(pack_clusters_lanes(np.asarray(clusters)))

    def make_2d(**kw):
        @jax.jit
        def f(weights, cl, seed):
            def body(carry, eps):
                desc, att = fused_describe_clusters_2d(
                    weights, cl * (1.0 + eps), cfg, tile=tile, **kw)
                return carry + jnp.sum(desc) + jnp.sum(att), None
            acc, _ = jax.lax.scan(body, jnp.float32(0),
                                  seed + 1e-6 * jnp.arange(steps, dtype=jnp.float32))
            return acc
        return f, clusters

    def make_t(**kw):
        @jax.jit
        def f(weights, cl, seed):
            def body(carry, eps):
                desc, att = fused_describe_clusters_t(
                    weights_t, cl * (1.0 + eps), cfg, tile=tile, **kw)
                return carry + jnp.sum(desc) + jnp.sum(att), None
            acc, _ = jax.lax.scan(body, jnp.float32(0),
                                  seed + 1e-6 * jnp.arange(steps, dtype=jnp.float32))
            return acc
        return f, packed

    @jax.jit
    def null_call(weights, cl, seed):
        return seed + jnp.float32(1.0)

    variants = {
        "null": (null_call, clusters),
        "full_2d": make_2d(),
        "kernel_t": make_t(),
        "kernel_t_bf16": make_t(bf16_act=True),
    }

    for name, (fn, cl) in variants.items():
        t0 = time.time()
        float(fn(weights, cl, jnp.float32(0.0)))
        print(f"compiled {name} in {time.time()-t0:.1f}s", flush=True)

    # on-chip agreement
    d0, a0 = jax.jit(lambda: fused_describe_clusters_2d(
        weights, clusters, cfg, tile=tile))()
    d1, a1 = jax.jit(lambda: fused_describe_clusters_t(
        weights_t, packed, cfg, tile=tile))()
    d0, d1, a0, a1 = map(np.asarray, (d0, d1, a0, a1))
    bit_eq = bool(np.array_equal(d0, d1) and np.array_equal(a0, a1))
    live = np.linalg.norm(d0, axis=1) > 0.5      # L2-normalized unless degenerate
    cos = np.sum(d0[live] * d1[live], axis=1) / (
        np.linalg.norm(d0[live], axis=1) * np.linalg.norm(d1[live], axis=1) + 1e-12)
    print(f"kernel_t vs 2d: bit_equal={bit_eq} live={int(live.sum())}/{len(live)} "
          f"cos_min={cos.min():.8f} maxdiff={np.max(np.abs(d0-d1)):.2e} "
          f"att_relmax={np.max(np.abs(a0-a1)/(np.abs(a0)+1e-9)):.2e}")

    times = {n: [] for n in variants}
    for r in range(reps):
        for name, (fn, cl) in variants.items():
            t0 = time.time()
            float(fn(weights, cl, jnp.float32(1e-5 * (r + 1))))
            times[name].append(time.time() - t0)

    rtt = float(np.median(times["null"]))
    res = {"null_call_ms": round(rtt * 1000, 2), "bit_equal": bit_eq,
           "cos_min": float(cos.min()),
           "maxdiff": float(np.max(np.abs(d0 - d1)))}
    for name in variants:
        if name == "null":
            continue
        dev = float(np.median(times[name])) - rtt
        res[name] = {"ms_per_apply_dev": round(dev * 1000 / steps, 3),
                     "mdesc_per_s_dev": round(batch * steps / dev / 1e6, 3)}
        print(f"{name:14s} {res[name]['ms_per_apply_dev']:7.3f} ms/apply (device)  "
              f"{res[name]['mdesc_per_s_dev']:6.3f} M desc/s")
    print(json.dumps(res))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--reps", type=int, default=5)
    a = ap.parse_args()
    main(a.tile, a.steps, a.reps)
