"""Serving-kernel time decomposition (round-4, VERDICT item 2).

The 2-D slot-major serving kernel measures 1.84–1.94 M desc/s — ~56 % of
its lane-aware matmul ceiling — and r3 attributed the gap to "the VPU
elementwise stream" by elimination. This probe MEASURES the decomposition
with bench-only ablation bodies at identical operand shapes and the same
grid (ops/fused_describe._ablate_kernel_2d):

  stream    DMA + grid sequencing floor (read tile, write outputs)
  matmul    every tower matmul at exact shapes, VPU stream removed
  full      the production kernel
  full_par  production kernel with dimension_semantics=('parallel',)
  bf16_act  production kernel with bf16 inter-layer activations

  VPU stream        ≈ full − matmul
  MXU passes        ≈ matmul − stream
  sequencing + DMA  = stream

All variants compile up front in THIS process and timing rounds
interleave them (BENCHMARKS.md drift methodology).

    python benchmarks/probe_serving_ablation.py [--tile 256] [--steps 16]
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


def main(tile: int = 256, steps: int = 16, reps: int = 5, batch: int = 7500):
    from feat3dnet_tpu.config import ModelConfig
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.ops.fused_describe import (folded_weights,
                                                  fused_describe_clusters_2d)
    from feat3dnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = ModelConfig()
    model = Feat3DNet(cfg)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench as headline_bench

    clusters = headline_bench.build_cluster_batch()[:batch]
    variables = model.init(jax.random.PRNGKey(0), clusters[:8], training=False,
                           keypoints=jnp.zeros((8, 1, 3), jnp.float32))
    weights = folded_weights(variables, cfg)

    def make(**kw):
        @jax.jit
        def bench_step(weights, clusters, seed):
            def body(carry, eps):
                desc, att = fused_describe_clusters_2d(
                    weights, clusters * (1.0 + eps), cfg, tile=tile, **kw)
                return carry + jnp.sum(desc) + jnp.sum(att), None
            acc, _ = jax.lax.scan(
                body, jnp.float32(0),
                seed + 1e-6 * jnp.arange(steps, dtype=jnp.float32))
            return acc
        return bench_step

    @jax.jit
    def null_call(weights, clusters, seed):
        # pure dispatch+readback: measures the per-CALL tunnel RTT floor
        # that divides into every per-apply number below (subtract it)
        return seed + jnp.float32(1.0)

    variants = {
        "null": null_call,
        "stream": make(ablate="stream"),
        "matmul": make(ablate="matmul"),
        "full": make(),
        "full_par": make(parallel_grid=True),
        "bf16_act": make(bf16_act=True),
    }

    fns = {}
    for name, fn in variants.items():
        t0 = time.time()
        float(fn(weights, clusters, jnp.float32(0.0)))       # compile+settle
        print(f"compiled {name} in {time.time()-t0:.1f}s", flush=True)
        fns[name] = fn

    times = {n: [] for n in variants}
    for r in range(reps):
        for name, fn in fns.items():
            t0 = time.time()
            float(fn(weights, clusters, jnp.float32(1e-5 * (r + 1))))
            times[name].append(time.time() - t0)

    rtt = float(np.median(times["null"]))
    res = {"null_call_ms": round(rtt * 1000, 2)}
    for name in variants:
        if name == "null":
            continue
        med = float(np.median(times[name]))
        dev = med - rtt          # device time: per-call RTT subtracted
        res[name] = {"s_per_call": round(med, 4),
                     "ms_per_apply_dev": round(dev * 1000 / steps, 3),
                     "mdesc_per_s_dev": round(batch * steps / dev / 1e6, 3)}
        print(f"{name:9s} {dev*1000/steps:7.3f} ms/apply (device)  "
              f"{res[name]['mdesc_per_s_dev']:6.3f} M desc/s")

    full, mat, stream = (res["full"]["s_per_call"], res["matmul"]["s_per_call"],
                         res["stream"]["s_per_call"])
    decomp = {"vpu_stream_ms": round((full - mat) * 1000 / steps, 3),
              "mxu_passes_ms": round((mat - stream) * 1000 / steps, 3),
              "dma_seq_prep_ms": round((stream - rtt) * 1000 / steps, 3),
              "full_dev_ms": round((full - rtt) * 1000 / steps, 3),
              "rtt_ms_per_call": round(rtt * 1000, 2)}
    print("decomposition per apply:", decomp)
    print(json.dumps({"variants": res, "decomposition": decomp,
                      "tile": tile, "batch": batch, "steps": steps}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=7500)
    a = ap.parse_args()
    main(a.tile, a.steps, a.reps, a.batch)
