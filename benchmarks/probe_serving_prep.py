"""Bisect the serving call's DMA/prep floor (round-4 follow-up).

probe_serving_ablation measured the 'stream' ablation (no compute at all)
at 3.8 of the full kernel's 5.0 ms/apply — the kernel call is dominated by
something OUTSIDE the tower compute. Candidates: the XLA-side (B, ns, 3)
→ (ns, B, 3) transpose + pad, the per-step input perturbation, the grid
block DMA itself. This probe separates them, interleaved in one process:

  full         production kernel (anchor; pad+transpose inside)
  stream       no-compute ablation (anchor; pad+transpose inside)
  full_sm      production kernel, input PRE-transposed outside the scan
               (slot_major_input=True) — perturbation stays per-step
  stream_sm    no-compute ablation on pre-transposed input
  prep_only    the XLA pad+transpose alone, no pallas call

    python benchmarks/probe_serving_prep.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main(tile: int = 256, steps: int = 16, reps: int = 5, batch: int = 7680):
    from feat3dnet_tpu.config import ModelConfig
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.ops.fused_describe import (folded_weights,
                                                  fused_describe_clusters_2d)
    from feat3dnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = ModelConfig()
    model = Feat3DNet(cfg)
    import bench as headline_bench

    # batch is a tile multiple so the slot-major variants need no pad
    base = headline_bench.build_cluster_batch()
    clusters = jnp.concatenate([base, base[:batch - base.shape[0]]], axis=0)
    variables = model.init(jax.random.PRNGKey(0), clusters[:8], training=False,
                           keypoints=jnp.zeros((8, 1, 3), jnp.float32))
    weights = folded_weights(variables, cfg)
    clusters_sm = jnp.transpose(clusters, (1, 0, 2))          # (ns, B, 3)

    def make(sm, **kw):
        @jax.jit
        def bench_step(weights, cl, seed):
            def body(carry, eps):
                desc, att = fused_describe_clusters_2d(
                    weights, cl * (1.0 + eps), cfg, tile=tile,
                    slot_major_input=sm, **kw)
                return carry + jnp.sum(desc) + jnp.sum(att), None
            acc, _ = jax.lax.scan(
                body, jnp.float32(0),
                seed + 1e-6 * jnp.arange(steps, dtype=jnp.float32))
            return acc
        return bench_step

    @jax.jit
    def prep_only(weights, cl, seed):
        def body(carry, eps):
            padded = (cl * (1.0 + eps)).astype(jnp.float32)
            sm = jnp.transpose(padded, (1, 0, 2))
            return carry + sm[0, 0, 0] + sm[-1, -1, -1], None
        acc, _ = jax.lax.scan(
            body, jnp.float32(0),
            seed + 1e-6 * jnp.arange(steps, dtype=jnp.float32))
        return acc

    variants = {
        "full": (make(False), clusters),
        "stream": (make(False, ablate="stream"), clusters),
        "full_sm": (make(True), clusters_sm),
        "stream_sm": (make(True, ablate="stream"), clusters_sm),
        "prep_only": (prep_only, clusters),
    }

    for name, (fn, cl) in variants.items():
        t0 = time.time()
        float(fn(weights, cl, jnp.float32(0.0)))
        print(f"compiled {name} in {time.time()-t0:.1f}s", flush=True)

    # correctness: full_sm == full bit-exact
    d0, a0 = jax.jit(lambda: fused_describe_clusters_2d(
        weights, clusters, cfg, tile=tile))()
    d1, a1 = jax.jit(lambda: fused_describe_clusters_2d(
        weights, clusters_sm, cfg, tile=tile, slot_major_input=True))()
    eq = bool(jnp.all(d0 == d1) & jnp.all(a0 == a1))
    print(f"slot_major_input bit-equal: {eq}")

    times = {n: [] for n in variants}
    for r in range(reps):
        for name, (fn, cl) in variants.items():
            t0 = time.time()
            float(fn(weights, cl, jnp.float32(1e-5 * (r + 1))))
            times[name].append(time.time() - t0)

    res = {}
    for name in variants:
        med = float(np.median(times[name]))
        res[name] = {"ms_per_apply": round(med * 1000 / steps, 3),
                     "mdesc_per_s": round(batch * steps / med / 1e6, 3)}
        print(f"{name:10s} {res[name]['ms_per_apply']:7.3f} ms/apply  "
              f"{res[name]['mdesc_per_s']:6.3f} M desc/s")
    print(json.dumps({"variants": res, "bit_equal": eq, "tile": tile,
                      "batch": batch, "steps": steps}))


if __name__ == "__main__":
    main()
