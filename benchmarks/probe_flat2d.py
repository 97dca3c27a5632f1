"""On-chip A/B of the slot-major fully-2D serving kernel.

`fused_describe_clusters_2d` reformulates the whole forward in slot-major
rows so every slot pool is a contiguous-half sublane max and every
cluster→row broadcast is block repetition — nothing rank-3 for Mosaic to
unroll (ops/fused_describe.py `_kernel_2d`). This probe compile-checks it
on the real chip, verifies bit-exactness vs the rank-3 kernel, and
measures throughput across tiles and bf16 settings.

    python benchmarks/probe_flat2d.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from feat3dnet_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import bench
    from feat3dnet_tpu.config import ModelConfig
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.ops.fused_describe import (folded_weights,
        fused_describe_clusters, fused_describe_clusters_2d)

    cfg = ModelConfig()
    model = Feat3DNet(cfg)
    clusters = bench.build_cluster_batch()
    keypoints = jnp.zeros((clusters.shape[0], 1, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), clusters[:8], training=False,
                           keypoints=keypoints[:8])
    weights = folded_weights(variables, cfg)
    B, K = clusters.shape[0], bench.SCAN_STEPS

    # exactness on the real chip (one un-scanned call per config)
    d0, a0 = fused_describe_clusters(weights, clusters, cfg, tile=64)
    for name, fn in (
        ("flat-2d t=64 ", lambda: fused_describe_clusters_2d(
            weights, clusters, cfg, tile=64)),
        ("flat-2d t=128", lambda: fused_describe_clusters_2d(
            weights, clusters, cfg, tile=128)),
    ):
        try:
            d1, a1 = fn()
            print(f"on-chip exactness {name}: desc maxdiff "
                  f"{float(jnp.abs(d0 - d1).max()):.3e}, att maxdiff "
                  f"{float(jnp.abs(a0 - a1).max()):.3e}", flush=True)
        except Exception as e:
            print(f"on-chip exactness {name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    variants = [("baseline ", dict(), fused_describe_clusters),
                ("flat-2d  ", dict(), fused_describe_clusters_2d),
                ("baseline bf16a", dict(bf16_act=True),
                 fused_describe_clusters),
                ("flat-2d  bf16a", dict(bf16_act=True),
                 fused_describe_clusters_2d)]
    for tile in (64, 128, 256):
        for name, kw, fn in variants:
            @jax.jit
            def step(weights, clusters, seed, tile=tile, kw=kw, fn=fn):
                def body(carry, eps):
                    d, a = fn(weights, clusters * (1.0 + eps), cfg,
                              tile=tile, **kw)
                    return carry + jnp.sum(d), None
                acc, _ = jax.lax.scan(
                    body, jnp.float32(0),
                    seed + 1e-6 * jnp.arange(K, dtype=jnp.float32))
                return acc

            label = f"tile={tile:4d} {name}"
            try:
                float(step(weights, clusters, jnp.float32(0.0)))
                ts = []
                for r in range(3):
                    t0 = time.time()
                    float(step(weights, clusters, jnp.float32(1e-5 * (r + 1))))
                    ts.append(time.time() - t0)
                rate = B * K / np.median(ts)
                print(f"{label}  {rate / 1e6:6.3f} M desc/s", flush=True)
            except Exception as e:
                print(f"{label}  FAILED: {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
