"""Interleaved tile=256 vs tile=512 (and 1024) A/B of the slot-major 2-D
serving kernel — the one untried point of the r3 tile sweep (64/128/256
was monotonic toward 256). If per-step sequencing still matters, a larger
tile amortizes it further; if the bind is purely the VPU elementwise
stream (BENCHMARKS roofline), this measures flat.

    python benchmarks/probe_tile512.py
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
                                                  fused_describe_clusters_2d)

    cfg = ModelConfig()
    model = Feat3DNet(cfg)
    clusters = bench.build_cluster_batch()
    keypoints = jnp.zeros((clusters.shape[0], 1, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), clusters[:8], training=False,
                           keypoints=keypoints[:8])
    weights = folded_weights(variables, cfg)
    B, K = clusters.shape[0], bench.SCAN_STEPS

    steps = {}
    for tile in (256, 512, 1024):
        @jax.jit
        def step(weights, clusters, seed, tile=tile):
            def body(carry, eps):
                d, _ = fused_describe_clusters_2d(
                    weights, clusters * (1.0 + eps), cfg, tile=tile)
                return carry + jnp.sum(d), None
            acc, _ = jax.lax.scan(
                body, jnp.float32(0),
                seed + 1e-6 * jnp.arange(K, dtype=jnp.float32))
            return acc
        steps[tile] = step

    ref = None
    for tile, step in list(steps.items()):
        try:
            v = float(step(weights, clusters, jnp.float32(0.0)))  # compile
            if ref is None:
                ref = v
            ok = "exact" if v == ref else f"MISMATCH {v} vs {ref}"
            print(f"tile={tile}: compiled, checksum {ok}", flush=True)
        except Exception as e:
            print(f"tile={tile}: FAILED {type(e).__name__}: {str(e)[:250]}",
                  flush=True)
            del steps[tile]

    times = {t: [] for t in steps}
    for r in range(5):
        for tile, step in steps.items():          # interleaved
            t0 = time.time()
            float(step(weights, clusters, jnp.float32(1e-5 * (r + 1))))
            times[tile].append(time.time() - t0)
    for tile in steps:
        rate = B * K / np.median(times[tile])
        print(f"tile={tile:5d}  {rate / 1e6:6.3f} M desc/s", flush=True)


if __name__ == "__main__":
    main()
