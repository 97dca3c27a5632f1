"""On-chip A/B of the hoisted-mask serving kernel.

`fused_describe_clusters_2d(hoist_mask=True)` computes the in-ball /
nearest-fallback mask and the radius normalization with XLA OUTSIDE the
Pallas kernel (they depend only on the points) and feeds the mask in as a
slot-major (ns, B, 1) input. That removes the whole membership chain —
~25 ops on (R, 1) columns, each padded to a full 128-lane vreg — from the
kernel's VPU stream, which the round-3 analysis identified as the binding
resource. Bit-exact vs hoist_mask=False (verified here on chip).

Interleaved same-session A/B (BENCHMARKS.md session-drift rule):

    python benchmarks/probe_hoist.py
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

    # on-chip exactness: hoisted == in-kernel mask, bit for bit
    d0, a0 = fused_describe_clusters_2d(weights, clusters, cfg, tile=256,
                                        hoist_mask=False)
    d1, a1 = fused_describe_clusters_2d(weights, clusters, cfg, tile=256,
                                        hoist_mask=True)
    print(f"on-chip exactness hoist vs in-kernel: desc maxdiff "
          f"{float(jnp.abs(d0 - d1).max()):.3e}, att maxdiff "
          f"{float(jnp.abs(a0 - a1).max()):.3e}", flush=True)

    def make_step(tile, hoist):
        @jax.jit
        def step(weights, clusters, seed):
            def body(carry, eps):
                d, a = fused_describe_clusters_2d(
                    weights, clusters * (1.0 + eps), cfg, tile=tile,
                    hoist_mask=hoist)
                return carry + jnp.sum(d), None
            acc, _ = jax.lax.scan(
                body, jnp.float32(0),
                seed + 1e-6 * jnp.arange(K, dtype=jnp.float32))
            return acc
        return step

    configs = [(t, h) for t in (128, 256, 512) for h in (False, True)]
    steps = {}
    for tile, hoist in configs:
        steps[(tile, hoist)] = make_step(tile, hoist)
        try:
            float(steps[(tile, hoist)](weights, clusters, jnp.float32(0.0)))
        except Exception as e:
            print(f"tile={tile} hoist={hoist} compile FAILED: "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
            steps[(tile, hoist)] = None

    # interleaved measurement: 3 rounds over all configs
    times = {k: [] for k in configs}
    for r in range(3):
        for key in configs:
            if steps[key] is None:
                continue
            t0 = time.time()
            float(steps[key](weights, clusters, jnp.float32(1e-5 * (r + 1))))
            times[key].append(time.time() - t0)
    for tile, hoist in configs:
        if not times[(tile, hoist)]:
            continue
        rate = B * K / np.median(times[(tile, hoist)])
        print(f"tile={tile:4d} hoist={int(hoist)}  {rate / 1e6:6.3f} M desc/s",
              flush=True)


if __name__ == "__main__":
    main()
