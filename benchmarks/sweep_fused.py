"""Tile/bf16 sweep for the fused serving kernel (picks bench.py settings).

    python benchmarks/sweep_fused.py
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
    from feat3dnet_tpu.ops.fused_describe import folded_weights, fused_describe_clusters

    cfg = ModelConfig()
    model = Feat3DNet(cfg)
    clusters = bench.build_cluster_batch()
    keypoints = jnp.zeros((clusters.shape[0], 1, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), clusters[:8], training=False,
                           keypoints=keypoints[:8])
    weights = folded_weights(variables, cfg)
    B, K = clusters.shape[0], bench.SCAN_STEPS

    for tile in (64, 128, 256):
        for bf16 in (False, True):
            for vpu_k3 in (False, True):
                @jax.jit
                def step(weights, clusters, seed, tile=tile, bf16=bf16,
                         vpu_k3=vpu_k3):
                    def body(carry, eps):
                        d, a = fused_describe_clusters(
                            weights, clusters * (1.0 + eps), cfg, tile=tile,
                            bf16_matmul=bf16, vpu_k3=vpu_k3)
                        return carry + jnp.sum(d), None
                    acc, _ = jax.lax.scan(
                        body, jnp.float32(0),
                        seed + 1e-6 * jnp.arange(K, dtype=jnp.float32))
                    return acc

                label = f"tile={tile:4d} bf16={int(bf16)} vpu_k3={int(vpu_k3)}"
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
                          f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
