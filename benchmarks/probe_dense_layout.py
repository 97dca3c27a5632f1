"""Hypothesis check for the serving DMA floor (round 4).

probe_serving_prep showed even a no-compute kernel call costs ~3 ms/apply
and the XLA prep alone ~2 ms. Hypothesis: every (…, 3) array is lane-padded
3 → 128 on TPU (42× physical bytes — (7680, 64, 3) f32 stores 251 MB), so
the elementwise prep AND the block DMA stream mostly padding. Check: the
same no-compute pattern on a LANE-DENSE (ns·3, B) layout of the identical
payload should cost ~100× less.

    python benchmarks/probe_dense_layout.py
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main(tile: int = 256, steps: int = 16, reps: int = 5, batch: int = 7680,
         ns: int = 64):
    from feat3dnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.RandomState(0)
    dense = jnp.asarray(rng.randn(ns * 3, batch).astype(np.float32))   # lane-dense
    padded3 = jnp.asarray(rng.randn(ns, batch, 3).astype(np.float32))  # lane 3

    def kern_dense(x_ref, o_ref):
        x = x_ref[...]
        o_ref[...] = x[:8, :] + 1.0

    def kern_rank3(x_ref, o_ref):
        x = x_ref[...]
        o_ref[...] = x[0, :8, :] + 1.0

    @jax.jit
    def run_dense(cl, seed):
        def body(carry, eps):
            out = pl.pallas_call(
                kern_dense, grid=(batch // tile,),
                in_specs=[pl.BlockSpec((ns * 3, tile), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((8, tile), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, batch), jnp.float32),
            )(cl * (1.0 + eps))
            return carry + jnp.sum(out[:1]), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              seed + 1e-6 * jnp.arange(steps, dtype=jnp.float32))
        return acc

    @jax.jit
    def run_rank3(cl, seed):
        def body(carry, eps):
            out = pl.pallas_call(
                kern_rank3, grid=(batch // tile,),
                in_specs=[pl.BlockSpec((ns, tile, 3), lambda i: (0, i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((8, 3), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8 * (batch // tile), 3), jnp.float32),
            )(cl * (1.0 + eps))
            return carry + jnp.sum(out[:1]), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              seed + 1e-6 * jnp.arange(steps, dtype=jnp.float32))
        return acc

    @jax.jit
    def mult_dense(cl, seed):
        def body(carry, eps):
            y = cl * (1.0 + eps)
            return carry + y[0, 0] + y[-1, -1], None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              seed + 1e-6 * jnp.arange(steps, dtype=jnp.float32))
        return acc

    @jax.jit
    def mult_rank3(cl, seed):
        def body(carry, eps):
            y = cl * (1.0 + eps)
            return carry + y[0, 0, 0] + y[-1, -1, -1], None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              seed + 1e-6 * jnp.arange(steps, dtype=jnp.float32))
        return acc

    variants = {
        "pallas_dense": (run_dense, dense),
        "pallas_rank3": (run_rank3, padded3),
        "mult_dense": (mult_dense, dense),
        "mult_rank3": (mult_rank3, padded3),
    }
    for name, (fn, cl) in variants.items():
        t0 = time.time()
        float(fn(cl, jnp.float32(0.0)))
        print(f"compiled {name} in {time.time()-t0:.1f}s", flush=True)

    times = {n: [] for n in variants}
    for r in range(reps):
        for name, (fn, cl) in variants.items():
            t0 = time.time()
            float(fn(cl, jnp.float32(1e-5 * (r + 1))))
            times[name].append(time.time() - t0)

    res = {n: round(float(np.median(t)) * 1000 / steps, 3)
           for n, t in times.items()}
    for n, v in res.items():
        print(f"{n:13s} {v:7.3f} ms/apply")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
