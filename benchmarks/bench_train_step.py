"""Training-step throughput benchmark (paper config: 6 triplets x 4096 pts,
512 FPS clusters, full forward/backward/Adam).

    python benchmarks/bench_train_step.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main(pipeline_steps: int = 20, compute_dtype: str = "float32",
         steps_per_dispatch: int = 1, upload_quant: str = "none"):
    from feat3dnet_tpu.config import ModelConfig, TrainConfig
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.train.trainer import init_state, make_train_step
    from feat3dnet_tpu.utils import enable_compilation_cache

    from feat3dnet_tpu.data.datagenerator import prefetch
    from feat3dnet_tpu.train.trainer import (make_chained_train_step,
                                             make_fused_train_step)

    enable_compilation_cache()
    cfg = ModelConfig(compute_dtype=jnp.bfloat16 if compute_dtype == "bfloat16"
                      else jnp.float32)
    tcfg = TrainConfig()
    model = Feat3DNet(cfg)
    state, tx = init_state(model, tcfg, cfg, jax.random.PRNGKey(0))
    # the cli/train single-device path: one stacked upload per step
    # (device_put in the prefetch worker thread), everything else fused
    # into one executable
    step = jax.jit(make_fused_train_step(model, tx, cfg.margin, cfg.attention),
                   donate_argnums=0)

    rng = np.random.RandomState(0)

    def batch():
        a = rng.randn(tcfg.batch_size, tcfg.num_points, 3).astype(np.float32) * 8
        p = a + 0.01 * rng.randn(*a.shape).astype(np.float32)
        n = np.roll(a, 1, 0)
        return np.concatenate([a, p, n], axis=0)

    quant = upload_quant == "int16"
    if quant:
        from feat3dnet_tpu.data.quant import quantize_clouds

        def upload(x):
            q, s = quantize_clouds(x)
            return jax.device_put((q, s))
    else:
        upload = jax.device_put

    state, m = step(state, upload(batch()))
    print(f"compile done, loss {float(m['loss']):.4f}", flush=True)

    batches = [batch() for _ in range(pipeline_steps)]
    t0 = time.time()
    for b in prefetch(iter(batches), depth=2, transform=upload):
        state, m = step(state, b)
    float(m["loss"])                      # one sync at the end
    dt = time.time() - t0
    tag = " int16-upload" if quant else ""
    print(f"pipelined (prefetch-uploaded{tag}): {pipeline_steps} steps in "
          f"{dt:.2f}s -> {pipeline_steps / dt:.1f} steps/s")

    spd = steps_per_dispatch
    if spd > 1:
        # cli/train --steps_per_dispatch path: k steps scanned inside ONE
        # executable, ONE (k, 3B, N, 3) upload per dispatch — the per-dispatch
        # tunnel RTT amortizes over k steps
        chained = jax.jit(make_chained_train_step(
            model, tx, cfg.margin, cfg.attention), donate_argnums=0)

        if quant:
            def upload_chunk(x):
                q, s = quantize_clouds(x)
                return jax.device_put((q, np.full(x.shape[0], s, np.float32)))
        else:
            upload_chunk = jax.device_put

        chunks = [np.stack([batch() for _ in range(spd)])
                  for _ in range(max(1, pipeline_steps // spd))]
        state, m_k = chained(state, upload_chunk(chunks[0]))
        float(m_k["loss"][-1])            # compile + settle
        t0 = time.time()
        for c in prefetch(iter(chunks), depth=2, transform=upload_chunk):
            state, m_k = chained(state, c)
        float(m_k["loss"][-1])
        dt = time.time() - t0
        n = len(chunks) * spd
        print(f"chained x{spd}{tag} (one dispatch per {spd} steps): {n} steps "
              f"in {dt:.2f}s -> {n / dt:.1f} steps/s")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--compute_dtype", default="float32",
                    choices=("float32", "bfloat16"))
    ap.add_argument("--steps_per_dispatch", type=int, default=1)
    ap.add_argument("--upload_quant", default="none", choices=("none", "int16"))
    a = ap.parse_args()
    main(a.steps, a.compute_dtype, a.steps_per_dispatch, a.upload_quant)
