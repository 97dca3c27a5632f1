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


def main(pipeline_steps: int = 20):
    from feat3dnet_tpu.config import ModelConfig, TrainConfig
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.train.trainer import init_state, make_train_step
    from feat3dnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg, tcfg = ModelConfig(), TrainConfig()
    model = Feat3DNet(cfg)
    state, tx = init_state(model, tcfg, cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, tx, cfg.margin, cfg.attention),
                   donate_argnums=0)

    rng = np.random.RandomState(0)

    def batch():
        a = rng.randn(tcfg.batch_size, tcfg.num_points, 3).astype(np.float32) * 8
        p = a + 0.01 * rng.randn(*a.shape).astype(np.float32)
        n = np.roll(a, 1, 0)
        return tuple(jnp.asarray(x) for x in (a, p, n))

    state, m = step(state, *batch())
    print(f"compile done, loss {float(m['loss']):.4f}", flush=True)

    batches = [batch() for _ in range(pipeline_steps)]
    t0 = time.time()
    for b in batches:
        state, m = step(state, *b)
    float(m["loss"])                      # one sync at the end
    dt = time.time() - t0
    print(f"pipelined: {pipeline_steps} steps in {dt:.2f}s -> "
          f"{pipeline_steps / dt:.1f} steps/s")


if __name__ == "__main__":
    main()
