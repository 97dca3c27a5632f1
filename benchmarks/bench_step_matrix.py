"""Device train-step time matrix: {f32, bf16 towers} x {fused, dense
grouping} x {remat}, chained executables (tunnel-RTT-free).

    python benchmarks/bench_step_matrix.py [--remat-only]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from feat3dnet_tpu.config import ModelConfig, TrainConfig
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.train.trainer import init_state, make_fused_train_step
    import feat3dnet_tpu.ops.batch_group as bg
    from feat3dnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    tcfg = TrainConfig()
    rng = np.random.RandomState(0)
    a = rng.randn(tcfg.batch_size, tcfg.num_points, 3).astype(np.float32) * 8
    clouds = jnp.asarray(np.concatenate(
        [a, a + 0.01 * rng.randn(*a.shape).astype(np.float32),
         np.roll(a, 1, 0)], axis=0))
    K = 16
    orig = bg.use_fused_ball_query

    remat_only = "--remat-only" in sys.argv
    # (label, fused_bq, trainer_full_remat, model_remat_towers, resid16,
    #  fused_towers)
    variants = ([("dense", False, False, False, False, False),
                 ("dense+remat", False, True, False, False, False),
                 ("dense+rtowers", False, False, True, False, False),
                 ("dense+resid16", False, False, False, True, False)]
                if remat_only else
                [("fused", True, False, False, False, False),
                 ("dense", False, False, False, False, False),
                 ("dense+remat", False, True, False, False, False),
                 ("dense+rtowers", False, False, True, False, False),
                 ("dense+resid16", False, False, False, True, False),
                 ("dense+ftowers", False, False, False, False, True),
                 ("fused+ftowers", True, False, False, False, True)])

    # per-CALL tunnel RTT baseline, subtracted from every chained timing
    # (at K=16 the raw numbers would carry ~2 ms/step of dispatch)
    @jax.jit
    def null_call(x):
        return x[0, 0, 0]
    float(null_call(clouds))
    rtts = []
    for _ in range(5):
        t0 = time.time()
        float(null_call(clouds * 1.0000001))
        rtts.append(time.time() - t0)
    rtt = float(np.median(rtts))
    print(f"null-call RTT: {rtt*1000:.1f} ms (subtracted)", flush=True)

    for dtype_name, dtype in (("float32", jnp.float32),
                              ("bfloat16", jnp.bfloat16)):
        cfg = ModelConfig(compute_dtype=dtype)
        model = Feat3DNet(cfg)
        state, tx = init_state(model, tcfg, cfg, jax.random.PRNGKey(0))

        for label, enabled, remat, rtowers, resid16, ftowers in variants:
            if ftowers and dtype is not jnp.float32:
                continue   # the fused tower kernels are f32-training-only
            mcfg = ModelConfig(compute_dtype=dtype, remat_towers=rtowers,
                               residual_dtype=jnp.bfloat16 if resid16 else None,
                               fused_towers=ftowers)
            step = make_fused_train_step(Feat3DNet(mcfg), tx, cfg.margin,
                                         cfg.attention, remat=remat)
            # force the kernel past its opt-in env gate for the A/B (the
            # shape checks still apply); plain `orig` would measure dense
            bg._FUSED_BQ_ENABLED = enabled
            bg.use_fused_ball_query = orig if enabled else (lambda *a_: False)

            @jax.jit
            def chain(state, clouds):
                return jax.lax.fori_loop(
                    0, K, lambda i, s: step(s, clouds)[0], state)

            s1 = chain(state, clouds)
            float(jnp.sum(s1.params["detection"]["conv0"]["conv2d"]["bias"]))
            ts = []
            for _ in range(3):
                t0 = time.time()
                s1 = chain(state, clouds)
                float(jnp.sum(
                    s1.params["detection"]["conv0"]["conv2d"]["bias"]))
                ts.append(time.time() - t0)
            ms = (float(np.median(ts)) - rtt) / K * 1000
            print(f"{dtype_name:9s} {label:12s}: {ms:6.2f} ms/step device "
                  f"({1000/ms:5.1f} steps/s)", flush=True)
    bg.use_fused_ball_query = orig


if __name__ == "__main__":
    main()
