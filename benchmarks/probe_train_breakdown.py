"""Where do the train step's device milliseconds go? (round-3 probe)

The r2 VERDICT attributed 12.7 of the 21 ms step to the dense ball query,
but replacing it with the fused VMEM kernel left the step at ~23 ms — so
measure the pieces standalone, chained inside single executables so the
tunnel RTT amortizes out:

  * grouping alone (dense counting vs fused kernel), fwd only
  * FPS alone
  * full fwd+bwd+Adam step (reference composition)
  * towers-only step: same loss/backward on PRECOMPUTED fixed groupings
    (isolates the MLP/pool/backward cost from grouping+FPS)

    python benchmarks/probe_train_breakdown.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=3):
    out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    from feat3dnet_tpu.config import ModelConfig, TrainConfig
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.models.feat3dnet import _rotate_z
    from feat3dnet_tpu.ops import ball_query, farthest_point_sample, gather_points, group_points
    from feat3dnet_tpu.ops.batch_group import ball_query_fused
    from feat3dnet_tpu.train.loss import alignment_triplet_loss
    from feat3dnet_tpu.train.trainer import init_state, make_fused_train_step
    from feat3dnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = ModelConfig()
    tcfg = TrainConfig()
    model = Feat3DNet(cfg)
    rng = np.random.RandomState(0)
    B, N, M, ns = 3 * tcfg.batch_size, tcfg.num_points, cfg.num_clusters, cfg.num_samples
    clouds = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 8)
    K = 16

    def chain(fn):
        @jax.jit
        def run(clouds):
            def body(carry, eps):
                out = fn(clouds * (1.0 + eps))
                return carry + jnp.sum(out[0].astype(jnp.float32)), None
            acc, _ = jax.lax.scan(
                body, jnp.float32(0),
                1e-6 * jnp.arange(K, dtype=jnp.float32))
            return acc
        return run

    centers = gather_points(clouds, farthest_point_sample(clouds, M))

    fps_t = timeit(chain(lambda c: (farthest_point_sample(c, M),)), clouds)
    print(f"FPS alone:            {fps_t/K*1000:7.2f} ms", flush=True)

    dense_t = timeit(chain(lambda c: ball_query(c, centers, 2.0, ns)), clouds)
    print(f"dense ball_query:     {dense_t/K*1000:7.2f} ms", flush=True)

    fused_t = timeit(chain(lambda c: ball_query_fused(c, centers, 2.0, ns)), clouds)
    print(f"fused ball_query:     {fused_t/K*1000:7.2f} ms", flush=True)

    gather_t = timeit(chain(
        lambda c: (group_points(c, ball_query(c, centers, 2.0, ns)[0]),)), clouds)
    print(f"dense bq + gather:    {gather_t/K*1000:7.2f} ms", flush=True)

    # full fused train step, chained
    state, tx = init_state(model, tcfg, cfg, jax.random.PRNGKey(0))
    step = make_fused_train_step(model, tx, cfg.margin, cfg.attention)

    @jax.jit
    def steps(state, clouds):
        return jax.lax.fori_loop(0, K, lambda i, s: step(s, clouds)[0], state)

    t = timeit(lambda s, c: (steps(s, c).params["detection"]["conv0"]["conv2d"]["bias"],),
               state, clouds)
    print(f"full train step:      {t/K*1000:7.2f} ms", flush=True)

    # towers-only: fwd+bwd+Adam on PRECOMPUTED groupings (no FPS/ball query)
    import optax

    idx, cnt = ball_query(clouds, centers, 2.0, ns)
    grouped_fix = (group_points(clouds, idx) - centers[:, :, None, :]) / 2.0

    def tower_loss(params, batch_stats, grouped):
        variables = {"params": params, "batch_stats": batch_stats}
        (att, ori), mut = model.apply(variables, grouped, training=True,
                                      mutable=["batch_stats"],
                                      method=Feat3DNet.detect_clusters)
        g2 = _rotate_z(grouped, ori)
        feats = model.apply({"params": params,
                             "batch_stats": mut["batch_stats"]},
                            g2, training=True, mutable=["batch_stats"],
                            method=Feat3DNet.describe_clusters)[0]
        a, p, n = jnp.split(feats, 3, axis=0)
        a_att = jnp.split(att, 3, axis=0)[0]
        loss, _ = alignment_triplet_loss(a, p, n, a_att, cfg.margin)
        return loss

    opt_state = tx.init(state.params)

    @jax.jit
    def tower_steps(params, opt_state, grouped):
        def one(i, carry):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(tower_loss)(
                params, state.batch_stats, grouped * (1.0 + 1e-6 * i))
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state
        params, opt_state = jax.lax.fori_loop(0, K, one, (params, opt_state))
        return params

    t = timeit(lambda p, o, g: (
        tower_steps(p, o, g)["detection"]["conv0"]["conv2d"]["bias"],),
        state.params, opt_state, grouped_fix)
    print(f"towers-only step:     {t/K*1000:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
