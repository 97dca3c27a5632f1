"""Component-level timing of the training step (paper config).

Times each piece of the step with a 16-iteration lax.scan inside one jit —
the carry is perturbed by a tiny function-dependent scalar each iteration
so XLA cannot hoist the op out of the loop — which amortizes the ~40 ms
remote-tunnel RTT to ~2.5 ms/piece.

    python benchmarks/profile_train.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def scan_time(fn, args, k=16, repeats=5):
    """Median seconds per call of fn(*args), amortized over a k-step scan."""
    from feat3dnet_tpu.utils.profiling import timed_device_call

    @jax.jit
    def run(args):
        def body(carry, _):
            out = fn(*carry)
            s = jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)) * 1e-20
            return (carry[0] + s,) + carry[1:], ()
        carry, _ = jax.lax.scan(body, args, None, length=k)
        return carry[0]

    return timed_device_call(run, args, repeats=repeats) / k


def main():
    from feat3dnet_tpu.config import ModelConfig, TrainConfig
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.models.feat3dnet import Feat3DNet as F, _group_normalized
    from feat3dnet_tpu.ops import ball_query, farthest_point_sample, group_points
    from feat3dnet_tpu.train.trainer import init_state, make_train_step
    from feat3dnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg, tcfg = ModelConfig(), TrainConfig()
    model = Feat3DNet(cfg)
    state, tx = init_state(model, tcfg, cfg, jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    rng = np.random.RandomState(0)
    b = tcfg.batch_size
    a = rng.randn(b, tcfg.num_points, 3).astype(np.float32) * 8
    p = a + 0.01 * rng.randn(*a.shape).astype(np.float32)
    n = np.roll(a, 1, 0)
    clouds = jnp.asarray(np.concatenate([a, p, n], 0))        # (3B, N, 3)
    xyz = clouds

    M, ns, r = cfg.num_clusters, cfg.num_samples, cfg.base_scale
    fps_idx = jax.jit(lambda x: farthest_point_sample(x, M))(xyz)
    centers = jnp.take_along_axis(xyz, np.asarray(fps_idx)[..., None], axis=1)
    grouped, _, _ = jax.jit(
        lambda x, c: _group_normalized(x, c, r, ns, None))(xyz, centers)

    rows = []

    def piece(name, fn, args):
        t = scan_time(fn, args)
        rows.append((name, t * 1e3))
        print(f"{name:42s} {t * 1e3:7.2f} ms", flush=True)

    piece("fps (3B x N -> M)", lambda x: farthest_point_sample(x, M), (xyz,))
    piece("ball_query (M x N)", lambda x, c: ball_query(x, c, r, ns)[0],
          (xyz, centers))
    piece("group_normalized (bq + gather + norm)",
          lambda x, c: _group_normalized(x, c, r, ns, None)[0], (xyz, centers))

    def towers_fwd(g):
        att, ori = model.apply(variables, g, training=False,
                               method=F.detect_clusters)
        feat = model.apply(variables, g, training=False,
                           method=F.describe_clusters)
        return feat

    piece("towers fwd (det + desc, eval BN)", towers_fwd, (grouped,))

    def fwd_loss(c):
        from feat3dnet_tpu.train.loss import alignment_triplet_loss
        out, _ = model.apply(variables, c, training=True, mutable=["batch_stats"])
        af, pf, nf = jnp.split(out.features, 3, axis=0)
        aa = jnp.split(out.attention, 3, axis=0)[0]
        loss, _ = alignment_triplet_loss(af, pf, nf, aa, cfg.margin)
        return loss

    piece("full forward + loss (train BN)", fwd_loss, (clouds,))

    step = make_train_step(model, tx, cfg.margin, cfg.attention)

    def full_step(c):
        st, m = step(state, c[:b], c[b:2 * b], c[2 * b:])
        return m["loss"]

    piece("full step (fwd + bwd + adam)", full_step, (clouds,))

    print()
    for name, ms in rows:
        print(f"{name:42s} {ms:7.2f} ms")


if __name__ == "__main__":
    main()
