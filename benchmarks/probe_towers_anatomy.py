"""Anatomy of the training-tower floor (round-4, VERDICT item 1).

r3 measured towers-only fwd+bwd+Adam at 20.6 ms f32 (~45 % of the
lane-aware matmul ceiling) and attributed the gap to saved-activation HBM
traffic *qualitatively*. This probe decomposes it with interleaved
same-process A/Bs (the only drift-safe methodology, BENCHMARKS.md):

  fwd_f32        towers forward only (loss scalar, no grad)
  base_f32       fwd+bwd+Adam, f32 (the 20.6 ms baseline)
  resid16_f32    + residual_dtype=bf16 (bf16-stored save points, f32 matmuls)
  remat_f32      + remat_towers (save nothing, recompute segments)
  nobn_f32       use_bn=False (isolates BN moments + xhat residuals)
  skeleton_f32   raw matmul chains only (no BN/relu/bias): the lane-starved
                 matmul pass floor, fwd+bwd+Adam-free (SGD-less: grads
                 summed) — pure MXU+activation-residual cost
  base_bf16      fwd+bwd+Adam, bf16 towers
  resid16_bf16   bf16 towers + bf16 save points policy

Each variant runs K inner steps inside ONE executable (fori_loop, static
bounds) so tunnel RTT amortizes; every variant is compiled up front, then
timing rounds interleave variants. Compiled temp-HBM (memory_analysis) is
recorded per variant.

    python benchmarks/probe_towers_anatomy.py [--k 8] [--reps 5]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main(K: int = 32, reps: int = 5):
    import optax

    from feat3dnet_tpu.config import ModelConfig, TrainConfig
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.models.feat3dnet import _rotate_z
    from feat3dnet_tpu.ops import (ball_query, farthest_point_sample,
                                   gather_points, group_points)
    from feat3dnet_tpu.train.loss import alignment_triplet_loss
    from feat3dnet_tpu.train.trainer import init_state
    from feat3dnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    tcfg = TrainConfig()
    rng = np.random.RandomState(0)
    B, N, M, ns = 3 * tcfg.batch_size, tcfg.num_points, 512, 64
    clouds = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 8)
    centers = gather_points(clouds, farthest_point_sample(clouds, M))
    idx, _ = ball_query(clouds, centers, 2.0, ns)
    grouped_fix = (group_points(clouds, idx) - centers[:, :, None, :]) / 2.0
    grouped_fix = jax.device_put(grouped_fix)

    tx = optax.adam(1e-5)

    def make_tower_steps(cfg, fwd_only=False):
        model = Feat3DNet(cfg)
        state, _ = init_state(model, tcfg, cfg, jax.random.PRNGKey(0))
        params, batch_stats = state.params, state.batch_stats

        def tower_loss(p, grouped):
            variables = {"params": p, "batch_stats": batch_stats}
            (att, ori), mut = model.apply(variables, grouped, training=True,
                                          mutable=["batch_stats"],
                                          method=Feat3DNet.detect_clusters)
            g2 = _rotate_z(grouped, ori)
            feats = model.apply({"params": p,
                                 "batch_stats": mut["batch_stats"]},
                                g2, training=True, mutable=["batch_stats"],
                                method=Feat3DNet.describe_clusters)[0]
            a, pp, n = jnp.split(feats, 3, axis=0)
            a_att = jnp.split(att, 3, axis=0)[0]
            return alignment_triplet_loss(a, pp, n, a_att, cfg.margin)[0]

        opt0 = tx.init(params)

        if fwd_only:
            def steps(params, opt_state, grouped):
                def one(i, acc):
                    return acc + tower_loss(
                        params, grouped * (1.0 + 1e-6 * i))
                return jax.lax.fori_loop(0, K, one, jnp.float32(0.0))
        else:
            def steps(params, opt_state, grouped):
                def one(i, carry):
                    p, o = carry
                    loss, grads = jax.value_and_grad(tower_loss)(
                        p, grouped * (1.0 + 1e-6 * i))
                    updates, o = tx.update(grads, o, p)
                    return optax.apply_updates(p, updates), o
                p, o = jax.lax.fori_loop(0, K, one, (params, opt_state))
                return p["detection"]["conv0"]["conv2d"]["bias"]
        return steps, (params, opt0, grouped_fix)

    def make_skeleton():
        """Raw matmul chains at the tower shapes: detector 3-64-128-256 +
        pool + 128+64 heads; descriptor 3-32-64, concat 128-128, pool,
        feature_dim. No BN, no relu, no bias — the pure MXU + matmul-
        residual floor at identical operand shapes."""
        widths_det = [(3, 64), (64, 128), (128, 256)]
        widths_desc = [(3, 32), (32, 64), (128, 128)]
        r = np.random.RandomState(1)
        Ws = {"det": [jnp.asarray(r.randn(a, b).astype(np.float32) * 0.1)
                      for a, b in widths_det],
              "det_post": [jnp.asarray(r.randn(256, 128).astype(np.float32) * 0.1),
                           jnp.asarray(r.randn(128, 64).astype(np.float32) * 0.1)],
              "desc": [jnp.asarray(r.randn(a, b).astype(np.float32) * 0.1)
                       for a, b in widths_desc],
              "desc_post": [jnp.asarray(r.randn(128, 32).astype(np.float32) * 0.1)]}

        def loss(Ws, grouped):
            h = grouped
            for W in Ws["det"]:
                h = h @ W
            h = jnp.max(h, axis=2, keepdims=True)
            for W in Ws["det_post"]:
                h = h @ W
            d = grouped
            for W in Ws["desc"][:2]:
                d = d @ W
            pooled = jnp.broadcast_to(jnp.max(d, axis=2, keepdims=True),
                                      d.shape[:3] + (d.shape[-1],))
            d = jnp.concatenate([d, pooled], axis=-1) @ Ws["desc"][2]
            d = jnp.max(d, axis=2, keepdims=True) @ Ws["desc_post"][0]
            return jnp.sum(h) * 1e-6 + jnp.sum(d) * 1e-6

        def steps(Ws, _unused, grouped):
            def one(i, carry):
                g = jax.grad(loss)(carry, grouped * (1.0 + 1e-6 * i))
                return jax.tree.map(lambda w, gg: w - 1e-9 * gg, carry, g)
            out = jax.lax.fori_loop(0, K, one, Ws)
            return out["det"][0]
        return steps, (Ws, None, grouped_fix)

    def make_null():
        def steps(params, opt_state, grouped):
            # pure dispatch+readback: the per-CALL tunnel RTT that inflates
            # every (time / K) number below — subtracted in the report
            return grouped[0, 0, 0, 0]
        return steps, (None, None, grouped_fix)

    bf16 = jnp.bfloat16
    variants = {
        "null": make_null(),
        "fwd_f32": make_tower_steps(ModelConfig(), fwd_only=True),
        "base_f32": make_tower_steps(ModelConfig()),
        "resid16_f32": make_tower_steps(ModelConfig(residual_dtype=bf16)),
        "remat_f32": make_tower_steps(ModelConfig(remat_towers=True)),
        "nobn_f32": make_tower_steps(ModelConfig(use_bn=False)),
        "skeleton_f32": make_skeleton(),
        "base_bf16": make_tower_steps(ModelConfig(compute_dtype=bf16)),
        "resid16_bf16": make_tower_steps(
            ModelConfig(compute_dtype=bf16, residual_dtype=bf16)),
    }

    compiled, mem = {}, {}
    for name, (fn, args) in variants.items():
        t0 = time.time()
        c = jax.jit(fn).lower(*args).compile()
        ma = c.memory_analysis()
        mem[name] = {"temp_MiB": round(ma.temp_size_in_bytes / 2**20, 1),
                     "compile_s": round(time.time() - t0, 1)}
        compiled[name] = (c, args)
        # settle: one call + readback
        float(np.asarray(jax.tree.leaves(c(*args))[0]).ravel()[0])
        print(f"compiled {name}: {mem[name]}", flush=True)

    times = {n: [] for n in variants}
    for rep in range(reps):
        for name, (c, args) in compiled.items():
            t0 = time.time()
            out = c(*args)
            float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
            times[name].append(time.time() - t0)

    print()
    rtt = float(np.median(times["null"]))
    result = {"null_call_ms": round(rtt * 1000, 2)}
    for name in variants:
        if name == "null":
            continue
        med = (float(np.median(times[name])) - rtt) / K * 1000
        result[name] = {"ms_per_step_dev": round(med, 2), **mem[name]}
        print(f"{name:14s} {med:7.2f} ms/step (device)   "
              f"temp {mem[name]['temp_MiB']:8.1f} MiB")
    print()
    print(json.dumps(result))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    a = ap.parse_args()
    main(a.k, a.reps)
