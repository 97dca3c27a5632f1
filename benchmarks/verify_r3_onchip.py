"""Round-3 on-chip A/B: serving lane packing + fused training grouping.

Run on the real TPU:  python benchmarks/verify_r3_onchip.py
Prints one JSON dict at the end; each phase is independent (failures are
recorded, not fatal).
"""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from feat3dnet_tpu.utils import enable_compilation_cache

enable_compilation_cache()

RESULTS = {}


def run_phase(name, fn):
    t0 = time.time()
    try:
        RESULTS[name] = fn()
    except Exception as e:
        traceback.print_exc()
        RESULTS[name] = {"error": repr(e)}
    print(f"[{name}] {time.time() - t0:.1f}s: {RESULTS[name]}", flush=True)


def phase_serving():
    import bench
    from feat3dnet_tpu.config import ModelConfig
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.ops.fused_describe import (folded_weights,
                                                  fused_describe_clusters)

    cfg = ModelConfig()
    model = Feat3DNet(cfg)
    clusters = bench.build_cluster_batch()
    variables = model.init(jax.random.PRNGKey(0), clusters[:8],
                           training=False,
                           keypoints=jnp.zeros((8, 1, 3), jnp.float32))
    weights = folded_weights(variables, cfg)
    out = {}

    # exactness: packed vs unpacked on the 2048 distinct real clusters
    d0, a0 = fused_describe_clusters(weights, clusters[:2048], cfg,
                                     lane_pack=False)
    d1, a1 = fused_describe_clusters(weights, clusters[:2048], cfg,
                                     lane_pack=True)
    d0, a0, d1, a1 = map(np.asarray, (d0, a0, d1, a1))
    out["desc_maxdiff"] = float(np.abs(d1 - d0).max())
    out["att_maxdiff"] = float(np.abs(a1 - a0).max())
    cos = (d0 * d1).sum(-1) / np.maximum(
        np.linalg.norm(d0, axis=-1) * np.linalg.norm(d1, axis=-1), 1e-12)
    out["desc_min_cos"] = float(cos.min())

    # throughput sweep
    BATCH, STEPS = bench.BATCH, bench.SCAN_STEPS
    big = jnp.asarray(np.tile(np.asarray(clusters), (4, 1, 1))[:BATCH])

    def make_bench(**kw):
        @jax.jit
        def bench_step(weights, cl, seed):
            def body(carry, eps):
                d, _ = fused_describe_clusters(weights, cl * (1.0 + eps),
                                               cfg, **kw)
                return carry + jnp.sum(d), None
            acc, _ = jax.lax.scan(
                body, jnp.float32(0),
                seed + 1e-6 * jnp.arange(STEPS, dtype=jnp.float32))
            return acc
        return bench_step

    for label, kw in [
        ("lp0_t64", dict(tile=64, lane_pack=False)),
        ("lp1_t64", dict(tile=64, lane_pack=True)),
        ("lp1_t64_bf16act", dict(tile=64, lane_pack=True, bf16_act=True)),
        ("lp1_t128", dict(tile=128, lane_pack=True)),
    ]:
        f = make_bench(**kw)
        float(f(weights, big, jnp.float32(0.0)))   # compile
        ts = []
        for r in range(4):
            t0 = time.time()
            float(f(weights, big, jnp.float32(1e-5 * (r + 1))))
            ts.append(time.time() - t0)
        dps = BATCH * STEPS / float(np.median(ts))
        out[label + "_desc_per_s"] = round(dps, 0)
        print(f"  {label}: {dps:,.0f} desc/s", flush=True)
    return out


def phase_batch_group():
    from feat3dnet_tpu.data.io import example_cloud_path, load_point_cloud
    from feat3dnet_tpu.ops import ball_query, farthest_point_sample, gather_points
    from feat3dnet_tpu.ops.batch_group import ball_query_fused

    out = {}
    # parity on real cloud geometry at training shapes
    cloud = load_point_cloud(example_cloud_path("oxford_270.bin"), num_cols=6)
    rng = np.random.RandomState(0)
    sel = rng.choice(cloud.shape[0], (4, 4096), replace=True)
    xyz = jnp.asarray(cloud[sel][..., :3].astype(np.float32))
    fps = farthest_point_sample(xyz, 512)
    ctr = gather_points(xyz, fps)
    idx_d, cnt_d = ball_query(xyz, ctr, 2.0, 64)
    idx_f, cnt_f = ball_query_fused(xyz, ctr, 2.0, 64)
    out["cnt_equal"] = bool(np.array_equal(np.asarray(cnt_d), np.asarray(cnt_f)))
    out["idx_equal"] = bool(np.array_equal(np.asarray(idx_d), np.asarray(idx_f)))
    out["saturated_frac"] = float((np.asarray(cnt_d) == 64).mean())
    return out


def phase_train_step():
    from feat3dnet_tpu.config import ModelConfig, TrainConfig
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.train.trainer import init_state, make_fused_train_step
    import feat3dnet_tpu.ops.batch_group as bg

    out = {}
    cfg = ModelConfig()
    tcfg = TrainConfig()
    model = Feat3DNet(cfg)
    state, tx = init_state(model, tcfg, cfg, jax.random.PRNGKey(0))
    step = make_fused_train_step(model, tx, cfg.margin, cfg.attention)

    rng = np.random.RandomState(0)
    a = rng.randn(tcfg.batch_size, tcfg.num_points, 3).astype(np.float32) * 8
    clouds = jnp.asarray(np.concatenate(
        [a, a + 0.01 * rng.randn(*a.shape).astype(np.float32),
         np.roll(a, 1, 0)], axis=0))

    K = 20

    def chain(state, clouds):
        return jax.lax.fori_loop(
            0, K, lambda i, s: step(s, clouds)[0], state)

    orig = bg.use_fused_ball_query
    for label, enabled in [("fused_group", True), ("dense_group", False)]:
        bg._FUSED_BQ_ENABLED = enabled   # past the opt-in env gate
        bg.use_fused_ball_query = orig if enabled else (lambda *a: False)
        f = jax.jit(chain)
        s1 = f(state, clouds)
        float(jnp.sum(s1.params["detection"]["conv0"]["conv2d"]["bias"]))
        ts = []
        for _ in range(3):
            t0 = time.time()
            s1 = f(state, clouds)
            float(jnp.sum(s1.params["detection"]["conv0"]["conv2d"]["bias"]))
            ts.append(time.time() - t0)
        ms = float(np.median(ts)) / K * 1000
        out[label + "_ms_per_step"] = round(ms, 2)
        print(f"  {label}: {ms:.2f} ms/step device "
              f"({1000/ms:.1f} steps/s)", flush=True)
    bg.use_fused_ball_query = orig
    return out


if __name__ == "__main__":
    run_phase("serving", phase_serving)
    run_phase("batch_group", phase_batch_group)
    run_phase("train_step", phase_train_step)
    print("FINAL " + json.dumps(RESULTS), flush=True)
