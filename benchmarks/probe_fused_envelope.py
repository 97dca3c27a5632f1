"""On-chip numerics envelope for the fused training towers.

    python benchmarks/probe_fused_envelope.py

The r5 on-chip gate found the fused-towers step at update-cosine 0.893 vs
the XLA f32 step (interpret mode agrees to ~1e-6 — this is chip-only
matmul rounding). This probe situates that number inside the family of
ACCEPTED training variants by computing, in ONE process on the real TPU,
each variant's update cosine / loss / batch_stats gap against the XLA f32
baseline:

  xla_f32        the default step (baseline)
  xla_highest    same, traced under jax.default_matmul_precision("highest")
                 — XLA's DEFAULT f32 matmul on TPU is a truncated-bf16-pass
                 product, so this measures how far the BASELINE itself sits
                 from true-f32 math
  xla_rtowers    remat_towers=True (claimed bit-exact — chip check)
  xla_resid16    residual_dtype=bfloat16 (shipped, accepted variant)
  xla_bf16       compute_dtype=bfloat16 (the measured speed frontier)
  fused_cot16    fused_towers=True (bf16 cotangent stream — the default)
  fused_cot32    fused_towers=True, fused_cot_dtype=float32
  fused_hi_cot32 fused + f32 cotangents vs the xla_highest baseline
                 (if the fused kernels' Mosaic matmuls are full-f32, this
                 pairing isolates the bf16-cotangent + reduction-order gap)

If xla_bf16 / xla_resid16 sit at comparable cosines, 0.893 is in-family
rounding; if fused_cot32-vs-highest sits near 1, the kernels are MORE
exact than the XLA DEFAULT baseline and the gate should compare against
the highest-precision reference instead.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from feat3dnet_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def main():
    from feat3dnet_tpu.config import ModelConfig, TrainConfig
    from feat3dnet_tpu.data.io import example_cloud_path, load_point_cloud
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.train.trainer import init_state, make_fused_train_step

    cloud = load_point_cloud(example_cloud_path("oxford_270.bin"), num_cols=6)

    def crop(seed):
        r = np.random.RandomState(seed)
        idx = r.choice(cloud.shape[0], 4096, replace=False)
        return cloud[idx, :3]

    b = 2
    rng = np.random.RandomState(0)
    anchors = np.stack([crop(i) for i in range(b)])
    positives = anchors + 0.02 * rng.randn(*anchors.shape).astype(np.float32)
    negatives = np.stack([crop(100 + i) for i in range(b)])
    clouds = jnp.asarray(np.concatenate([anchors, positives, negatives], 0))

    cfg0 = ModelConfig()
    tcfg = TrainConfig(batch_size=b, num_points=4096)
    state, tx = init_state(Feat3DNet(cfg0), tcfg, cfg0, jax.random.PRNGKey(0))

    def run(cfg, highest=False):
        step = jax.jit(make_fused_train_step(
            Feat3DNet(cfg), tx, cfg.margin, cfg.attention))
        if highest:
            with jax.default_matmul_precision("highest"):
                s, met = step(state, clouds)
        else:
            s, met = step(state, clouds)
        upd = np.concatenate([
            np.asarray(x - y).ravel()
            for x, y in zip(jax.tree.leaves(s.params),
                            jax.tree.leaves(state.params))])
        bs = np.concatenate([np.asarray(x).ravel()
                             for x in jax.tree.leaves(s.batch_stats)])
        return float(met["loss"]), upd, bs

    def cos(u, v):
        return float((u * v).sum()
                     / max(np.linalg.norm(u) * np.linalg.norm(v), 1e-12))

    variants = [
        ("xla_f32", ModelConfig(), {}),
        ("xla_highest", ModelConfig(), {"highest": True}),
        ("xla_rtowers", ModelConfig(remat_towers=True), {}),
        ("xla_resid16", ModelConfig(residual_dtype=jnp.bfloat16), {}),
        ("xla_bf16", ModelConfig(compute_dtype=jnp.bfloat16), {}),
        ("fused_cot16", ModelConfig(fused_towers=True), {}),
        ("fused_cot32", ModelConfig(fused_towers=True,
                                    fused_cot_dtype=jnp.float32), {}),
    ]
    out = {}
    for name, cfg, kw in variants:
        loss, upd, bs = run(cfg, **kw)
        out[name] = (loss, upd, bs)
        print(f"[{name}] loss={loss:.8f}", flush=True)

    base = "xla_f32"
    l0, u0, b0 = out[base]
    print(f"\nvs {base}:")
    for name, (loss, upd, bs) in out.items():
        print(f"  {name:14s} loss_rel={abs(loss-l0)/max(abs(l0),1e-9):.2e} "
              f"upd_cos={cos(u0, upd):.6f} "
              f"bs_maxdiff={np.abs(bs-b0).max():.2e}", flush=True)
    lh, uh, bh = out["xla_highest"]
    print("\nvs xla_highest:")
    for name in ("xla_f32", "fused_cot16", "fused_cot32"):
        loss, upd, bs = out[name]
        print(f"  {name:14s} loss_rel={abs(loss-lh)/max(abs(lh),1e-9):.2e} "
              f"upd_cos={cos(uh, upd):.6f} "
              f"bs_maxdiff={np.abs(bs-bh).max():.2e}", flush=True)


if __name__ == "__main__":
    main()
