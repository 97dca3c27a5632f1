"""Detector-path precision vs a float64 ground truth (r5, on chip).

Four-way comparison on REAL oxford neighborhoods (FPS-512 centers,
radius-2 repeat-padded ball query):

  xla_def    the model's chunked detector at DEFAULT matmul precision
  xla_hi     same, traced under jax.default_matmul_precision("highest")
  fused_unf  fused_detect_clusters_2d(unfolded=True) — raw Dense +
             replayed flax BN at HIGHEST precision
  truth      a float64 numpy replay of the exact tower algebra

Measured r5 (BENCHMARKS.md): xla_def 2.26e-3 relmax from truth (its f32
matmuls round operands to bf16 in a single pass); xla_hi and fused_unf
both 4.77e-5 from truth and 2.38e-7 from EACH OTHER — the fused kernel
equals the most accurate XLA tower available, so the ~0.98 keypoint
overlap vs the DEFAULT path is the default's own rounding, not a kernel
defect.

    python benchmarks/probe_detector_truth.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from feat3dnet_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from feat3dnet_tpu.config import ModelConfig
from feat3dnet_tpu.models import Feat3DNet
from feat3dnet_tpu.models.feat3dnet import Feat3DNet as F
from feat3dnet_tpu.ops import ball_query, farthest_point_sample, gather_points, group_points
from feat3dnet_tpu.ops.fused_describe import (detector_weights_unfolded,
                                              fused_detect_clusters_2d)

cfg = ModelConfig(num_clusters=-1)
model = Feat3DNet(cfg)
v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 3)), training=False)
v = jax.tree.map(lambda x: x + 0.05 if x.ndim == 1 else x, v)

cloud = np.fromfile('/root/reference/example_data/oxford_270.bin',
                    np.float32).reshape(-1, 6)
xyz = jnp.asarray(cloud[None, :, :3])
ctr = gather_points(xyz, farthest_point_sample(xyz, 512))
nidx, _ = ball_query(xyz, ctr, cfg.base_scale, cfg.num_samples)
clusters = np.asarray((group_points(xyz, nidx) - ctr[:, :, None, :])[0])
normalized = jnp.asarray(clusters) / cfg.base_scale

f_def = jax.jit(lambda v, n: model.apply(v, n[None], training=False,
                                         method=F.detect_clusters))
att_def, _ = f_def(v, normalized)
with jax.default_matmul_precision("highest"):
    f_hi = jax.jit(lambda v, n: model.apply(v, n[None], training=False,
                                            method=F.detect_clusters))
    att_hi, _ = f_hi(v, normalized)
att_def, att_hi = np.asarray(att_def[0]), np.asarray(att_hi[0])

wu = detector_weights_unfolded(v, cfg)
att_f, _ = fused_detect_clusters_2d(wu, jnp.asarray(clusters), cfg,
                                    unfolded=True)
att_f = np.asarray(att_f)
# XLA-DEFAULT emulation: explicit bf16 operand casts, f32 accumulation —
# the same products the XLA default dot computes. If this is bit-equal to
# xla_def, the planes detector can replace the chunked XLA detector in
# the DEFAULT extract path without breaking any bit contract.
att_b, _ = fused_detect_clusters_2d(wu, jnp.asarray(clusters), cfg,
                                    unfolded=True, bf16_operands=True)
att_b = np.asarray(att_b)

# float64 truth: repeat-padded neighborhoods -> pool over ALL slots
p = jax.tree.map(lambda x: np.asarray(x, np.float64), v["params"]["detection"])
s = jax.tree.map(lambda x: np.asarray(x, np.float64), v["batch_stats"]["detection"])
h = clusters.astype(np.float64) / cfg.base_scale
names = [f"conv{i}" for i in range(3)]
for i, nm in enumerate(names):
    W, bb = p[nm]["conv2d"]["kernel"], p[nm]["conv2d"]["bias"]
    hv = h @ W + bb
    mu, var = s[nm]["bn"]["mean"], s[nm]["bn"]["var"]
    g_, be = p[nm]["bn"]["scale"], p[nm]["bn"]["bias"]
    h = np.maximum((hv - mu) * (g_ / np.sqrt(var + cfg.bn_epsilon)) + be, 0.0)
h = h.max(1)
for i in range(2):
    nm = f"conv_post_{i}"
    W, bb = p[nm]["conv2d"]["kernel"], p[nm]["conv2d"]["bias"]
    hv = h @ W + bb
    mu, var = s[nm]["bn"]["mean"], s[nm]["bn"]["var"]
    g_, be = p[nm]["bn"]["scale"], p[nm]["bn"]["bias"]
    h = np.maximum((hv - mu) * (g_ / np.sqrt(var + cfg.bn_epsilon)) + be, 0.0)
a = h @ p["attention"]["kernel"] + p["attention"]["bias"]
att64 = np.log1p(np.exp(-np.abs(a[:, 0]))) + np.maximum(a[:, 0], 0)

def relmax(a_, b_):
    return float(np.max(np.abs(a_ - b_) / np.maximum(np.abs(b_), 1e-6)))

print("att range: min %.4f max %.4f" % (att64.min(), att64.max()))
print("relmax vs f64 truth: xla_def %.2e  xla_hi %.2e  fused_unf %.2e"
      % (relmax(att_def, att64), relmax(att_hi, att64), relmax(att_f, att64)))
print("relmax xla_hi vs fused_unf: %.2e" % relmax(att_f, att_hi))
print("relmax xla_def vs fused_unf: %.2e" % relmax(att_f, att_def))
print("relmax xla_def vs xla_hi : %.2e" % relmax(att_def, att_hi))
print("relmax xla_def vs fused_bf16ops: %.2e  bit_equal=%s"
      % (relmax(att_b, att_def), bool(np.array_equal(att_b, att_def))))
