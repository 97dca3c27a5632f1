"""extract_many throughput at submap scale: serial extract() loop vs the
pipelined path, per prep_workers setting.

    python benchmarks/bench_extract_many.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from feat3dnet_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from feat3dnet_tpu.config import InferenceConfig, ModelConfig
from feat3dnet_tpu.inference import InferencePipeline
from feat3dnet_tpu.models import Feat3DNet

rng = np.random.RandomState(0)
clouds = [np.concatenate([
    rng.rand(120000, 3).astype(np.float32) * np.array([100, 100, 10], np.float32),
    np.zeros((120000, 3), np.float32)], axis=1) for _ in range(8)]

cfg = ModelConfig(num_clusters=-1)
model = Feat3DNet(cfg)
v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 3)), training=False)
pipe = InferencePipeline(model, v, cfg, InferenceConfig())

pipe.extract(clouds[0])  # compile
t0 = time.time()
for c in clouds:
    pipe.extract(c)
serial = time.time() - t0
print(f"serial: {len(clouds)/serial:.2f} clouds/s ({serial:.2f}s)", flush=True)

for workers in (1, 4):
    t0 = time.time()
    res = pipe.extract_many(clouds, depth=2, prep_workers=workers)
    dt = time.time() - t0
    print(f"extract_many workers={workers}: {len(clouds)/dt:.2f} clouds/s ({dt:.2f}s)", flush=True)
