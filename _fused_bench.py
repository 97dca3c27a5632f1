import numpy as np, time, jax, jax.numpy as jnp
from feat3dnet_tpu.utils import enable_compilation_cache
enable_compilation_cache()
import bench
from feat3dnet_tpu.config import ModelConfig
from feat3dnet_tpu.models import Feat3DNet
from feat3dnet_tpu.ops.fused_describe import folded_weights, fused_describe_clusters

cfg = ModelConfig()
model = Feat3DNet(cfg)
clusters = bench.build_cluster_batch()       # (7500, 64, 3)
keypoints = jnp.zeros((bench.BATCH, 1, 3), jnp.float32)
variables = model.init(jax.random.PRNGKey(0), clusters[:8], training=False, keypoints=keypoints[:8])

# correctness on real TPU
want = model.apply(variables, clusters[:512], training=False, keypoints=keypoints[:512])
weights = folded_weights(variables, cfg)
desc, att = fused_describe_clusters(weights, clusters[:512], cfg, tile=256)
w = np.asarray(want.features[:, 0, :]); d = np.asarray(desc)
cos = np.sum(w*d, -1)
nz = (np.linalg.norm(w, axis=1) > 0.5) & (np.linalg.norm(d, axis=1) > 0.5)
print('fused vs model on real TPU: nonzero %d/%d  cos(min over nonzero) %.6f  both-zero agree: %s  att maxerr %.2e' % (
    nz.sum(), len(nz), cos[nz].min(), bool(np.all((np.linalg.norm(w,axis=1)<0.5)==(np.linalg.norm(d,axis=1)<0.5))),
    np.abs(np.asarray(att) - np.asarray(want.attention[:, 0])).max()), flush=True)

# throughput: scan-chained like bench.py
@jax.jit
def bench_step(weights, clusters, seed):
    def body(carry, eps):
        d, a = fused_describe_clusters(weights, clusters * (1.0 + eps), cfg, tile=256)
        return carry + jnp.sum(d), None
    acc, _ = jax.lax.scan(body, jnp.float32(0), seed + 1e-6 * jnp.arange(32, dtype=jnp.float32))
    return acc

float(bench_step(weights, clusters, jnp.float32(0)))
ts = []
for r in range(4):
    t0 = time.time(); float(bench_step(weights, clusters, jnp.float32(1e-5*(r+1)))); ts.append(time.time()-t0)
per = float(np.median(ts))
print('fused serving: %.0f descriptors/s  (%.1f ms per 240k)' % (7500*32/per, per*1000))
