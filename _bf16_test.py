import numpy as np, time, jax, jax.numpy as jnp
from feat3dnet_tpu.utils import enable_compilation_cache
enable_compilation_cache()
import bench
from feat3dnet_tpu.config import ModelConfig
from feat3dnet_tpu.models import Feat3DNet
from feat3dnet_tpu.ops.fused_describe import folded_weights, fused_describe_clusters

cfg = ModelConfig()
model = Feat3DNet(cfg)
clusters = bench.build_cluster_batch()
keypoints = jnp.zeros((bench.BATCH, 1, 3), jnp.float32)
variables = model.init(jax.random.PRNGKey(0), clusters[:8], training=False, keypoints=keypoints[:8])
weights = folded_weights(variables, cfg)

d32, a32 = fused_describe_clusters(weights, clusters[:512], cfg)
d16, a16 = fused_describe_clusters(weights, clusters[:512], cfg, bf16_matmul=True)
w, d = np.asarray(d32), np.asarray(d16)
nz = (np.linalg.norm(w,axis=1) > 0.5) & (np.linalg.norm(d,axis=1) > 0.5)
cos = np.sum(w*d, -1)
print('bf16 vs f32 fused: cos min(nonzero) %.5f mean %.5f' % (cos[nz].min(), cos[nz].mean()), flush=True)

@jax.jit
def step16(weights, clusters, seed):
    def body(carry, eps):
        d, a = fused_describe_clusters(weights, clusters * (1.0 + eps), cfg, bf16_matmul=True)
        return carry + jnp.sum(d), None
    acc, _ = jax.lax.scan(body, jnp.float32(0), seed + 1e-6 * jnp.arange(32, dtype=jnp.float32))
    return acc

float(step16(weights, clusters, jnp.float32(0)))
ts=[]
for r in range(4):
    t0=time.time(); float(step16(weights, clusters, jnp.float32(1e-5*(r+1)))); ts.append(time.time()-t0)
per = float(np.median(ts))
print('bf16 fused serving: %.0f descriptors/s' % (7500*32/per))
