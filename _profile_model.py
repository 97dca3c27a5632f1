import numpy as np, time, jax, jax.numpy as jnp
from feat3dnet_tpu.utils import enable_compilation_cache
enable_compilation_cache()
import bench
from feat3dnet_tpu.config import ModelConfig
from feat3dnet_tpu.models import Feat3DNet
from feat3dnet_tpu.models.feat3dnet import _group_normalized, Detector, Descriptor

cfg = ModelConfig()
model = Feat3DNet(cfg)
clusters = bench.build_cluster_batch()
keypoints = jnp.zeros((bench.BATCH,1,3), jnp.float32)
variables = model.init(jax.random.PRNGKey(0), clusters[:8], training=False, keypoints=keypoints[:8])
det_vars = {'params': variables['params']['detection'], 'batch_stats': variables['batch_stats']['detection']}
desc_vars = {'params': variables['params']['description'], 'batch_stats': variables['batch_stats']['description']}

def timeit(name, fn, *args):
    out = fn(*args); float(jax.tree.leaves(out)[0].sum())
    ts = []
    for i in range(4):
        t=time.time(); out = fn(*args); s = float(jax.tree.leaves(out)[0].sum()); ts.append(time.time()-t)
    print(name, 'median %.1f ms'%(1000*np.median(ts)), flush=True)

@jax.jit
def group_only(c, kp):
    g, idx, cnt = _group_normalized(c, kp, 2.0, 64, None)
    return g

@jax.jit
def detector_only(c, kp):
    g, _, _ = _group_normalized(c, kp, 2.0, 64, None)
    return Detector(cfg).apply(det_vars, g, False)[0]

@jax.jit
def descriptor_only(c, kp):
    g, _, _ = _group_normalized(c, kp, 2.0, 64, None)
    return Descriptor(cfg).apply(desc_vars, g, False)

@jax.jit
def full(c, kp):
    return model.apply(variables, c, training=False, keypoints=kp).features

timeit('group_only', group_only, clusters, keypoints)
timeit('detector_only', detector_only, clusters, keypoints)
timeit('descriptor_only', descriptor_only, clusters, keypoints)
timeit('full', full, clusters, keypoints)
