import numpy as np, time, jax, jax.numpy as jnp
from feat3dnet_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from feat3dnet_tpu.config import InferenceConfig, ModelConfig
from feat3dnet_tpu.inference import InferencePipeline
from feat3dnet_tpu.models import Feat3DNet

cfg = ModelConfig(num_clusters=-1)
icfg = InferenceConfig()
rng = np.random.RandomState(0)
# synthetic dense submap ~120k points over a 100m x 100m x 10m region
cloud = np.concatenate([
    rng.rand(120000, 3).astype(np.float32) * np.array([100, 100, 10], np.float32),
    np.zeros((120000, 3), np.float32)], axis=1)
model = Feat3DNet(cfg)
v = model.init(jax.random.PRNGKey(0), jnp.asarray(cloud[None, :512, :3]), training=False)
pipe = InferencePipeline(model, v, cfg, icfg)
t=time.time(); res = pipe.extract(cloud); print('120k-pt first (compile) %.1fs'%(time.time()-t), flush=True)
ts=[]
for i in range(3):
    t=time.time(); res = pipe.extract(cloud * (1.0+1e-5*(i+1))); ts.append(time.time()-t)
print('120k-pt submap warm median %.2fs  keypoints %d'%(np.median(ts), res.num_keypoints))
