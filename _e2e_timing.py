import numpy as np, time, jax, jax.numpy as jnp
from feat3dnet_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from feat3dnet_tpu.config import InferenceConfig, ModelConfig
from feat3dnet_tpu.inference import InferencePipeline
from feat3dnet_tpu.models import Feat3DNet
from feat3dnet_tpu.data.io import load_point_cloud

cfg = ModelConfig(num_clusters=-1)
icfg = InferenceConfig()
cloud = load_point_cloud('/root/reference/example_data/oxford_270.bin', num_cols=6)
kitti = load_point_cloud('/root/reference/example_data/kitti_00_001554.bin', num_cols=6)
model = Feat3DNet(cfg)
v = model.init(jax.random.PRNGKey(0), jnp.asarray(cloud[None, :512, :3]), training=False)
pipe = InferencePipeline(model, v, cfg, icfg)
t=time.time(); res = pipe.extract(cloud); print('oxford first (compile) %.1fs'%(time.time()-t), flush=True)
ts=[]
for i in range(5):
    t=time.time(); res = pipe.extract(cloud * (1.0+1e-4*i)); ts.append(time.time()-t)
print('oxford 16384pts warm median %.3fs  keypoints %d'%(np.median(ts), res.num_keypoints))
t=time.time(); res = pipe.extract(kitti); print('kitti first (compile) %.1fs'%(time.time()-t), flush=True)
ts=[]
for i in range(5):
    t=time.time(); res = pipe.extract(kitti * (1.0+1e-4*i)); ts.append(time.time()-t)
print('kitti %dpts warm median %.3fs  keypoints %d'%(kitti.shape[0], np.median(ts), res.num_keypoints))
