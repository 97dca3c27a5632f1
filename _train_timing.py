import numpy as np, time, jax, jax.numpy as jnp
from feat3dnet_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from feat3dnet_tpu.config import ModelConfig, TrainConfig
from feat3dnet_tpu.models import Feat3DNet
from feat3dnet_tpu.train.trainer import init_state, make_train_step

cfg = ModelConfig()           # paper config: 512 clusters, 64 samples, 32-D
tcfg = TrainConfig()          # batch 6, 4096 points
model = Feat3DNet(cfg)
state, tx = init_state(model, tcfg, cfg, jax.random.PRNGKey(0))
step = jax.jit(make_train_step(model, tx, cfg.margin, cfg.attention), donate_argnums=0)

rng = np.random.RandomState(0)
def batch(i):
    a = rng.randn(6, 4096, 3).astype(np.float32) * 8
    return tuple(jnp.asarray(x) for x in (a, a + 0.01*rng.randn(6,4096,3).astype(np.float32), np.roll(a, 1, 0)))

t=time.time(); state, m = step(state, *batch(0)); l=float(m['loss']); print('compile %.1fs loss %.4f'%(time.time()-t, l), flush=True)
ts=[]
for i in range(6):
    b = batch(i)
    t=time.time(); state, m = step(state, *b); l=float(m['loss']); ts.append(time.time()-t)
print('train step (paper config, b=6x4096, device step + loss readback): median %.3fs -> %.1f steps/s'%(np.median(ts), 1/np.median(ts)))
