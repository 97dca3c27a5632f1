import numpy as np, time, jax, jax.numpy as jnp
from feat3dnet_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from feat3dnet_tpu.config import ModelConfig, TrainConfig
from feat3dnet_tpu.models import Feat3DNet
from feat3dnet_tpu.train.trainer import init_state, make_train_step

cfg = ModelConfig(); tcfg = TrainConfig()
model = Feat3DNet(cfg)
state, tx = init_state(model, tcfg, cfg, jax.random.PRNGKey(0))
step = jax.jit(make_train_step(model, tx, cfg.margin, cfg.attention), donate_argnums=0)

rng = np.random.RandomState(0)
def batch():
    a = rng.randn(6, 4096, 3).astype(np.float32) * 8
    return tuple(jnp.asarray(x) for x in (a, a + 0.01*rng.randn(6,4096,3).astype(np.float32), np.roll(a, 1, 0)))

state, m = step(state, *batch()); print('loss', float(m['loss']), flush=True)  # compile+sync
K = 20
bs = [batch() for _ in range(K)]
t0 = time.time()
for b in bs:
    state, m = step(state, *b)
l = float(m['loss'])          # one sync at the end
dt = time.time() - t0
print('pipelined training: %d steps in %.2fs -> %.1f steps/s (loss readback every %d)' % (K, dt, K/dt, K))
