import numpy as np, time, jax, jax.numpy as jnp
from feat3dnet_tpu.utils import enable_compilation_cache
enable_compilation_cache()
import bench
from feat3dnet_tpu.ops.neighborhoods import pairwise_sqdist, group_points

clusters = bench.build_cluster_batch()          # (7500, 64, 3)
keypoints = jnp.zeros((bench.BATCH,1,3), jnp.float32)

def timeit(name, fn, *args):
    out = fn(*args); float(jax.tree.leaves(out)[0].sum())
    ts = []
    for i in range(6):
        t=time.time(); out = fn(*args); s = float(jax.tree.leaves(out)[0].sum()); ts.append(time.time()-t)
    print(name, 'median %.1f ms'%(1000*np.median(ts)), flush=True)

@jax.jit
def baseline(c, kp):
    return jnp.sum(c) + jnp.sum(kp)

@jax.jit
def stage_a(c, kp):   # d2 + mask + cumsum + cnt
    d2 = pairwise_sqdist(kp, c)                 # (B, 1, 64)
    in_ball = d2 < 4.0
    count = jnp.cumsum(in_ball.astype(jnp.int32), axis=-1)
    return jnp.minimum(count[..., -1], 64)

@jax.jit
def stage_b(c, kp):   # + binary search
    d2 = pairwise_sqdist(kp, c)
    in_ball = d2 < 4.0
    count = jnp.cumsum(in_ball.astype(jnp.int32), axis=-1)
    n = 64
    targets = jnp.arange(1, 65, dtype=jnp.int32)
    shape = count.shape[:-1] + (64,)
    lo = jnp.zeros(shape, jnp.int32); hi = jnp.full(shape, n, jnp.int32)
    for _ in range(n.bit_length()):
        mid = (lo + hi) >> 1
        v = jnp.take_along_axis(count, jnp.minimum(mid, n - 1), axis=-1)
        ge = v >= targets
        hi = jnp.where(ge, mid, hi); lo = jnp.where(ge, lo, mid + 1)
    return lo

@jax.jit
def stage_c(c, kp):   # full ball_query
    from feat3dnet_tpu.ops import ball_query
    idx, cnt = ball_query(c, kp, 2.0, 64)
    return idx

@jax.jit
def stage_d(c, kp):   # full group path
    from feat3dnet_tpu.models.feat3dnet import _group_normalized
    g, idx, cnt = _group_normalized(c, kp, 2.0, 64, None)
    return g

timeit('baseline(sum only)', baseline, clusters, keypoints)
timeit('a: d2+cumsum', stage_a, clusters, keypoints)
timeit('b: +binsearch', stage_b, clusters, keypoints)
timeit('c: ball_query', stage_c, clusters, keypoints)
timeit('d: group_normalized', stage_d, clusters, keypoints)
