import numpy as np, time, jax, jax.numpy as jnp
from feat3dnet_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from feat3dnet_tpu.data.io import load_point_cloud
from feat3dnet_tpu.ops.neighborhoods import pairwise_sqdist
from feat3dnet_tpu.utils.profiling import timed_device_call

cloud = load_point_cloud('/root/reference/example_data/oxford_270.bin', num_cols=6)
base = jnp.asarray(cloud[None, :, :3])
kp = base[:, :8192]
ns = 64

def make(branch):
    @jax.jit
    def f(a, b):
        d2 = pairwise_sqdist(b, a)
        in_ball = d2 < 4.0
        count = jnp.cumsum(in_ball.astype(jnp.int32), axis=-1)
        n = a.shape[-2]
        if branch == 'count':
            clamped = jnp.minimum(count, ns + 1)
            slots = jnp.arange(ns, dtype=jnp.int32)
            idx = jnp.sum((clamped[..., None] <= slots).astype(jnp.int32), axis=-2)
        else:
            targets = jnp.arange(1, ns + 1, dtype=jnp.int32)
            shape = count.shape[:-1] + (ns,)
            lo = jnp.zeros(shape, jnp.int32); hi = jnp.full(shape, n, jnp.int32)
            for _ in range(n.bit_length()):
                mid = (lo + hi) >> 1
                v = jnp.take_along_axis(count, jnp.minimum(mid, n - 1), axis=-1)
                ge = v >= targets
                hi = jnp.where(ge, mid, hi); lo = jnp.where(ge, lo, mid + 1)
            idx = lo
        return jnp.sum(idx)
    return f

fc, fb = make('count'), make('bin')
tc = timed_device_call(fc, base, kp, repeats=4)
tb = timed_device_call(fb, base, kp, repeats=4)
print('8192x16384 ns=64: counting %.1f ms   binsearch %.1f ms' % (tc*1000, tb*1000))
