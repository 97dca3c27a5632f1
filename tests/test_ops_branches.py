"""Both ball-query index formulations (counting vs binary search) must agree
with each other and the oracle across the size crossover."""
import numpy as np

import jax.numpy as jnp

from feat3dnet_tpu.ops import ball_query
from tests.test_ops import ball_query_oracle


def test_branches_agree_across_crossover(rng):
    # large N forces the binary-search branch (N*ns > 2^21)
    n, m, ns = 40000, 4, 64
    xyz = rng.rand(1, n, 3).astype(np.float32) * 4.0
    centers = xyz[:, :m].copy()
    idx_big, cnt_big = ball_query(jnp.asarray(xyz), jnp.asarray(centers), 0.5, ns)

    # same geometry, restricted to the first 8192 points -> counting branch
    idx_small, cnt_small = ball_query(jnp.asarray(xyz[:, :8192]), jnp.asarray(centers), 0.5, ns)

    # oracle on the small variant
    idx_o, cnt_o = ball_query_oracle(xyz[:, :8192], centers, 0.5, ns)
    np.testing.assert_array_equal(np.asarray(idx_small), idx_o)
    np.testing.assert_array_equal(np.asarray(cnt_small), cnt_o)

    # the big variant must extend the small one consistently: every index
    # chosen from the first 8192 points must match until the small set's
    # neighborhoods saturate
    for j in range(m):
        c_small = int(cnt_small[0, j])
        prefix = np.asarray(idx_big)[0, j][np.asarray(idx_big)[0, j] < 8192][:c_small]
        np.testing.assert_array_equal(prefix[:c_small], np.asarray(idx_small)[0, j, :c_small])
