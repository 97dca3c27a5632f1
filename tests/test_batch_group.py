"""Fused batched ball query (ops/batch_group.py) vs the dense exact op.

ops.ball_query is oracle-tested against the reference CUDA semantics
(tests/test_ops.py), so exact equality here transitively proves the fused
training-grouping kernel index-exact — first-nsample-by-index on saturated
balls, repeat-pad, nearest fallback. Kernels run interpreted on the CPU
mesh; on-chip equality is re-checked by scripts/verify_on_chip.py.
"""
import numpy as np

import jax
import jax.numpy as jnp

from feat3dnet_tpu.ops import ball_query
from feat3dnet_tpu.ops.batch_group import ball_query_fused


def _check(xyz, ctr, radius, ns, tile=64):
    idx_d, cnt_d = ball_query(jnp.asarray(xyz), jnp.asarray(ctr), radius, ns)
    idx_f, cnt_f = ball_query_fused(jnp.asarray(xyz), jnp.asarray(ctr),
                                    radius, ns, tile=tile, interpret=True)
    np.testing.assert_array_equal(np.asarray(cnt_f), np.asarray(cnt_d))
    np.testing.assert_array_equal(np.asarray(idx_f), np.asarray(idx_d))
    return np.asarray(cnt_d)


def test_fused_vs_dense_random(rng):
    xyz = (rng.rand(2, 768, 3).astype(np.float32) - 0.5) * 20
    ctr = xyz[:, :128]
    _check(xyz, ctr, 2.0, 16)


def test_fused_vs_dense_saturated(rng):
    """Dense clusters: selection must be the first ns in original index
    order (reference scan order), exercised where cnt > nsample."""
    xyz = (rng.rand(2, 1024, 3).astype(np.float32) - 0.5) * 20
    xyz[:, :400] = xyz[:, :1] + rng.randn(2, 400, 3).astype(np.float32) * 0.4
    cnt = _check(xyz, xyz[:, :256].copy(), 2.0, 16)
    assert (cnt == 16).mean() > 0.3, "test cloud should saturate balls"


def test_fused_empty_ball_fallback(rng):
    """Centers with empty balls get the per-center nearest point."""
    xyz = (rng.rand(1, 512, 3).astype(np.float32) - 0.5) * 10
    ctr = xyz[:, :64].copy()
    ctr[0, 3] = [400.0, -200.0, 50.0]
    ctr[0, 40] = [-350.0, 120.0, 9.0]
    _check(xyz, ctr, 1.0, 8)


def test_fused_tile_and_pad_invariance(rng):
    """M not a multiple of the tile and N not a multiple of the prefix
    chunk: padding must not perturb any real center's result."""
    xyz = (rng.rand(2, 700, 3).astype(np.float32) - 0.5) * 16
    ctr = xyz[:, :200].copy()
    for tile in (32, 128):
        _check(xyz, ctr, 2.0, 8, tile=tile)


def test_model_grouping_unchanged_on_cpu(rng):
    """On non-TPU backends _group_normalized keeps the dense path (the
    dispatch guard), so the CPU-mesh DP equivalence tests keep covering
    the exact executable the virtual mesh runs."""
    from feat3dnet_tpu.ops.batch_group import use_fused_ball_query

    xyz = jnp.zeros((2, 4096, 3))
    ctr = jnp.zeros((2, 512, 3))
    assert not use_fused_ball_query(xyz, ctr, 2.0, 64, None)
