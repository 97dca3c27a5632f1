"""Keypoint-axis parallelism for dense-cloud inference.

The reference's long-input mechanism is a host loop feeding 30k-point
windows of the keypoint axis (inference.py:22,123-137). SURVEY.md §5
sketches sharding the candidate-points axis with cross-shard gathers; this
module makes the strictly better choice at these scales: point clouds are
TINY (131k pts × 3 f32 = 1.5 MB — thousands of times smaller than VMEM-era
model activations), so the cloud is REPLICATED and the QUERY/keypoint axis
is sharded. Every device computes attention for its keypoint slice against
the whole cloud; the result is one all-gather of (K/D,) scalars over ICI.
No ring exchange, no halo, no cross-shard ball-query corner cases.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from feat3dnet_tpu.models.feat3dnet import Feat3DNet

Array = jax.Array


def keypoint_sharded_attention(
    model: Feat3DNet,
    mesh: Mesh,
    axis_name: str = "data",
) -> Callable:
    """Build a jitted fn: (variables, cloud (1,N,3), valid (1,N)) ->
    (attention (N,), orientation (N,)) with the keypoint axis sharded.

    N must be divisible by the mesh size (callers pad to POINT_BUCKETS,
    which are powers of two).
    """
    repl = NamedSharding(mesh, P())
    kp_sharded = NamedSharding(mesh, P(None, axis_name))

    def fn(variables, cloud, valid_mask):
        xyz = cloud[..., :3]
        # Lay out the keypoint copy sharded; the cloud stays replicated.
        keypoints = jax.lax.with_sharding_constraint(xyz, kp_sharded)
        out = model.apply(variables, cloud, training=False,
                          keypoints=keypoints, valid_mask=valid_mask)
        att = out.end_points["attention"]
        ori = out.end_points["orientation"]
        return att[0], ori[0]

    return jax.jit(
        fn,
        in_shardings=(repl, repl, repl),
        out_shardings=(NamedSharding(mesh, P(axis_name)),) * 2,
    )
