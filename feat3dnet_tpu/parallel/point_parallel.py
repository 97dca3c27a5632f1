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


def make_sharded_extract(model: Feat3DNet, mesh: Mesh, mcfg, icfg,
                         n_bucket: int, axis_name: str = "data") -> Callable:
    """Mesh-sharded END-TO-END extraction on the Morton-sorted layout.

    Round-2 mesh mode sharded only the attention pass (and dropped the
    hashed kernels); this shards the whole pipeline:

      * grouping + detector: each device runs the spatially-pruned Pallas
        ball-query (ops/hash_grid.py) for its contiguous shard of sorted
        centers against the replicated cloud — the exact keypoint-sharding
        pattern of keypoint_sharded_attention, now on the fast kernels;
      * NMS ball-max: per-device ball_max_sorted over its center shard
        (candidate values arrive via one (N,)-scalar all-gather over ICI);
      * selection (top-k over N scalars) replicates — it is trivial;
      * descriptors: NO second ball query (same reuse as the single-device
        hashed extract, inference/pipeline.py): every keypoint is a cloud
        point whose radius-r cluster and detector orientation were already
        computed by the attention pass on its owning shard. One (K, ns, 3)
        psum collects the selected clusters (each sorted row is owned by
        exactly one device), then each device runs the descriptor tower on
        its K/D keypoint slice.

    Built with shard_map (explicit per-device Pallas calls + collectives)
    rather than GSPMD constraints: the kernels' tiled grids must stay
    per-device. Outputs are replicated and equal the single-device hashed
    extract (tests/test_parallel.py).

    Returns impl(variables, pts4 (nb,4), blk_bbox (NB,8), inv_perm (nb,))
    -> (kp (K,3), feats (K,D), kp_att (K,), num ()) — inputs from
    build_sorted_cloud_host.
    """
    import numpy as _np

    from feat3dnet_tpu.models.feat3dnet import Feat3DNet as _F
    from feat3dnet_tpu.models.feat3dnet import _rotate_z
    from feat3dnet_tpu.ops.hash_grid import (SortedCloud, ball_max_sorted,
                                             ball_query_grouped_sorted)
    from feat3dnet_tpu.ops.nms import select_keypoints

    n_dev = int(_np.prod([mesh.shape[a] for a in mesh.axis_names]))
    shard = n_bucket // n_dev
    r = float(mcfg.base_scale)
    ns = mcfg.num_samples
    k_max = icfg.max_keypoints
    assert n_bucket % n_dev == 0 and shard % 128 == 0, (
        f"bucket {n_bucket} must shard into 128-aligned center tiles "
        f"across {n_dev} devices")
    assert k_max % n_dev == 0, (
        f"max_keypoints {k_max} must divide across {n_dev} devices")

    chunk = 1
    while (chunk * 2 <= min(icfg.keypoint_chunk, shard)
           and shard % (chunk * 2) == 0):
        chunk *= 2

    def attention_nms_shard(variables, pts4, blk_bbox, ctr_shard):
        sc = SortedCloud(pts4=pts4, blk_bbox=blk_bbox, orig_idx=None,
                         inv_perm=None, block_size=0)
        grouped, _, _ = ball_query_grouped_sorted(sc, ctr_shard, r, ns,
                                                  tile=128)
        normalized = (grouped - ctr_shard[:, None, :]) / r

        def one_chunk(start):
            g = jax.lax.dynamic_slice_in_dim(normalized, start, chunk, axis=0)
            att, ori = model.apply(variables, g[None], training=False,
                                   method=_F.detect_clusters)
            return att[0], ori[0]

        att_shard, ori_shard = jax.lax.map(
            one_chunk, jnp.arange(shard // chunk) * chunk)
        att_shard = att_shard.reshape(-1)
        ori_shard = ori_shard.reshape(-1)
        att_full = jax.lax.all_gather(att_shard, axis_name, tiled=True)
        ballmax_shard = ball_max_sorted(pts4, blk_bbox, att_full,
                                        float(icfg.nms_radius),
                                        centers=ctr_shard)
        return att_shard, ballmax_shard, ori_shard, grouped

    def describe_shard(variables, grouped_shard, ori_shard, kp_s, kp):
        # Collect the selected keypoints' precomputed clusters/orientations
        # from their owning shards: each sorted row lives on exactly one
        # device, so a masked gather + psum reconstructs the full (K, ...)
        # buffers everywhere (K·ns·3 f32 ≈ 0.8 MB at the defaults — one
        # cheap ICI reduction instead of a dense K×N ball query).
        lo = jax.lax.axis_index(axis_name) * shard
        rel = kp_s - lo
        owned = (rel >= 0) & (rel < shard)
        relc = jnp.clip(rel, 0, shard - 1)
        contrib = jnp.where(owned[:, None, None],
                            grouped_shard[relc], 0.0)
        clusters = jax.lax.psum(contrib, axis_name)          # (K, ns, 3)
        ori_kp = jax.lax.psum(jnp.where(owned, ori_shard[relc], 0.0),
                              axis_name)                     # (K,)
        normalized = (clusters - kp[:, None, :]) / r
        if mcfg.regress_orientation:
            normalized = _rotate_z(normalized[None], ori_kp[None])[0]
        my = jax.lax.dynamic_slice_in_dim(
            normalized, jax.lax.axis_index(axis_name) * (k_max // n_dev),
            k_max // n_dev, axis=0)
        return model.apply(variables, my[None], training=False,
                           method=_F.describe_clusters)[0]

    @jax.jit
    def impl(variables, pts4, blk_bbox, inv_perm):
        att_s, ballmax_s, ori_s, grouped = jax.shard_map(
            attention_nms_shard, mesh=mesh,
            in_specs=(P(), P(), P(), P(axis_name)),
            out_specs=(P(axis_name),) * 4, check_vma=False,
        )(variables, pts4, blk_bbox, pts4[:, :3])
        att = att_s[inv_perm]
        is_max = (att_s >= ballmax_s)[inv_perm]
        cloud = pts4[inv_perm, :3][None]
        valid = cloud[..., 0] < 5.0e8                  # invalid -> +1e9
        kp, kp_att, num, kp_idx = select_keypoints(
            cloud, att[None], is_max[None], k_max,
            icfg.min_response_ratio, valid_mask=valid, return_indices=True)
        kp_s = inv_perm[kp_idx[0]]                     # sorted-domain rows
        feats = jax.shard_map(
            describe_shard, mesh=mesh,
            in_specs=(P(), P(axis_name), P(axis_name), P(), P()),
            out_specs=P(axis_name), check_vma=False,
        )(variables, grouped, ori_s, kp_s, kp[0])
        return kp[0], feats, kp_att[0], num[0]

    return impl
