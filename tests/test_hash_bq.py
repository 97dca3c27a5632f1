"""Spatially-pruned ball query (ops/hash_grid.py) vs the dense exact op.

The dense ops.ball_query is itself oracle-tested against the reference CUDA
semantics (tests/test_ops.py), so exact equality here transitively proves
the hashed path index-exact — including saturated balls (cnt > nsample,
83% of real Oxford balls), where selection must be the ns smallest
ORIGINAL indices. Kernels run in Pallas interpret mode on the CPU mesh.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from feat3dnet_tpu.ops import ball_query
from feat3dnet_tpu.ops.hash_grid import (ball_query_grouped_sorted,
                                         build_sorted_cloud, hashed_ball_query,
                                         sort_centers)


def _clouds(rng, n, spread=20.0, clusters=0):
    """Random cloud; optionally with dense clusters to saturate balls."""
    pts = (rng.rand(n, 3).astype(np.float32) - 0.5) * spread
    if clusters:
        k = n // 3
        centers = (rng.rand(clusters, 3).astype(np.float32) - 0.5) * spread
        which = rng.randint(0, clusters, k)
        pts[:k] = centers[which] + rng.randn(k, 3).astype(np.float32) * 0.5
    return pts


def _check_equal(xyz, centers, radius, ns, valid=None, center_valid=None):
    idx_ref, cnt_ref = ball_query(
        jnp.asarray(xyz[None]), jnp.asarray(centers[None]), radius, ns,
        valid_mask=None if valid is None else jnp.asarray(valid[None]))
    idx_h, cnt_h = hashed_ball_query(
        jnp.asarray(xyz[None]), jnp.asarray(centers[None]), radius, ns,
        valid_mask=None if valid is None else jnp.asarray(valid[None]),
        center_valid=None if center_valid is None else jnp.asarray(center_valid[None]),
        block_size=64, tile=16)
    np.testing.assert_array_equal(np.asarray(cnt_h), np.asarray(cnt_ref))
    np.testing.assert_array_equal(np.asarray(idx_h), np.asarray(idx_ref))


def test_exact_vs_dense_random(rng):
    xyz = _clouds(rng, 500)
    centers = xyz[rng.choice(500, 100, replace=False)]
    _check_equal(xyz, centers, 2.0, 16)


def test_exact_vs_dense_saturated(rng):
    """Dense clusters: most balls have cnt > nsample — selection must be
    the ns smallest original indices (the reference's scan order)."""
    xyz = _clouds(rng, 600, spread=8.0, clusters=5)
    centers = xyz[rng.choice(600, 80, replace=False)]
    idx, cnt = ball_query(jnp.asarray(xyz[None]), jnp.asarray(centers[None]), 2.0, 8)
    assert np.mean(np.asarray(cnt) == 8) > 0.5, "test cloud should saturate"
    _check_equal(xyz, centers, 2.0, 8)


def test_exact_vs_dense_valid_mask(rng):
    xyz = _clouds(rng, 400, spread=10.0)
    valid = rng.rand(400) > 0.3
    centers = xyz[rng.choice(400, 60, replace=False)]
    _check_equal(xyz, centers, 2.0, 8, valid=valid)


def test_empty_ball_nearest_fallback(rng):
    """External keypoints far from every point: per-center nearest."""
    xyz = _clouds(rng, 300, spread=10.0)
    centers = np.stack([xyz[0] + 0.1,
                        np.array([500.0, 500.0, 500.0], np.float32),
                        np.array([-300.0, 200.0, 0.0], np.float32)])
    _check_equal(xyz, centers, 1.0, 8)


def test_grouped_coords_match_indices(rng):
    """grouped coords from the kernel == xyz gathered at the indices."""
    xyz = _clouds(rng, 500, spread=12.0, clusters=4)
    sc = build_sorted_cloud(jnp.asarray(xyz), block_size=64)
    centers_sorted, order = sort_centers(jnp.asarray(xyz[:128]))
    grouped, idx, cnt = ball_query_grouped_sorted(sc, centers_sorted, 2.0, 8, tile=16)
    grouped, idx, cnt = map(np.asarray, (grouped, idx, cnt))
    nonempty = cnt > 0
    np.testing.assert_allclose(grouped[nonempty], xyz[idx[nonempty]], rtol=0, atol=0)


def test_block_size_and_tile_invariance(rng):
    xyz = _clouds(rng, 300, spread=6.0, clusters=3)
    centers = xyz[:50]
    ref = None
    for bs, t in ((32, 8), (64, 32), (128, 16)):
        idx, cnt = hashed_ball_query(
            jnp.asarray(xyz[None]), jnp.asarray(centers[None]), 2.0, 8,
            block_size=bs, tile=t)
        if ref is None:
            ref = (np.asarray(idx), np.asarray(cnt))
        else:
            np.testing.assert_array_equal(np.asarray(idx), ref[0])
            np.testing.assert_array_equal(np.asarray(cnt), ref[1])


def test_offset_cloud(rng):
    """Clouds far from the origin (the 51 km validation-packing regime)."""
    xyz = _clouds(rng, 300, spread=10.0) + np.float32(5000.0)
    centers = xyz[:40]
    _check_equal(xyz, centers, 2.0, 8)


def test_pipeline_hashed_attention_matches_xla(rng):
    """The pipeline's hashed attention pass (Pallas grouping + detector on
    precomputed clusters) must reproduce the chunked XLA path's attention
    exactly — same neighborhoods, same slot order, same math."""
    from feat3dnet_tpu.config import InferenceConfig, ModelConfig
    from feat3dnet_tpu.inference import InferencePipeline
    from feat3dnet_tpu.models import Feat3DNet

    cfg = ModelConfig(num_clusters=-1, num_samples=8, feature_dim=16,
                      base_scale=2.0, detector_mlp=(8, 16), detector_mlp2=(8,),
                      descriptor_mlp=(8, 8))
    model = Feat3DNet(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 3)), training=False)
    v = jax.tree.map(lambda x: x + 0.1 * rng.randn(*x.shape).astype(np.float32), v)

    n, nb = 700, 1024
    xyz = _clouds(rng, n, spread=15.0, clusters=4)
    padded = np.zeros((1, nb, 3), np.float32)
    padded[0, :n] = xyz
    valid = np.zeros((1, nb), bool)
    valid[0, :n] = True
    cloud, valid_j = jnp.asarray(padded), jnp.asarray(valid)

    pipe_h = InferencePipeline(model, v, cfg,
                               InferenceConfig(use_hashed_grouping=True,
                                               keypoint_chunk=256))
    pipe_x = InferencePipeline(model, v, cfg,
                               InferenceConfig(use_hashed_grouping=False,
                                               keypoint_chunk=256))
    att_h, _ = pipe_h._attention_fn(nb)(v, cloud, valid_j)
    att_x, _ = pipe_x._attention_fn(nb)(v, cloud, valid_j)
    np.testing.assert_allclose(np.asarray(att_h)[:n], np.asarray(att_x)[:n],
                               rtol=1e-5, atol=1e-6)

    # full extract end-to-end: same keypoints, same descriptors
    res_h = pipe_h.extract(xyz)
    res_x = pipe_x.extract(xyz)
    assert res_h.num_keypoints == res_x.num_keypoints
    np.testing.assert_allclose(res_h.keypoints, res_x.keypoints, atol=1e-6)
    np.testing.assert_allclose(res_h.features, res_x.features, rtol=1e-4, atol=1e-5)


def test_ball_max_vs_dense_oracle(rng):
    """ball_max_sorted (the spatially-pruned NMS primitive) must equal a
    dense per-point radius max over VALID candidates, including self."""
    from feat3dnet_tpu.ops.hash_grid import ball_max_sorted

    n, radius = 600, 1.5
    xyz = _clouds(rng, n, spread=12.0, clusters=3)
    valid = rng.rand(n) > 0.15
    att = (rng.rand(n).astype(np.float32) + 0.01)
    # inject exact ties to exercise the >= survival rule downstream
    att[10] = att[11] = 0.7

    sc = build_sorted_cloud(jnp.asarray(xyz), jnp.asarray(valid),
                            cell_size=radius, block_size=64)
    att_sorted = jnp.asarray(att)[sc.orig_idx]
    bm = ball_max_sorted(sc.pts4, sc.blk_bbox, att_sorted, radius, tile=32)
    got = np.asarray(bm)[np.asarray(sc.inv_perm)]           # original order

    d2 = ((xyz[:, None, :] - xyz[None, :, :]) ** 2).sum(-1)
    in_ball = (d2 < radius ** 2) & valid[None, :]
    oracle = np.where(in_ball, att[None, :], -np.inf).max(axis=1)
    np.testing.assert_array_equal(got[valid], oracle[valid].astype(np.float32))


def test_hashed_extract_nms_matches_dense(rng):
    """End-to-end: the hashed extract's spatially-pruned NMS must select
    the exact same keypoints as the dense streamed-max NMS."""
    from feat3dnet_tpu.config import InferenceConfig, ModelConfig
    from feat3dnet_tpu.inference import InferencePipeline
    from feat3dnet_tpu.models import Feat3DNet

    cfg = ModelConfig(num_clusters=-1, num_samples=8, feature_dim=16,
                      base_scale=2.0, detector_mlp=(8, 16), detector_mlp2=(8,),
                      descriptor_mlp=(8, 8))
    model = Feat3DNet(cfg)
    v = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 3)), training=False)
    v = jax.tree.map(lambda x: x + 0.1 * rng.randn(*x.shape).astype(np.float32), v)

    xyz = _clouds(rng, 900, spread=18.0, clusters=5)
    icfg = dict(keypoint_chunk=256, max_keypoints=64, nms_radius=1.0)
    pipe_h = InferencePipeline(model, v, cfg,
                               InferenceConfig(use_hashed_grouping=True, **icfg))
    pipe_x = InferencePipeline(model, v, cfg,
                               InferenceConfig(use_hashed_grouping=False, **icfg))
    res_h = pipe_h.extract(xyz)
    res_x = pipe_x.extract(xyz)
    assert res_h.num_keypoints == res_x.num_keypoints
    np.testing.assert_array_equal(res_h.keypoints, res_x.keypoints)
    np.testing.assert_allclose(res_h.features, res_x.features, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(res_h.attention, res_x.attention, rtol=1e-5, atol=1e-6)


def test_extract_batch_matches_single(rng):
    """extract_batch packs B clouds into one dispatch; per-cloud results
    must be BIT-equal to extract() on each cloud alone (cloud-pure
    hitmask isolation, no coordinate shifts; results are bucket-size
    independent because pad points/blocks never enter a real ball)."""
    from feat3dnet_tpu.config import InferenceConfig, ModelConfig
    from feat3dnet_tpu.inference import InferencePipeline
    from feat3dnet_tpu.models import Feat3DNet

    cfg = ModelConfig(num_clusters=-1, num_samples=8, feature_dim=16,
                      base_scale=2.0, detector_mlp=(8, 16), detector_mlp2=(8,),
                      descriptor_mlp=(8, 8))
    model = Feat3DNet(cfg)
    v = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 64, 3)),
                   training=False)
    v = jax.tree.map(lambda x: x + 0.1 * rng.randn(*x.shape).astype(np.float32), v)

    # three clouds of different sizes, overlapping coordinate ranges (the
    # isolation must come from the hitmask, not from spatial separation)
    clouds = [_clouds(rng, n, spread=15.0, clusters=3)
              for n in (700, 450, 900)]
    pipe = InferencePipeline(model, v, cfg,
                             InferenceConfig(use_hashed_grouping=True,
                                             keypoint_chunk=256,
                                             max_keypoints=64,
                                             nms_radius=1.0))
    batch = pipe.extract_batch(clouds)
    singles = [pipe.extract(c) for c in clouds]
    for rb, rs in zip(batch, singles):
        assert rb.num_keypoints == rs.num_keypoints
        np.testing.assert_array_equal(rb.keypoints, rs.keypoints)
        np.testing.assert_array_equal(rb.attention, rs.attention)
        np.testing.assert_array_equal(rb.features, rs.features)


def test_block_mask_grid_drivers_match_fori(rng):
    """Cross-cloud isolation (block_mask) must hold identically on the
    2-D GRID drivers — the path taken when B·bucket exceeds the fori
    VMEM ceilings, which the pipeline tests never reach (they run tiny
    unions on the fori drivers)."""
    from feat3dnet_tpu.ops.hash_grid import (SortedCloud, ball_max_sorted,
                                             ball_query_grouped_sorted,
                                             build_sorted_cloud_host)

    L, tc, ns, r = 64, 32, 8, 1.5
    nb = 256                                 # per-cloud bucket (4 blocks)
    p4, att_parts = [], []
    for i in range(3):                       # overlapping coordinate ranges
        c = _clouds(rng, 200, spread=10.0, clusters=2)
        pd = np.zeros((nb, 3), np.float32)
        pd[:200] = c
        vl = np.zeros((nb,), bool)
        vl[:200] = True
        p4.append(build_sorted_cloud_host(pd, vl, cell_size=r,
                                          block_size=L).pts4)
        att_parts.append(rng.rand(nb).astype(np.float32) + 0.1)
    pts4 = jnp.asarray(np.concatenate(p4))
    att = jnp.asarray(np.concatenate(att_parts))
    centers = pts4[:, :3]
    blocks = centers.reshape(-1, L, 3)
    bbox = jnp.concatenate(
        [jnp.min(blocks, axis=1), jnp.max(blocks, axis=1),
         jnp.zeros((blocks.shape[0], 2), jnp.float32)], axis=1)
    sc = SortedCloud(pts4=pts4, blk_bbox=bbox, orig_idx=None,
                     inv_perm=None, block_size=0)
    nbk = bbox.shape[0]
    tpc, bpc = nb // tc, nb // L
    mask = jnp.asarray(np.arange(3 * tpc)[:, None] // tpc
                       == np.arange(3 * bpc)[None, :] // bpc)

    g_f, i_f, c_f = ball_query_grouped_sorted(sc, centers, r, ns, tile=tc,
                                              block_mask=mask)
    g_g, i_g, c_g = ball_query_grouped_sorted(sc, centers, r, ns, tile=tc,
                                              block_mask=mask,
                                              max_fori_points=0)
    np.testing.assert_array_equal(np.asarray(g_f), np.asarray(g_g))
    np.testing.assert_array_equal(np.asarray(i_f), np.asarray(i_g))
    np.testing.assert_array_equal(np.asarray(c_f), np.asarray(c_g))

    b_f = ball_max_sorted(pts4, bbox, att, 1.0, tile=nb,
                          block_mask=jnp.asarray(
                              np.arange(3)[:, None]
                              == np.arange(3 * bpc)[None, :] // bpc))
    b_g = ball_max_sorted(pts4, bbox, att, 1.0, tile=nb,
                          block_mask=jnp.asarray(
                              np.arange(3)[:, None]
                              == np.arange(3 * bpc)[None, :] // bpc),
                          max_fori_points=0)
    np.testing.assert_array_equal(np.asarray(b_f), np.asarray(b_g))
    # and the isolation itself: per-cloud results equal the union's slice
    for i in range(3):
        sub = SortedCloud(pts4=pts4[i * nb:(i + 1) * nb],
                          blk_bbox=bbox[i * bpc:(i + 1) * bpc],
                          orig_idx=None, inv_perm=None, block_size=0)
        gs, _, cs = ball_query_grouped_sorted(
            sub, pts4[i * nb:(i + 1) * nb, :3], r, ns, tile=tc)
        np.testing.assert_array_equal(np.asarray(gs),
                                      np.asarray(g_g[i * nb:(i + 1) * nb]))
        np.testing.assert_array_equal(np.asarray(cs),
                                      np.asarray(c_g[i * nb:(i + 1) * nb]))
        bs = ball_max_sorted(pts4[i * nb:(i + 1) * nb],
                             bbox[i * bpc:(i + 1) * bpc],
                             att[i * nb:(i + 1) * nb], 1.0, tile=nb)
        np.testing.assert_array_equal(np.asarray(bs),
                                      np.asarray(b_g[i * nb:(i + 1) * nb]))


def test_fill_gate_drivers_bit_equal(rng):
    """fill_gate=True (the A/B'd gated buffer-rank compare) must be
    bit-equal to the default on both transposed drivers — the gate skips
    only provably-zero chunks (ascending keys, sentinel-tailed)."""
    from feat3dnet_tpu.ops.hash_grid import (_bq_sorted_raw_t,
                                             _bq_sorted_raw_t_fori,
                                             build_sorted_cloud_host)

    pts = _clouds(rng, 700, spread=12.0, clusters=3)
    pd = np.zeros((768, 3), np.float32)
    pd[:700] = pts
    vl = np.zeros((768,), bool)
    vl[:700] = True
    sc = build_sorted_cloud_host(pd, vl, cell_size=1.5, block_size=64)
    for raw in (_bq_sorted_raw_t, _bq_sorted_raw_t_fori):
        a = raw(jnp.asarray(sc.pts4), jnp.asarray(sc.blk_bbox),
                jnp.asarray(sc.pts4[:, :3]), 1.5, 8, tile=32)
        b = raw(jnp.asarray(sc.pts4), jnp.asarray(sc.blk_bbox),
                jnp.asarray(sc.pts4[:, :3]), 1.5, 8, tile=32,
                fill_gate=True)
        for xa, xb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_auto_layout_matches_pinned(rng):
    """hash_block=0 (density-keyed auto layout) must produce bit-equal
    extraction results to the pinned default — layouts only change the
    block partition, never the grouping/NMS contracts."""
    from feat3dnet_tpu.config import InferenceConfig, ModelConfig
    from feat3dnet_tpu.inference import InferencePipeline
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.ops.hash_grid import estimate_ball_points

    cfg = ModelConfig(num_clusters=-1, num_samples=8, feature_dim=16,
                      base_scale=2.0, detector_mlp=(8, 16), detector_mlp2=(8,),
                      descriptor_mlp=(8, 8))
    model = Feat3DNet(cfg)
    v = model.init(jax.random.PRNGKey(5), jnp.zeros((1, 64, 3)),
                   training=False)
    v = jax.tree.map(lambda x: x + 0.1 * rng.randn(*x.shape).astype(np.float32), v)
    # dense cluster cloud → saturated → auto picks the 128 block
    cloud = _clouds(rng, 900, spread=6.0, clusters=2)
    assert estimate_ball_points(cloud, 2.0) >= cfg.num_samples
    kw = dict(use_hashed_grouping=True, keypoint_chunk=256,
              max_keypoints=32, nms_radius=1.0)
    auto = InferencePipeline(model, v, cfg,
                             InferenceConfig(hash_block=0, **kw))
    pinned = InferencePipeline(model, v, cfg, InferenceConfig(**kw))
    assert auto._layout_for(cloud) == (128, 256)
    ra, rp = auto.extract(cloud), pinned.extract(cloud)
    assert ra.num_keypoints == rp.num_keypoints
    np.testing.assert_array_equal(ra.keypoints, rp.keypoints)
    np.testing.assert_array_equal(ra.features, rp.features)
    # batched auto: densest cloud's layout wins, results still bit-equal
    clouds = [cloud, _clouds(rng, 500, spread=25.0)]
    many = auto.extract_many(clouds, batch_size=2)
    for rm, c in zip(many, clouds):
        rs = pinned.extract(c)
        assert rm.num_keypoints == rs.num_keypoints
        np.testing.assert_array_equal(rm.features, rs.features)


def test_extract_many_batched_matches_single(rng):
    """extract_many(batch_size=2) — pipelined batched dispatches — must
    return the same per-cloud results as extract(), in input order,
    including the odd trailing chunk."""
    from feat3dnet_tpu.config import InferenceConfig, ModelConfig
    from feat3dnet_tpu.inference import InferencePipeline
    from feat3dnet_tpu.models import Feat3DNet

    cfg = ModelConfig(num_clusters=-1, num_samples=8, feature_dim=16,
                      base_scale=2.0, detector_mlp=(8, 16), detector_mlp2=(8,),
                      descriptor_mlp=(8, 8))
    model = Feat3DNet(cfg)
    v = model.init(jax.random.PRNGKey(4), jnp.zeros((1, 64, 3)),
                   training=False)
    v = jax.tree.map(lambda x: x + 0.1 * rng.randn(*x.shape).astype(np.float32), v)
    clouds = [_clouds(rng, n, spread=12.0, clusters=2)
              for n in (500, 650, 400)]                  # 3 clouds, B=2 + 1
    pipe = InferencePipeline(model, v, cfg,
                             InferenceConfig(use_hashed_grouping=True,
                                             keypoint_chunk=256,
                                             max_keypoints=32,
                                             nms_radius=1.0))
    many = pipe.extract_many(clouds, batch_size=2)
    for rm, c in zip(many, clouds):
        rs = pipe.extract(c)
        assert rm.num_keypoints == rs.num_keypoints
        np.testing.assert_array_equal(rm.keypoints, rs.keypoints)
        np.testing.assert_array_equal(rm.features, rs.features)


def test_host_sort_matches_device_sort(rng):
    """build_sorted_cloud_host (numpy, pipeline path) must produce the
    exact same layout as the in-jit device version."""
    from feat3dnet_tpu.ops.hash_grid import build_sorted_cloud_host

    xyz = _clouds(rng, 500, spread=25.0, clusters=3)
    valid = rng.rand(500) > 0.2
    sc_d = build_sorted_cloud(jnp.asarray(xyz), jnp.asarray(valid), block_size=64)
    sc_h = build_sorted_cloud_host(xyz, valid, block_size=64)
    np.testing.assert_array_equal(np.asarray(sc_d.pts4), sc_h.pts4)
    np.testing.assert_array_equal(np.asarray(sc_d.blk_bbox), sc_h.blk_bbox)
    np.testing.assert_array_equal(np.asarray(sc_d.orig_idx), sc_h.orig_idx)
    np.testing.assert_array_equal(np.asarray(sc_d.inv_perm), sc_h.inv_perm)


def test_csr_matches_dense_grid(rng):
    """The CSR (scalar-prefetch) merge drivers must match the dense-grid
    drivers exactly — grouped coords, indices, counts, and ball max —
    including hitless tiles (far-away centers) and bucket padding."""
    from feat3dnet_tpu.ops.hash_grid import (
        SortedCloud, ball_max_csr, ball_max_sorted, ball_query_grouped_csr,
        build_hit_csr_host, build_sorted_cloud_host)

    n, r, ns, L, tc = 700, 1.5, 16, 64, 32
    xyz = _clouds(rng, n, spread=14.0, clusters=4)
    valid = rng.rand(n) > 0.1
    sc = build_sorted_cloud_host(xyz, valid, cell_size=r, block_size=L)
    pts4, bbox = jnp.asarray(sc.pts4), jnp.asarray(sc.blk_bbox)
    scj = SortedCloud(pts4=pts4, blk_bbox=bbox, orig_idx=None,
                      inv_perm=None, block_size=0)

    # centers = sorted points, PLUS a far-away pad tail exercising
    # hitless-tile init (every real tile hits its own block)
    centers = np.concatenate(
        [sc.pts4[:, :3], np.full((2 * tc, 3), 5.0e8, np.float32)])
    tof, bof = build_hit_csr_host(
        np.pad(centers, ((0, -len(centers) % tc), (0, 0)),
               constant_values=1e9),
        sc.blk_bbox, r, tc)
    g_d, i_d, c_d = ball_query_grouped_sorted(
        scj, jnp.asarray(centers), r, ns, tile=tc)
    g_c, i_c, c_c = ball_query_grouped_csr(
        scj, jnp.asarray(centers), jnp.asarray(tof), jnp.asarray(bof),
        r, ns, block_size=L, tile=tc)
    np.testing.assert_array_equal(np.asarray(i_c), np.asarray(i_d))
    np.testing.assert_array_equal(np.asarray(c_c), np.asarray(c_d))
    np.testing.assert_array_equal(np.asarray(g_c), np.asarray(g_d))

    # ball max: CSR over the points themselves
    vals = jnp.asarray(rng.rand(sc.pts4.shape[0]).astype(np.float32))
    tof2, bof2 = build_hit_csr_host(sc.pts4[:, :3], sc.blk_bbox, 0.8, tc)
    bm_d = ball_max_sorted(pts4, bbox, vals, 0.8, tile=tc)
    bm_c = ball_max_csr(pts4, vals, jnp.asarray(tof2), jnp.asarray(bof2),
                        0.8, block_size=L, tile=tc)
    np.testing.assert_array_equal(np.asarray(bm_c), np.asarray(bm_d))


def test_extract_many_matches_sequential(rng):
    """Pipelined extract_many must produce exactly the per-cloud extract()
    results, in input order."""
    from feat3dnet_tpu.config import InferenceConfig, ModelConfig
    from feat3dnet_tpu.inference import InferencePipeline
    from feat3dnet_tpu.models import Feat3DNet

    cfg = ModelConfig(num_clusters=-1, num_samples=8, feature_dim=16,
                      base_scale=2.0, detector_mlp=(8, 16), detector_mlp2=(8,),
                      descriptor_mlp=(8, 8))
    model = Feat3DNet(cfg)
    v = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 3)), training=False)
    pipe = InferencePipeline(model, v, cfg, InferenceConfig(
        use_hashed_grouping=True, keypoint_chunk=256, max_keypoints=32,
        nms_radius=1.0))
    clouds = [_clouds(rng, 300 + 100 * i, spread=15.0, clusters=3)
              for i in range(4)]
    batched = pipe.extract_many(clouds)
    for c, rb in zip(clouds, batched):
        rs = pipe.extract(c)
        assert rb.num_keypoints == rs.num_keypoints
        np.testing.assert_array_equal(rb.keypoints, rs.keypoints)
        np.testing.assert_array_equal(rb.features, rs.features)


def test_center_valid_masking(rng):
    """hashed_ball_query with a center_valid mask: valid rows must match
    the dense op; masked rows must be stably zero (fallback gated on cv)."""
    xyz = _clouds(rng, 400, spread=30.0)
    centers = _clouds(rng, 64, spread=60.0)       # some empty balls
    cv = rng.rand(64) > 0.3
    idx_ref, cnt_ref = ball_query(jnp.asarray(xyz[None]),
                                  jnp.asarray(centers[None]), 2.0, 8)
    idx_h, cnt_h = hashed_ball_query(
        jnp.asarray(xyz[None]), jnp.asarray(centers[None]), 2.0, 8,
        center_valid=jnp.asarray(cv[None]), block_size=64, tile=16)
    np.testing.assert_array_equal(np.asarray(idx_h)[0][cv],
                                  np.asarray(idx_ref)[0][cv])
    np.testing.assert_array_equal(np.asarray(cnt_h)[0][cv],
                                  np.asarray(cnt_ref)[0][cv])
    # masked centers: deterministic zero rows (cnt 0, idx 0)
    assert np.all(np.asarray(cnt_h)[0][~cv] == 0)
    assert np.all(np.asarray(idx_h)[0][~cv] == 0)


def test_device_sort_large_no_overflow(rng):
    """build_sorted_cloud must match the numpy mirror above the ~524k-point
    int32 overflow threshold of the old combined within-block sort key
    (device sort uses lexsort; layouts must stay bit-identical)."""
    from feat3dnet_tpu.ops.hash_grid import (build_sorted_cloud,
                                             build_sorted_cloud_host)

    n = 600_000
    xyz = (rng.rand(n, 3).astype(np.float32) - 0.5) * 200
    sc_h = build_sorted_cloud_host(xyz, cell_size=4.0, block_size=256)
    sc_d = build_sorted_cloud(jnp.asarray(xyz), cell_size=4.0, block_size=256)
    np.testing.assert_array_equal(np.asarray(sc_d.orig_idx), sc_h.orig_idx)
    np.testing.assert_array_equal(np.asarray(sc_d.pts4), sc_h.pts4)
    np.testing.assert_array_equal(np.asarray(sc_d.inv_perm), sc_h.inv_perm)


def test_extract_many_mixed_buckets(rng):
    """extract_many across clouds that land in DIFFERENT size buckets must
    still match per-cloud extract (one executable per bucket)."""
    from feat3dnet_tpu.config import InferenceConfig, ModelConfig, bucket_for
    from feat3dnet_tpu.inference import InferencePipeline
    from feat3dnet_tpu.models import Feat3DNet

    cfg = ModelConfig(num_clusters=-1, num_samples=8, feature_dim=16,
                      base_scale=2.0, detector_mlp=(8,), detector_mlp2=(8,),
                      descriptor_mlp=(8, 8))
    model = Feat3DNet(cfg)
    v = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 3)), training=False)
    pipe = InferencePipeline(model, v, cfg, InferenceConfig(
        use_hashed_grouping=True, keypoint_chunk=512, max_keypoints=16,
        nms_radius=1.0))
    sizes = (3000, 5000)          # buckets 4096 and 8192
    assert len({bucket_for(s) for s in sizes}) == 2
    clouds = [_clouds(rng, s, spread=25.0, clusters=4) for s in sizes]
    batched = pipe.extract_many(clouds)
    for c, rb in zip(clouds, batched):
        rs = pipe.extract(c)
        assert rb.num_keypoints == rs.num_keypoints
        np.testing.assert_array_equal(rb.keypoints, rs.keypoints)


def test_extract_degenerate_clouds(rng):
    """Hashed extract on adversarial inputs: tiny cloud in a huge bucket,
    exact duplicate points, collinear geometry — must return finite
    descriptors and valid keypoint counts, matching the dense path."""
    from feat3dnet_tpu.config import InferenceConfig, ModelConfig
    from feat3dnet_tpu.inference import InferencePipeline
    from feat3dnet_tpu.models import Feat3DNet

    cfg = ModelConfig(num_clusters=-1, num_samples=8, feature_dim=16,
                      base_scale=2.0, detector_mlp=(8,), detector_mlp2=(8,),
                      descriptor_mlp=(8, 8))
    model = Feat3DNet(cfg)
    v = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 3)), training=False)
    common = dict(keypoint_chunk=512, max_keypoints=16, nms_radius=1.0)
    pipe_h = InferencePipeline(model, v, cfg, InferenceConfig(
        use_hashed_grouping=True, **common))
    pipe_x = InferencePipeline(model, v, cfg, InferenceConfig(
        use_hashed_grouping=False, **common))

    tiny = rng.randn(10, 3).astype(np.float32)
    dupes = np.repeat(rng.randn(50, 3).astype(np.float32), 4, axis=0)
    line = np.stack([np.linspace(0, 30, 200)] * 3, axis=1).astype(np.float32)
    for name, cloud in (("tiny", tiny), ("dupes", dupes), ("collinear", line)):
        rh = pipe_h.extract(cloud)
        rx = pipe_x.extract(cloud)
        assert rh.num_keypoints == rx.num_keypoints, name
        assert rh.num_keypoints >= 1, name
        assert np.isfinite(rh.features).all(), name
        np.testing.assert_array_equal(rh.keypoints, rx.keypoints, err_msg=name)
        np.testing.assert_allclose(rh.features, rx.features, rtol=1e-4,
                                   atol=1e-5, err_msg=name)


def test_transposed_merge_matches_original(rng):
    """The r3 transposed merge (MXU candidate routing + free-slot-rank
    buffer shifts) must reproduce the original merge's RAW buffers exactly
    — same selected coords/keys, same counts, sentinels included."""
    from feat3dnet_tpu.ops.hash_grid import (_bq_sorted_raw, _bq_sorted_raw_t,
                                             sort_centers)

    n = 600
    xyz = (rng.rand(n, 3).astype(np.float32) - 0.5) * 12
    xyz[:200] = xyz[:1] + rng.randn(200, 3).astype(np.float32) * 0.5
    valid = rng.rand(n) > 0.15
    sc = build_sorted_cloud(jnp.asarray(xyz), jnp.asarray(valid),
                            cell_size=1.5, block_size=64)
    ctr, _ = sort_centers(jnp.asarray(xyz[:160]))
    for ns in (8, 16):
        t0, c0 = _bq_sorted_raw(sc.pts4, sc.blk_bbox, ctr, 1.5, ns,
                                tile=32, interpret=True)
        t1, c1 = _bq_sorted_raw_t(sc.pts4, sc.blk_bbox, ctr, 1.5, ns,
                                  tile=32, interpret=True)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c0))
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t0))


def test_fori_merge_matches_grid(rng):
    """The fori-loop driver (blocks looped in-kernel over the VMEM-resident
    cloud) must reproduce the 2-D-grid transposed driver's RAW buffers
    bit-for-bit — same coords/keys/counts, sentinels included — across
    saturated hotspots, invalid points, and both saturating and
    non-saturating ns."""
    from feat3dnet_tpu.ops.hash_grid import (_bq_sorted_raw_t,
                                             _bq_sorted_raw_t_fori,
                                             sort_centers)

    n = 600
    xyz = (rng.rand(n, 3).astype(np.float32) - 0.5) * 12
    xyz[:200] = xyz[:1] + rng.randn(200, 3).astype(np.float32) * 0.5
    valid = rng.rand(n) > 0.15
    sc = build_sorted_cloud(jnp.asarray(xyz), jnp.asarray(valid),
                            cell_size=1.5, block_size=64)
    ctr, _ = sort_centers(jnp.asarray(xyz[:160]))
    for ns in (8, 16):
        t0, c0 = _bq_sorted_raw_t(sc.pts4, sc.blk_bbox, ctr, 1.5, ns,
                                  tile=32, interpret=True)
        t1, c1 = _bq_sorted_raw_t_fori(sc.pts4, sc.blk_bbox, ctr, 1.5, ns,
                                       tile=32, interpret=True)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c0))
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t0))


def test_ball_max_grid_matches_fori(rng):
    """The large-cloud 2-D-grid ball-max driver must stay bit-equal to the
    fori driver (the default below _FORI_MAX_POINTS) — without this,
    routing by cloud size would leave the grid path untested."""
    from feat3dnet_tpu.ops.hash_grid import ball_max_sorted

    n, radius = 600, 1.5
    xyz = _clouds(rng, n, spread=12.0, clusters=3)
    valid = rng.rand(n) > 0.15
    att = (rng.rand(n).astype(np.float32) + 0.01)
    sc = build_sorted_cloud(jnp.asarray(xyz), jnp.asarray(valid),
                            cell_size=radius, block_size=64)
    att_sorted = jnp.asarray(att)[sc.orig_idx]
    bm_fori = ball_max_sorted(sc.pts4, sc.blk_bbox, att_sorted, radius,
                              tile=32)
    bm_grid = ball_max_sorted(sc.pts4, sc.blk_bbox, att_sorted, radius,
                              tile=32, max_fori_points=0)
    np.testing.assert_array_equal(np.asarray(bm_grid), np.asarray(bm_fori))


def test_planes_path_matches_grouped_and_detector(rng):
    """Lane-dense planes path (r4): (a) un-transposing the raw planes +
    repeat-pad must reproduce ball_query_grouped_sorted BIT-exactly (the
    epilogue is pure data movement); (b) the planes detector kernel must
    match the XLA detector tower on the same neighborhoods."""
    import jax
    from feat3dnet_tpu.config import ModelConfig
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.ops.fused_describe import (folded_weights,
                                                  fused_detect_planes_t,
                                                  transpose_folded_weights)
    from feat3dnet_tpu.ops.hash_grid import (SortedCloud, _finish_grouped,
                                             ball_query_grouped_sorted,
                                             ball_query_planes_sorted,
                                             build_sorted_cloud_host,
                                             planes_cnt_rows, unplane)

    n, L, tc, ns, r = 768, 64, 32, 8, 1.5
    pts = _clouds(rng, n, spread=12.0, clusters=4)
    sc = build_sorted_cloud_host(pts, np.ones(n, bool), cell_size=r,
                                 block_size=L)
    scd = SortedCloud(pts4=jnp.asarray(sc.pts4),
                      blk_bbox=jnp.asarray(sc.blk_bbox), orig_idx=None,
                      inv_perm=None, block_size=0)
    centers = scd.pts4[:, :3]

    grouped, idx, cnt = ball_query_grouped_sorted(scd, centers, r, ns, tile=tc)
    planes, cnt_plane = ball_query_planes_sorted(scd, centers, r, ns, tile=tc)

    top = jnp.stack([unplane(p, ns, n) for p in planes], axis=-1)
    cnt_rows = planes_cnt_rows(cnt_plane, n, tc)
    g2, i2, c2 = _finish_grouped(top, cnt_rows, centers, ns)
    np.testing.assert_array_equal(np.asarray(grouped), np.asarray(g2))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(cnt), np.asarray(c2))

    # (b) planes detector vs the XLA detector tower
    cfg = ModelConfig(num_clusters=-1, num_samples=ns, feature_dim=16,
                      base_scale=r, detector_mlp=(8, 16), detector_mlp2=(8,),
                      descriptor_mlp=(8, 8))
    model = Feat3DNet(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 3)),
                   training=False)
    v = jax.tree.map(lambda x: x + 0.05 if x.ndim == 1 else x, v)
    normalized = (grouped - centers[:, None, :]) / r
    att_ref, ori_ref = model.apply(v, normalized[None], training=False,
                                   method=Feat3DNet.detect_clusters)
    wt = transpose_folded_weights(folded_weights(v, cfg))
    att_p, ori_p = fused_detect_planes_t(wt, planes, cnt_plane, centers, cfg)
    np.testing.assert_allclose(np.asarray(att_p), np.asarray(att_ref[0]),
                               rtol=1e-4, atol=1e-5)
    # compare orientations as unit vectors (angles wrap at ±pi)
    np.testing.assert_allclose(
        np.asarray(jnp.cos(ori_p - ori_ref[0])), 1.0, atol=1e-6)


def test_pack_planes_keypoints_t_bit_exact(rng):
    """r5 planes-consuming descriptor tail: gathering keypoint clusters
    straight from the lane-dense planes into the transposed kernel's
    (ns·8, K) layout must be BIT-identical to the rank-3 route (unplane ->
    repeat-pad -> subtract center -> pack_clusters_lanes) — it is pure
    data movement."""
    from feat3dnet_tpu.ops.fused_describe import (pack_clusters_lanes_jnp,
                                                  pack_planes_keypoints_t)
    from feat3dnet_tpu.ops.hash_grid import (SortedCloud,
                                             ball_query_planes_sorted,
                                             build_sorted_cloud_host,
                                             planes_cnt_rows, unplane)

    n, L, tc, ns, r = 768, 64, 32, 8, 1.5
    pts = _clouds(rng, n, spread=12.0, clusters=4)
    sc = build_sorted_cloud_host(pts, np.ones(n, bool), cell_size=r,
                                 block_size=L)
    scd = SortedCloud(pts4=jnp.asarray(sc.pts4),
                      blk_bbox=jnp.asarray(sc.blk_bbox), orig_idx=None,
                      inv_perm=None, block_size=0)
    centers = scd.pts4[:, :3]
    planes, cnt_plane = ball_query_planes_sorted(scd, centers, r, ns, tile=tc)

    kp_s = jnp.asarray(np.concatenate([
        rng.choice(n, 60, replace=False), [0, 0, n - 1, n - 1]]).astype(np.int32))

    # rank-3 reference route (the r4 tail)
    gx = unplane(planes[0], ns, n)[kp_s]
    gy = unplane(planes[1], ns, n)[kp_s]
    gz = unplane(planes[2], ns, n)[kp_s]
    cnt_kp = jnp.minimum(planes_cnt_rows(cnt_plane, n, tc)[kp_s],
                         jnp.float32(ns))
    slot = jnp.arange(ns, dtype=jnp.float32)
    filled = slot[None, :] < cnt_kp[:, None]
    gath = jnp.stack([gx, gy, gz], axis=-1)
    clusters_kp = jnp.where(filled[..., None], gath, gath[:, 0:1, :])
    offs = clusters_kp - centers[kp_s][:, None, :]
    want = pack_clusters_lanes_jnp(offs)

    got = pack_planes_keypoints_t(planes, cnt_plane, kp_s, centers[kp_s],
                                  ns, tc)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_finish_planes_bit_exact(rng):
    """finish_planes must equal _finish_grouped(unplane-stack) per
    coordinate BIT-exactly — the r5 default extract's bit contract
    (hashed == dense, batch == single) rests on it."""
    from feat3dnet_tpu.ops.hash_grid import (SortedCloud, _finish_grouped,
                                             ball_query_planes_sorted,
                                             build_sorted_cloud_host,
                                             finish_planes, planes_cnt_rows,
                                             unplane)

    n, L, tc, ns, r = 768, 64, 32, 8, 1.5
    pts = _clouds(rng, n, spread=12.0, clusters=4)
    sc = build_sorted_cloud_host(pts, np.ones(n, bool), cell_size=r,
                                 block_size=L)
    scd = SortedCloud(pts4=jnp.asarray(sc.pts4),
                      blk_bbox=jnp.asarray(sc.blk_bbox), orig_idx=None,
                      inv_perm=None, block_size=0)
    centers = scd.pts4[:, :3]
    planes, cnt_plane = ball_query_planes_sorted(scd, centers, r, ns, tile=tc)

    top = jnp.stack([unplane(p, ns, n) for p in planes], axis=-1)
    cnt_rows = planes_cnt_rows(cnt_plane, n, tc)
    want, _, want_cnt = _finish_grouped(top, cnt_rows, centers, ns)

    gx, gy, gz, cnt = finish_planes(planes, cnt_plane, centers, ns, n, tc)
    np.testing.assert_array_equal(np.asarray(cnt), np.asarray(want_cnt))
    got = jnp.stack([gx, gy, gz], axis=-1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_default_planes_extract_bit_equal(rng, monkeypatch):
    """The r5 default-path planes feed (F3D_DEFAULT_PLANES=1, the default)
    must reproduce the grouped route's extract BIT-exactly: keypoints,
    attention, and descriptors — the planes feed is pure data movement
    into the identical chunked XLA detector and descriptor."""
    import jax
    from feat3dnet_tpu.config import InferenceConfig, ModelConfig
    from feat3dnet_tpu.inference import InferencePipeline
    from feat3dnet_tpu.models import Feat3DNet

    cfg = ModelConfig(num_clusters=-1, num_samples=8, feature_dim=16,
                      base_scale=2.0, detector_mlp=(8, 16), detector_mlp2=(8,),
                      descriptor_mlp=(8, 8))
    model = Feat3DNet(cfg)
    v = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 3)),
                   training=False)
    pts = np.concatenate([
        rng.randn(300, 3).astype(np.float32) * 2.0 + off
        for off in np.array([[0, 0, 0], [8, 0, 0], [0, 9, 0]], np.float32)])
    icfg = InferenceConfig(keypoint_chunk=256, max_keypoints=64,
                           nms_radius=1.0, use_hashed_grouping=True)

    monkeypatch.setenv("F3D_DEFAULT_PLANES", "0")
    res_g = InferencePipeline(model, v, cfg, icfg).extract(pts)
    monkeypatch.setenv("F3D_DEFAULT_PLANES", "1")
    res_p = InferencePipeline(model, v, cfg, icfg).extract(pts)

    assert res_g.num_keypoints == res_p.num_keypoints
    np.testing.assert_array_equal(res_g.keypoints, res_p.keypoints)
    np.testing.assert_array_equal(res_g.attention, res_p.attention)
    np.testing.assert_array_equal(res_g.features, res_p.features)


def test_ablate_kernel_t_shapes(rng):
    """Bench-only _t ablation bodies compile (interpret) and keep the
    output contract shapes."""
    from feat3dnet_tpu.config import ModelConfig
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.ops.fused_describe import (
        folded_weights, fused_describe_clusters_t, pack_clusters_lanes,
        transpose_folded_weights)

    ns = 8
    cfg = ModelConfig(num_clusters=-1, num_samples=ns, feature_dim=16,
                      detector_mlp=(8, 16), detector_mlp2=(8,),
                      descriptor_mlp=(8, 8))
    model = Feat3DNet(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 3)),
                   training=False)
    wt = transpose_folded_weights(folded_weights(v, cfg))
    clusters = rng.randn(12, ns, 3).astype(np.float32)
    packed = jnp.asarray(pack_clusters_lanes(clusters))
    for mode in ("stream", "matmul"):
        d, a = fused_describe_clusters_t(wt, packed, cfg, tile=8,
                                         ablate=mode)
        assert d.shape == (12, 16) and a.shape == (12,)


def test_planes_detector_unfolded_tight(rng):
    """fused_detect_planes_t(unfolded=True) vs the XLA detector tower on
    the same neighborhoods: raw Dense + replayed flax BN must agree far
    inside the folded variant's serving envelope (non-power-of-two radius
    exercises the division-vs-reciprocal normalization too)."""
    import jax
    from feat3dnet_tpu.config import ModelConfig
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.ops.fused_describe import (
        detector_weights_unfolded, fused_detect_planes_t,
        transpose_unfolded_detector)
    from feat3dnet_tpu.ops.hash_grid import (SortedCloud,
                                             ball_query_grouped_sorted,
                                             ball_query_planes_sorted,
                                             build_sorted_cloud_host)

    n, L, tc, ns, r = 768, 64, 32, 8, 1.5
    pts = _clouds(rng, n, spread=12.0, clusters=4)
    sc = build_sorted_cloud_host(pts, np.ones(n, bool), cell_size=r,
                                 block_size=L)
    scd = SortedCloud(pts4=jnp.asarray(sc.pts4),
                      blk_bbox=jnp.asarray(sc.blk_bbox), orig_idx=None,
                      inv_perm=None, block_size=0)
    centers = scd.pts4[:, :3]
    grouped, _, _ = ball_query_grouped_sorted(scd, centers, r, ns, tile=tc)
    planes, cnt_plane = ball_query_planes_sorted(scd, centers, r, ns, tile=tc)

    cfg = ModelConfig(num_clusters=-1, num_samples=ns, feature_dim=16,
                      base_scale=r, detector_mlp=(8, 16), detector_mlp2=(8,),
                      descriptor_mlp=(8, 8))
    model = Feat3DNet(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 3)),
                   training=False)
    v = jax.tree.map(lambda x: x + 0.05 if x.ndim == 1 else x, v)
    normalized = (grouped - centers[:, None, :]) / r
    att_ref, ori_ref = model.apply(v, normalized[None], training=False,
                                   method=Feat3DNet.detect_clusters)
    wt = transpose_unfolded_detector(detector_weights_unfolded(v, cfg))
    att_p, ori_p = fused_detect_planes_t(wt, planes, cnt_plane, centers,
                                         cfg, unfolded=True)
    np.testing.assert_allclose(np.asarray(att_p), np.asarray(att_ref[0]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(jnp.cos(ori_p - ori_ref[0])), 1.0, atol=1e-9)
