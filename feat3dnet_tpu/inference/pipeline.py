"""Two-pass inference: attention everywhere → NMS → descriptors at keypoints.

Reference flow (/root/reference/inference.py:66-180):
  pass 1 — attention for EVERY point, computed in 30k-point chunks through
  a feed of end_points['keypoints'] (:121-137); host sklearn ball-tree NMS
  (:226-261); pass 2 — descriptors at the NMS keypoints (:169-171); write
  [xyz | descriptor] float32 rows (:174-177).

TPU-native redesign:
  * static shape buckets: the cloud is padded (with a validity mask) to the
    smallest POINT_BUCKETS size; jitted executables are cached per bucket;
  * the 30k-point chunk loop becomes a lax.map over fixed-size keypoint
    chunks inside ONE jit — no per-chunk host round-trips;
  * NMS runs on-device (ops/nms.py) — no sklearn, no host sync between the
    passes; the only host↔device traffic is cloud in, results out.
"""
from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from feat3dnet_tpu.config import InferenceConfig, ModelConfig, bucket_for
from feat3dnet_tpu.data.io import load_point_cloud, save_descriptors
from feat3dnet_tpu.models.feat3dnet import Feat3DNet
from feat3dnet_tpu.ops import nms_keypoints

Array = jax.Array


@dataclasses.dataclass
class InferenceResult:
    keypoints: np.ndarray      # (K, 3)
    features: np.ndarray       # (K, D)
    attention: np.ndarray      # (K,)
    num_keypoints: int


class InferencePipeline:
    """Caches per-bucket jitted executables for the two-pass extraction."""

    def __init__(self, model: Feat3DNet, variables, model_cfg: ModelConfig,
                 infer_cfg: InferenceConfig = InferenceConfig(),
                 mesh=None, cloud_mesh=None):
        """mesh: optional jax.sharding.Mesh — the attention pass then shards
        the keypoint axis across devices (parallel/point_parallel.py)
        instead of chunking on one device (LATENCY mode: many chips, one
        big cloud).

        cloud_mesh: optional jax.sharding.Mesh — extract_batch /
        extract_many(batch_size>1) then place one sub-batch of clouds per
        device (THROUGHPUT mode: many chips, a stream of clouds; see
        _extract_batch_mesh_fn). Mutually exclusive with mesh — they
        compete for the same devices."""
        if mesh is not None and cloud_mesh is not None:
            raise ValueError("pass either mesh (latency sharding) or "
                             "cloud_mesh (cloud-per-device throughput), not both")
        self.model = model
        self.variables = variables
        self.mcfg = model_cfg
        self.icfg = infer_cfg
        self.mesh = mesh
        self.cloud_mesh = cloud_mesh
        self._attention_fns: Dict[int, callable] = {}
        self._extract_fns: Dict[int, callable] = {}
        self._describe_fns: Dict[Tuple[int, int], callable] = {}

    def warmup(self, point_counts=(), clouds=None, batch_sizes=(1,),
               seed: int = 0) -> Dict[tuple, float]:
        """Pre-compile the extraction executables a deployment will serve
        (SERVING.md: first compile of a shape is 30–400 s through a remote
        compile service — pay it at startup, not on the first request).

        Args:
          point_counts: cloud sizes to warm; each maps to its static
            bucket (`config.POINT_BUCKETS`) and one synthetic cloud of
            that size drives a throwaway extract. Covers the default
            pipeline exactly (the dense hashed executables are keyed only
            by bucket + layout, never by cloud content).
          clouds: optional REPRESENTATIVE clouds to warm with instead —
            required for content-keyed configurations (use_csr_kernels
            buckets executables by per-cloud hit counts; hash_block=0
            picks the layout from cloud density), where synthetic uniform
            clouds would compile the wrong variants.
          batch_sizes: extract_batch sizes to warm per cloud size (1 =
            the single-cloud path).
        Returns {(n_points, batch_size): seconds} compile+run times.
        """
        import time as _time

        rng = np.random.RandomState(seed)
        work = [(int(n), None) for n in point_counts]
        work += [(c.shape[0], c) for c in (clouds or [])]
        out: Dict[tuple, float] = {}
        for n, cloud in work:
            if cloud is None:
                nb = bucket_for(min(n, self.icfg.num_points)
                                if self.icfg.num_points > 0 else n)
                cloud = (rng.rand(nb, 3).astype(np.float32) - 0.5) * 40.0
            for b in batch_sizes:
                t0 = _time.time()
                if b <= 1:
                    self.extract(cloud)
                else:
                    self.extract_batch(
                        [cloud + np.float32(0.1) * i for i in range(b)])
                out[(n, b)] = _time.time() - t0
        return out

    # -- jit builders -----------------------------------------------------

    def _chunk_size(self, n_bucket: int) -> int:
        """Largest power of two <= keypoint_chunk that divides n_bucket
        (buckets are power-of-two multiples, so this always exists). A
        non-dividing chunk would make lax.dynamic_slice clamp the last
        chunk's start and silently misalign the concatenated results."""
        c = 1
        while c * 2 <= min(self.icfg.keypoint_chunk, n_bucket) and n_bucket % (c * 2) == 0:
            c *= 2
        return c

    def _chunked_attention(self, n_bucket: int):
        """Traceable (variables, cloud, valid_mask) -> attention (n_bucket,)
        via fixed-size keypoint chunks under lax.map. Shared by the
        standalone attention pass and the fused extract."""
        chunk = self._chunk_size(n_bucket)
        n_chunks = n_bucket // chunk

        def attention(variables, cloud, valid_mask):
            xyz = cloud[..., :3]

            def one_chunk(start):
                kp = jax.lax.dynamic_slice_in_dim(xyz, start, chunk, axis=1)
                out = self.model.apply(variables, cloud, training=False,
                                       keypoints=kp, valid_mask=valid_mask)
                return out.end_points["attention"][0], out.end_points["orientation"][0]

            starts = jnp.arange(n_chunks) * chunk
            att, ori = jax.lax.map(one_chunk, starts)
            return att.reshape(-1), ori.reshape(-1)

        return attention

    def _attention_fn(self, n_bucket: int):
        """attention+xyz for every point of a padded (1, n_bucket) cloud."""
        if n_bucket in self._attention_fns:
            return self._attention_fns[n_bucket]

        if self.mesh is not None:
            from feat3dnet_tpu.parallel.point_parallel import keypoint_sharded_attention

            sharded = keypoint_sharded_attention(self.model, self.mesh)

            def fn(variables, cloud, valid_mask):
                att, _ = sharded(variables, cloud, valid_mask)
                return att, None

            self._attention_fns[n_bucket] = fn
            return fn

        if self._use_hashed():
            impl = jax.jit(self._hashed_attention_impl(n_bucket))

            def fn(variables, cloud, valid_mask):
                return impl(variables, *self._host_sort(cloud, valid_mask))
        else:
            fn = jax.jit(self._chunked_attention(n_bucket))
        self._attention_fns[n_bucket] = fn
        return fn

    def _use_hashed(self) -> bool:
        flag = self.icfg.use_hashed_grouping
        if flag is None:
            return jax.default_backend() == "tpu"
        return flag

    def _hashed_attention_sorted(self, n_bucket: int,
                                 chunk_override: Optional[int] = None):
        """Traceable (variables, pts4, blk_bbox) -> (attention, orientation)
        in SORTED (Morton-block) point order, via the spatially-pruned
        grouping kernel (ops/hash_grid.py) + the detector tower on the
        precomputed clusters. Index-exact vs the dense path (selection is
        the ns smallest original indices, the same slot order), so the
        attention values match the chunked XLA path.

        chunk_override: the batched extract passes the SINGLE-cloud chunk
        size so each lax.map detector chunk is shape-identical (and, with
        cloud-aligned boundaries, input-identical) to the single-cloud
        path's chunks — the per-cloud bit-equality contract then does not
        rest on XLA matmul results being invariant to the leading dim."""
        from feat3dnet_tpu.models.feat3dnet import Feat3DNet
        from feat3dnet_tpu.ops.hash_grid import SortedCloud, ball_query_grouped_sorted

        r = float(self.mcfg.base_scale)
        ns = self.mcfg.num_samples
        chunk = chunk_override or self._chunk_size(n_bucket)
        assert n_bucket % chunk == 0
        n_chunks = n_bucket // chunk

        def detector_on_grouped(variables, grouped, centers_sorted):
            if self.icfg.use_fused_detector:
                # fused detector-only kernel, unfolded-BN weights: raw
                # Dense + replayed flax BN matches the XLA detector's
                # per-op rounding (~1e-6 agreement vs the folded variant's
                # ~1e-2 serving envelope — see detector_weights_unfolded)
                from feat3dnet_tpu.ops.fused_describe import (
                    detector_weights_unfolded, fused_detect_clusters_2d)

                offs = grouped - centers_sorted[:, None, :]
                return fused_detect_clusters_2d(
                    detector_weights_unfolded(variables, self.mcfg), offs,
                    self.mcfg, unfolded=True)

            normalized = (grouped - centers_sorted[:, None, :]) / r

            def one_chunk(start):
                g = jax.lax.dynamic_slice_in_dim(normalized, start, chunk, axis=0)
                att, ori = self.model.apply(
                    variables, g[None], training=False,
                    method=Feat3DNet.detect_clusters)
                return att[0], ori[0]

            starts = jnp.arange(n_chunks) * chunk
            att_s, ori_s = jax.lax.map(one_chunk, starts)
            return att_s.reshape(-1), ori_s.reshape(-1)

        def detector_on_gxyz(variables, gx, gy, gz, centers_sorted):
            """The chunked XLA detector fed from per-coordinate (M, ns)
            planes (ops/hash_grid.finish_planes): the same values, chunk
            boundaries, and model.apply as detector_on_grouped — outputs
            BIT-identical — but the full (M, ns, 3) grouped tensor (42x
            lane-padded: 4 GiB physical at 131k, the r4 extract
            roofline's top memory line) never exists; each lax.map
            iteration assembles only its own (chunk, ns, 3) slice."""
            nx = (gx - centers_sorted[:, 0:1]) / r
            ny = (gy - centers_sorted[:, 1:2]) / r
            nz = (gz - centers_sorted[:, 2:3]) / r

            def one_chunk(start):
                g = jnp.stack(
                    [jax.lax.dynamic_slice_in_dim(a, start, chunk, axis=0)
                     for a in (nx, ny, nz)], axis=-1)
                att, ori = self.model.apply(
                    variables, g[None], training=False,
                    method=Feat3DNet.detect_clusters)
                return att[0], ori[0]

            starts = jnp.arange(n_chunks) * chunk
            att_s, ori_s = jax.lax.map(one_chunk, starts)
            return att_s.reshape(-1), ori_s.reshape(-1)

        def attention_sorted(variables, pts4, blk_bbox):
            sc = SortedCloud(pts4=pts4, blk_bbox=blk_bbox, orig_idx=None,
                             inv_perm=None, block_size=0)
            centers_sorted = pts4[:, :3]
            grouped, _, _ = ball_query_grouped_sorted(sc, centers_sorted, r, ns)
            return detector_on_grouped(variables, grouped, centers_sorted)

        attention_sorted.detector_on_grouped = detector_on_grouped
        attention_sorted.detector_on_gxyz = detector_on_gxyz
        return attention_sorted

    def _hashed_attention_impl(self, n_bucket: int):
        """Traceable (variables, pts4, blk_bbox, inv_perm) -> attention in
        ORIGINAL point order. The Morton sort runs on the HOST
        (build_sorted_cloud_host) — the cloud is host-resident at pipeline
        entry, np.argsort is microseconds, and the XLA bitonic sort at
        >=16k points costs tens of minutes of TPU compile time."""
        core = self._hashed_attention_sorted(n_bucket)

        def attention(variables, pts4, blk_bbox, inv_perm):
            att_s, ori_s = core(variables, pts4, blk_bbox)
            return att_s[inv_perm], ori_s[inv_perm]

        return attention

    def _host_sort(self, cloud_j, valid_j):
        """Host-side Morton layout for the hashed path (numpy, ~ms)."""
        from feat3dnet_tpu.ops.hash_grid import build_sorted_cloud_host

        sc = build_sorted_cloud_host(np.asarray(cloud_j[0, :, :3]),
                                     np.asarray(valid_j[0]),
                                     cell_size=float(self.mcfg.base_scale),
                                     block_size=self._HASH_BLOCK)
        return jnp.asarray(sc.pts4), jnp.asarray(sc.blk_bbox), jnp.asarray(sc.inv_perm)

    # Morton block / center-tile sizes for the hashed path come from
    # InferenceConfig (hash_block divides every POINT_BUCKET, so the
    # sorted layout size np_ == n_bucket). hash_block=0 means AUTO —
    # paths that support the per-cloud choice call _layout_for and thread
    # the result through their executable-cache keys; the remaining paths
    # (mesh-sharded extract, external-keypoint attention) use this fixed
    # fallback.
    @property
    def _HASH_BLOCK(self) -> int:
        return self.icfg.hash_block or 256

    @property
    def _HASH_TILE(self) -> int:
        return self.icfg.hash_tile

    def _layout_for(self, xyz: np.ndarray) -> Tuple[int, int]:
        """Per-cloud Morton layout (block, tile): config-pinned, or — under
        hash_block=0 — density-keyed: saturated clouds (estimated ball
        population >= num_samples) take 128-pt culling blocks (measured
        −12 % on the kitti 29k cloud), unsaturated ones the 120k-scale
        optimum 256. Outputs are bit-identical across layouts (the
        grouping/NMS contracts are layout-independent); only speed and the
        executable key differ. Pure host numpy — safe on prep threads."""
        if self.icfg.hash_block:
            return self.icfg.hash_block, self.icfg.hash_tile
        from feat3dnet_tpu.ops.hash_grid import estimate_ball_points

        est = estimate_ball_points(xyz, float(self.mcfg.base_scale))
        block = 128 if est >= self.mcfg.num_samples else 256
        return block, self.icfg.hash_tile

    @staticmethod
    def packed_offsets(nb: int, s_att: int):
        """Offsets into the packed upload buffer (single source of truth
        for the [pts4 | inv_perm | att CSR | nms CSR] layout): returns
        (inv_perm_off, att_csr_off, nms_csr_off)."""
        return nb * 4, nb * 5, nb * 5 + 2 * s_att

    def _host_sort_packed(self, padded_np: np.ndarray, valid_np: np.ndarray,
                          layout: Optional[Tuple[int, int]] = None):
        """One flat f32 upload buffer:
        [pts4 | inv_perm | att CSR (tile_of, blk_of) | nms CSR].

        Every host->device array is its own ~40 ms tunnel round-trip, so the
        hashed extract ships exactly ONE array per cloud. The original-order
        cloud and validity are reconstructed on device from pts4 + inv_perm
        (invalid points sit at +1e9, which the valid_mask paths treat
        identically to the original zero padding). The two hit lists (the
        grouping radius and the NMS radius) drive the CSR kernels — only
        bbox-passing (tile, block) pairs are visited; lengths are bucketed
        to powers of two, and the executable is cached per
        (n_bucket, s_att, s_nms). Returns (packed, s_att, s_nms)."""
        from feat3dnet_tpu.ops.hash_grid import (build_hit_csr_host,
                                                 build_sorted_cloud_host)

        L, tc = layout or (self._HASH_BLOCK, self._HASH_TILE)
        sc = build_sorted_cloud_host(padded_np[0, :, :3], valid_np[0],
                                     cell_size=float(self.mcfg.base_scale),
                                     block_size=L)
        # indices ride the packed buffer as f32, exact only below 2^24;
        # bucket_for() is unbounded, so fail loudly instead of silently
        # corrupting the permutation on a >16.7M-point cloud
        if padded_np.shape[1] >= (1 << 24):
            raise ValueError(
                f"packed f32 transfer supports < 2^24 points per cloud, got "
                f"{padded_np.shape[1]}; split the cloud or extend the packed "
                f"layout to int32 indices")
        base = [sc.pts4.ravel(),
                sc.inv_perm.astype(np.float32)]
        if not self.icfg.use_csr_kernels:
            return np.concatenate(base), 0, 0
        centers = sc.pts4[:, :3]
        t_att, b_att = build_hit_csr_host(
            centers, sc.blk_bbox, float(self.mcfg.base_scale), tc)
        t_nms, b_nms = build_hit_csr_host(
            centers, sc.blk_bbox, float(self.icfg.nms_radius), tc)
        packed = np.concatenate(base + [
            t_att.astype(np.float32), b_att.astype(np.float32),
            t_nms.astype(np.float32), b_nms.astype(np.float32),
        ])
        return packed, t_att.size, t_nms.size

    def _describe_at_keypoints(self, variables, offs, ori):
        """Descriptor tail shared by the single-cloud and batched fused
        extracts: (M, ns, 3) RAW keypoint-cluster offsets (gathered from
        the attention pass — no second ball query) + (M,) detector
        orientations -> (M, D) descriptors. Routes through the fused
        whole-forward serving kernel under use_fused_detector (it
        re-derives membership/orientation internally — serving rounding
        envelope), the bit-compatible XLA descriptor tower otherwise."""
        if self.icfg.use_fused_detector:
            from feat3dnet_tpu.ops.fused_describe import (
                folded_weights, fused_describe_clusters_2d)

            feats, _ = fused_describe_clusters_2d(
                folded_weights(variables, self.mcfg), offs, self.mcfg)
            return feats
        normalized = offs[None] / float(self.mcfg.base_scale)
        if self.mcfg.regress_orientation:
            from feat3dnet_tpu.models.feat3dnet import _rotate_z

            normalized = _rotate_z(normalized, ori[None])
        return self.model.apply(variables, normalized, training=False,
                                 method=Feat3DNet.describe_clusters)[0]

    def _extract_fn(self, n_bucket: int,
                    csr_sizes: Optional[Tuple[int, int]] = None,
                    layout: Optional[Tuple[int, int]] = None):
        """Fused single-dispatch extraction: attention everywhere (hashed
        CSR fast path on TPU, chunked XLA otherwise) → on-device NMS (the
        spatially-pruned ball-max kernel on the hashed path, the dense
        streamed max otherwise) → descriptors at the NMS keypoints, one
        executable per (bucket, CSR-length buckets). One host round-trip
        per cloud instead of three (the tunnel RTT is ~40 ms, comparable
        to the whole device computation)."""
        key = (n_bucket, csr_sizes, layout)
        if key in self._extract_fns:
            return self._extract_fns[key]

        icfg = self.icfg

        def describe(variables, cloud, valid_mask, kp, kp_att, num):
            out = self.model.apply(variables, cloud, training=False,
                                   keypoints=kp, valid_mask=valid_mask)
            return kp[0], out.features[0], kp_att[0], num[0]

        def tail(variables, cloud, valid_mask, att):
            xyz = cloud[..., :3]
            kp, kp_att, num = nms_keypoints(
                xyz, att[None, :], icfg.nms_radius, icfg.max_keypoints,
                icfg.min_response_ratio, valid_mask=valid_mask)
            return describe(variables, cloud, valid_mask, kp, kp_att, num)

        if self._use_hashed():
            from feat3dnet_tpu.ops.hash_grid import (
                _FORI_MAX_POINTS_MERGE, SortedCloud, ball_max_csr,
                ball_max_sorted, ball_query_grouped_csr,
                ball_query_grouped_sorted, ball_query_planes_sorted,
                finish_planes, planes_cnt_rows, unplane)
            from feat3dnet_tpu.ops.nms import select_keypoints

            core = self._hashed_attention_sorted(n_bucket)
            nb = n_bucket
            k_max = icfg.max_keypoints
            s_att, s_nms = csr_sizes
            r = float(self.mcfg.base_scale)
            ns = self.mcfg.num_samples
            L, tc = layout or (self._HASH_BLOCK, self._HASH_TILE)
            # planes mode (r4): under the fused-detector opt-in, keep the
            # attention pass entirely in the merge kernel's lane-dense
            # plane layout — no (M, ns, 3/4) materialization (32× lane
            # padding; see BENCHMARKS.md extract roofline) and no rank-3
            # detector input. Descriptor clusters gather from un-transposed
            # single planes (bit-identical data movement).
            use_planes = (icfg.use_fused_detector
                          and not icfg.use_csr_kernels
                          and nb <= _FORI_MAX_POINTS_MERGE
                          and ns % 8 == 0
                          # A/B escape hatch (benchmarks/probe_planes_ab):
                          # 0 = the pre-r4 fused path (epilogue + rank-3
                          # fused_detect_clusters_2d); read at build time
                          and os.environ.get("F3D_PLANES", "1") != "0")
            # r5 descriptor tail A/B (benchmarks/probe_planes_desc_ab):
            # 0 = the r4 tail (unplane row-gather -> (K, ns, 3) ->
            # fused_describe_clusters_2d); read at build time
            use_planes_desc = os.environ.get("F3D_PLANES_DESC", "1") != "0"
            # r5 DEFAULT-path planes feed: same structural conditions, but
            # the detector stays the chunked XLA tower, fed per-chunk from
            # finish_planes' per-coordinate (M, ns) arrays — outputs
            # BIT-identical to the grouped route (pure data movement +
            # identical elementwise/matmul graphs), while the 42x
            # lane-padded (M, ns, 3) grouped tensor never exists. A/B:
            # F3D_DEFAULT_PLANES=0 restores the grouped route.
            use_planes_xla = (not icfg.use_fused_detector
                              and not icfg.use_csr_kernels
                              and nb <= _FORI_MAX_POINTS_MERGE
                              and ns % 8 == 0
                              and os.environ.get("F3D_DEFAULT_PLANES",
                                                 "1") != "0")

            @jax.jit
            def impl(variables, packed):
                o_inv, o_att, o_nms = InferencePipeline.packed_offsets(nb, s_att)
                pts4 = packed[:o_inv].reshape(nb, 4)
                inv_perm = packed[o_inv:o_inv + nb].astype(jnp.int32)
                t_att = packed[o_att:o_att + s_att].astype(jnp.int32)
                b_att = packed[o_att + s_att:o_att + 2 * s_att].astype(jnp.int32)
                t_nms = packed[o_nms:o_nms + s_nms].astype(jnp.int32)
                b_nms = packed[o_nms + s_nms:o_nms + 2 * s_nms].astype(jnp.int32)
                cloud = pts4[inv_perm, :3][None]          # original order;
                valid_mask = (cloud[..., 0] < 5.0e8)      # invalid -> +1e9
                centers_sorted = pts4[:, :3]
                if icfg.use_csr_kernels:
                    sc = SortedCloud(pts4=pts4, blk_bbox=None, orig_idx=None,
                                     inv_perm=None, block_size=0)
                    grouped, _, _ = ball_query_grouped_csr(
                        sc, centers_sorted, t_att, b_att, r, ns,
                        block_size=L, tile=tc)
                else:
                    # block bboxes recomputed on device: a reshape-min/max,
                    # ~free vs shipping them in the packed buffer
                    blocks = centers_sorted.reshape(-1, L, 3)
                    blk_bbox = jnp.concatenate(
                        [jnp.min(blocks, axis=1), jnp.max(blocks, axis=1),
                         jnp.zeros((blocks.shape[0], 2), jnp.float32)], axis=1)
                    sc = SortedCloud(pts4=pts4, blk_bbox=blk_bbox,
                                     orig_idx=None, inv_perm=None,
                                     block_size=0)
                    if use_planes or use_planes_xla:
                        planes, cnt_plane = ball_query_planes_sorted(
                            sc, centers_sorted, r, ns, tile=tc)
                    else:
                        grouped, _, _ = ball_query_grouped_sorted(
                            sc, centers_sorted, r, ns, tile=tc)
                if use_planes:
                    from feat3dnet_tpu.ops.fused_describe import (
                        detector_weights_unfolded, fused_detect_planes_t,
                        transpose_unfolded_detector)

                    # unfolded-BN weights: XLA-parity rounding (~1e-6 vs
                    # the folded variant's ~1e-2 serving envelope)
                    att_s, ori_s = fused_detect_planes_t(
                        transpose_unfolded_detector(
                            detector_weights_unfolded(variables, self.mcfg)),
                        planes, cnt_plane, centers_sorted, self.mcfg,
                        unfolded=True)
                elif use_planes_xla:
                    gx, gy, gz, _ = finish_planes(planes, cnt_plane,
                                                  centers_sorted, ns, nb, tc)
                    att_s, ori_s = core.detector_on_gxyz(
                        variables, gx, gy, gz, centers_sorted)
                else:
                    att_s, ori_s = core.detector_on_grouped(
                        variables, grouped, centers_sorted)
                # NMS survival on the sorted layout: a point survives iff
                # its attention ties the ball max (same >= rule as
                # nms_keypoints; invalid points sit at +1e9 in pts4 so they
                # never enter a real ball).
                if icfg.use_csr_kernels:
                    ballmax = ball_max_csr(pts4, att_s, t_nms, b_nms,
                                           float(icfg.nms_radius),
                                           block_size=L, tile=tc)
                else:
                    ballmax = ball_max_sorted(pts4, sc.blk_bbox, att_s,
                                              float(icfg.nms_radius))
                is_max = (att_s >= ballmax)[inv_perm]
                att = att_s[inv_perm]
                kp, kp_att, num, kp_idx = select_keypoints(
                    cloud, att[None, :], is_max[None, :],
                    icfg.max_keypoints, icfg.min_response_ratio,
                    valid_mask=valid_mask, return_indices=True)
                # Descriptor pass WITHOUT a second ball query: the NMS
                # keypoints are cloud points, so their radius-2.0
                # neighborhoods (and detector orientations) were already
                # computed by the attention pass — gather them from the
                # sorted layout instead of re-grouping against the whole
                # cloud (bit-exact: the hashed grouping is index-exact vs
                # the dense ball query model.apply would run, and the
                # gathered ori_s equals the detector re-run on the same
                # clusters). Reference analogue: pass 2's re-feed of the
                # NMS keypoints, inference.py:169-171 — the re-grouping
                # there is an artifact of the placeholder graph, not a
                # semantic requirement.
                # inv_perm maps ORIGINAL index -> sorted row (cloud above is
                # pts4[inv_perm]), so it converts kp_idx directly.
                kp_s = inv_perm[kp_idx[0]]                   # sorted-domain idx
                if use_planes and use_planes_desc:
                    # r5: descriptor ALSO consumes the lane-dense planes —
                    # keypoint clusters gathered straight into the
                    # transposed serving kernel's (ns·8, K) layout, so the
                    # whole fused extract never materializes an
                    # (M/K, ns, 3) array (42× lane-padded HBM traffic).
                    from feat3dnet_tpu.ops.fused_describe import (
                        folded_weights, fused_describe_clusters_t,
                        pack_planes_keypoints_t, transpose_folded_weights)

                    clusters_p = pack_planes_keypoints_t(
                        planes, cnt_plane, kp_s, centers_sorted[kp_s],
                        ns, tc)
                    feats, _ = fused_describe_clusters_t(
                        transpose_folded_weights(
                            folded_weights(variables, self.mcfg)),
                        clusters_p, self.mcfg)
                else:
                    if use_planes:
                        # A/B fallback (F3D_PLANES_DESC=0): gather from
                        # single un-transposed planes (64-lane dense rows)
                        # + reference repeat-pad. Empty balls are
                        # impossible for real keypoints (every cloud
                        # point's ball contains itself).
                        gx = unplane(planes[0], ns, nb)[kp_s]   # (K, ns)
                        gy = unplane(planes[1], ns, nb)[kp_s]
                        gz = unplane(planes[2], ns, nb)[kp_s]
                        cnt_kp = jnp.minimum(
                            planes_cnt_rows(cnt_plane, nb, tc)[kp_s],
                            jnp.float32(ns))
                        slot = jnp.arange(ns, dtype=jnp.float32)
                        filled = slot[None, :] < cnt_kp[:, None]
                        gath = jnp.stack([gx, gy, gz], axis=-1)  # (K, ns, 3)
                        clusters_kp = jnp.where(filled[..., None], gath,
                                                gath[:, 0:1, :])
                        offs_kp = (clusters_kp
                                   - centers_sorted[kp_s][:, None, :])
                    elif use_planes_xla:
                        # gx/gy/gz are already repeat-padded and
                        # empty-handled (finish_planes == _finish_grouped
                        # per coordinate), so the row gather + stack is
                        # bit-identical to grouped[kp_s]
                        offs_kp = (jnp.stack([gx[kp_s], gy[kp_s], gz[kp_s]],
                                             axis=-1)
                                   - centers_sorted[kp_s][:, None, :])
                    else:
                        offs_kp = (grouped[kp_s]
                                   - centers_sorted[kp_s][:, None, :])
                    feats = self._describe_at_keypoints(variables, offs_kp,
                                                        ori_s[kp_s])
                # one flat f32 download buffer — see _host_sort_packed
                return jnp.concatenate([
                    kp[0].ravel(), feats.ravel(), kp_att[0].ravel(),
                    num.astype(jnp.float32)])

            def unpack(out):
                kp = out[:k_max * 3].reshape(k_max, 3)
                o = k_max * 3
                d = (out.shape[0] - 1 - o - k_max) // k_max
                feats = out[o:o + k_max * d].reshape(k_max, d)
                kp_att = out[o + k_max * d:-1]
                return kp, feats, kp_att, int(out[-1])

            def fn(variables, packed_np):
                return unpack(np.asarray(impl(variables, jnp.asarray(packed_np))))

            fn.impl = impl          # async dispatch half (extract_many)
            fn.unpack = unpack      # host-side finish half
        else:
            chunked = self._chunked_attention(n_bucket)

            @jax.jit
            def impl(variables, cloud, valid_mask):
                att, _ = chunked(variables, cloud, valid_mask)
                return tail(variables, cloud, valid_mask, att)

            def fn(variables, padded_np, valid_np):
                kp, feats, kp_att, num = jax.device_get(impl(
                    variables, jnp.asarray(padded_np), jnp.asarray(valid_np)))
                return kp, feats, kp_att, int(num)

        self._extract_fns[key] = fn
        return fn

    def _mesh_extract_fn(self, n_bucket: int):
        """End-to-end mesh-sharded extraction (parallel/point_parallel.py's
        make_sharded_extract), cached per bucket."""
        if not hasattr(self, "_mesh_extract_fns"):
            self._mesh_extract_fns = {}
        if n_bucket not in self._mesh_extract_fns:
            from feat3dnet_tpu.parallel.point_parallel import make_sharded_extract

            self._mesh_extract_fns[n_bucket] = make_sharded_extract(
                self.model, self.mesh, self.mcfg, self.icfg, n_bucket)
        return self._mesh_extract_fns[n_bucket]

    def _describe_fn(self, n_bucket: int, n_kp: int):
        """descriptors at (1, n_kp) keypoints of a padded cloud."""
        key = (n_bucket, n_kp)
        if key in self._describe_fns:
            return self._describe_fns[key]

        @jax.jit
        def fn(variables, cloud, valid_mask, keypoints):
            out = self.model.apply(variables, cloud, training=False,
                                   keypoints=keypoints, valid_mask=valid_mask)
            return out.features[0], out.end_points["attention"][0]

        self._describe_fns[key] = fn
        return fn

    # -- public API -------------------------------------------------------

    def _pad_to_bucket(self, cloud: np.ndarray,
                       rng: Optional[np.random.RandomState]):
        """Shared preprocessing for extract()/extract_many(): optional
        permutation + truncation, then pad to the static bucket with a
        validity mask. Returns (n, n_bucket, padded (1, nb, 3), valid)."""
        if rng is not None:
            cloud = cloud[rng.permutation(cloud.shape[0])]
        if self.icfg.num_points > 0:
            cloud = cloud[:self.icfg.num_points]
        n = cloud.shape[0]
        n_bucket = bucket_for(n)
        padded = np.zeros((1, n_bucket, 3), np.float32)
        padded[0, :n] = cloud[:, :3]
        valid = np.zeros((1, n_bucket), bool)
        valid[0, :n] = True
        return n, n_bucket, padded, valid

    def extract(self, cloud: np.ndarray,
                keypoints: Optional[np.ndarray] = None,
                rng: Optional[np.random.RandomState] = None) -> InferenceResult:
        """Extract keypoints + descriptors from one (N, >=3) cloud.

        Args:
          cloud: host array; padded internally to a static bucket.
          keypoints: optional (K, 3) externally-supplied keypoints (the
            reference's --use_keypoints_from path, inference.py:152-166);
            skips detection + NMS.
          rng: if given, randomly permute points first (the reference's
            --randomize_points, which exists because ball-query results are
            point-order dependent, inference.py:105-111).
        """
        icfg = self.icfg
        n, n_bucket, padded, valid = self._pad_to_bucket(cloud, rng)

        if (keypoints is None and self.mesh is not None
                and self.icfg.use_hashed_grouping is not False):
            # mesh mode: END-TO-END sharded extraction on the Morton-sorted
            # layout (grouping+detector, NMS ball-max, and descriptors all
            # shard the center/keypoint axis — parallel/point_parallel.py).
            # An EXPLICIT use_hashed_grouping=False opts out to the
            # attention-only sharded path below (the kernels run
            # interpreted off-TPU — correct, slower; the default None
            # keeps the sharded path on any backend since mesh mode
            # exists for multi-chip execution)
            pts4, blk_bbox, inv_perm = self._host_sort(padded, valid)
            kp, feats, kp_att, num = jax.device_get(
                self._mesh_extract_fn(n_bucket)(
                    self.variables, pts4, blk_bbox, inv_perm))
            num_kp = int(num)
            return InferenceResult(
                keypoints=kp[:num_kp], features=feats[:num_kp],
                attention=kp_att[:num_kp], num_keypoints=num_kp)

        if keypoints is None and self.mesh is None:
            # fused one-dispatch path: ONE upload + ONE download per cloud
            # (each separate array transfer is its own ~40 ms tunnel RTT)
            if self._use_hashed():
                layout = self._layout_for(padded[0, :n])
                packed, s_att, s_nms = self._host_sort_packed(padded, valid,
                                                              layout)
                kp, feats, kp_att, num_kp = self._extract_fn(
                    n_bucket, (s_att, s_nms), layout)(self.variables, packed)
            else:
                kp, feats, kp_att, num_kp = self._extract_fn(n_bucket)(
                    self.variables, padded, valid)
            return InferenceResult(
                keypoints=kp[:num_kp],
                features=feats[:num_kp],
                attention=kp_att[:num_kp],
                num_keypoints=num_kp,
            )

        padded_j = jnp.asarray(padded)
        valid_j = jnp.asarray(valid)

        if keypoints is None:
            att, _ = self._attention_fn(n_bucket)(self.variables, padded_j, valid_j)
            kp, kp_att, num = nms_keypoints(
                padded_j, att[None, :], icfg.nms_radius, icfg.max_keypoints,
                icfg.min_response_ratio, valid_mask=valid_j)
            kp_np = kp
            num_kp = int(num[0])
            n_kp = icfg.max_keypoints
        else:
            k = keypoints.shape[0]
            n_kp = k
            kp_np = jnp.asarray(keypoints[None, :, :3].astype(np.float32))
            num_kp = k

        feats, att_at_kp, kp_host = jax.device_get(
            self._describe_fn(n_bucket, n_kp)(
                self.variables, padded_j, valid_j, kp_np) + (kp_np[0],))

        return InferenceResult(
            keypoints=kp_host[:num_kp],
            features=feats[:num_kp],
            attention=att_at_kp[:num_kp],
            num_keypoints=num_kp,
        )

    def extract_many(self, clouds, rng: Optional[np.random.RandomState] = None,
                     depth: int = 2, prep_workers: int = 1,
                     batch_size: int = 1):
        """Pipelined extraction over many clouds (throughput mode).

        batch_size > 1 additionally packs that many clouds per device
        dispatch (extract_batch semantics — per-cloud results bit-equal),
        composing the dispatch amortization with the prep/compute
        pipelining. Best for small-cloud streams; keep
        batch_size · bucket ≤ 131072 so the union stays on the fori merge
        driver.

        Three overlapping stages: (1) host Morton sort + packing runs in a
        `prep_workers`-thread pool while (2) the device computes earlier
        clouds (dispatches are async — up to `depth` in flight) and (3)
        the main thread unpacks finished clouds. Per-cloud latency is
        unchanged; the per-cloud host prep and the device compute stop
        serializing, which is the production serving pattern. Falls back
        to sequential extract() off the hashed path.

        prep_workers default 1: one worker fully overlaps prep with the
        device compute (measured r3 at 120k: 2.68 clouds/s = 1.71× the
        sequential extract loop; more workers were SLOWER on this
        environment's single-CPU host). On multi-core hosts, raise it —
        the prep now runs through the native GIL-releasing sort+pack
        (native/morton_pack.cpp, 1.56× the numpy path single-threaded),
        so extra workers genuinely parallelize.

        Determinism: when `rng` is given, the point permutations are drawn
        serially in input order BEFORE the parallel prep, so results equal
        sequential extract() calls regardless of worker scheduling.

        Returns a list of InferenceResult in input order.
        """
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        clouds = list(clouds)
        if not (self._use_hashed() and self.mesh is None):
            return [self.extract(c, rng=rng) for c in clouds]

        if rng is not None:
            clouds = [c[rng.permutation(c.shape[0])] for c in clouds]

        if self.cloud_mesh is not None:
            # cloud-per-device throughput mode: hand batch_size·n_devices
            # clouds at a time to the mesh (extract_batch shards one
            # sub-batch per device); host prep/compute pipelining is not
            # yet composed with the mesh path
            n_dev = int(np.prod([self.cloud_mesh.shape[a]
                                 for a in self.cloud_mesh.axis_names]))
            step = max(batch_size, 1) * n_dev
            out = []
            for i in range(0, len(clouds), step):
                out.extend(self.extract_batch(clouds[i:i + step]))
            return out

        def prep_single(cloud):
            n, n_bucket, padded, valid = self._pad_to_bucket(cloud, None)
            layout = self._layout_for(padded[0, :n])
            packed, s_att, s_nms = self._host_sort_packed(padded, valid,
                                                          layout)
            return ("single", n_bucket, (s_att, s_nms), layout), packed

        if batch_size > 1:
            units = [clouds[i:i + batch_size]
                     for i in range(0, len(clouds), batch_size)]

            def prep(chunk):
                if len(chunk) == 1:
                    # a trailing singleton would compile a dedicated B=1
                    # batch executable — the single-cloud one is identical
                    return prep_single(chunk[0])
                B, n_bucket, layout, packed = self._batch_prep(chunk)
                return ("batch", B, n_bucket, layout), packed
        else:
            units = clouds
            prep = prep_single

        # fn builders mutate the executable cache — resolve on the
        # MAIN thread only (prep threads return just the cache key)
        def resolve(key):
            if key[0] == "batch":
                return self._extract_batch_fn(*key[1:])
            return self._extract_fn(*key[1:])

        def finish(item):
            fn, dev = item
            out = fn.unpack(np.asarray(dev))
            if len(out[0].shape) == 3:                  # batched (B, K, 3)
                return self._batch_results(out)
            kp, feats, kp_att, num_kp = out
            return [InferenceResult(
                keypoints=kp[:num_kp], features=feats[:num_kp],
                attention=kp_att[:num_kp], num_keypoints=num_kp)]

        results = []
        inflight: deque = deque()

        with ThreadPoolExecutor(max_workers=prep_workers) as pool:
            it = iter(units)
            futs: deque = deque()

            def submit_next():
                c = next(it, None)
                if c is not None:
                    futs.append(pool.submit(prep, c))

            for _ in range(depth + prep_workers):
                submit_next()
            while futs:
                key, packed = futs.popleft().result()
                submit_next()
                fn = resolve(key)
                dev = fn.impl(self.variables, jnp.asarray(packed))   # async
                inflight.append((fn, dev))
                if len(inflight) >= depth:
                    results.extend(finish(inflight.popleft()))
            while inflight:
                results.extend(finish(inflight.popleft()))
        return results

    def _batch_extract_core(self, n_clouds: int, n_bucket: int,
                            layout: Optional[Tuple[int, int]] = None):
        """Traceable batched-extraction core shared by the single-device
        packed path (_extract_batch_fn) and the cloud-per-device mesh path
        (_extract_batch_mesh_fn):

            core(variables, pts4 (B·nb, 4), inv_perm (B, nb) int32)
                -> (kp (B, K, 3), feats (B, K, D), kp_att (B, K), num (B,))

        Each cloud is Morton-sorted separately and the per-cloud layouts
        are concatenated, so tiles and culling blocks stay cloud-pure
        (buckets are power-of-two multiples of both sizes). Cross-cloud
        isolation comes from ANDing tile_cloud == block_cloud into the
        kernel hitmasks (ops/hash_grid.py block_mask) — NOT from shifting
        coordinates, which would perturb the f32 offsets — so per-cloud
        results are BIT-EQUAL to extract() on that cloud alone
        (tests/test_hash_bq.py::test_extract_batch_matches_single).
        """
        from feat3dnet_tpu.ops.hash_grid import (SortedCloud,
                                                 ball_max_sorted,
                                                 ball_query_grouped_sorted)
        from feat3dnet_tpu.ops.nms import select_keypoints

        icfg = self.icfg
        B, nb = n_clouds, n_bucket
        k_max = icfg.max_keypoints
        r = float(self.mcfg.base_scale)
        ns = self.mcfg.num_samples
        L, tc = layout or (self._HASH_BLOCK, self._HASH_TILE)
        # single-cloud detector chunking — see _hashed_attention_sorted
        core = self._hashed_attention_sorted(
            B * nb, chunk_override=self._chunk_size(nb))
        nms_tile = 512   # passed explicitly to ball_max_sorted below

        def cloud_mask(tile: int) -> np.ndarray:
            tpc, bpc = nb // tile, nb // L
            return (np.arange(B * tpc)[:, None] // tpc
                    == np.arange(B * bpc)[None, :] // bpc)

        mask_att = jnp.asarray(cloud_mask(tc))
        mask_nms = jnp.asarray(cloud_mask(nms_tile))

        def batch_core(variables, pts4, inv_perm):
            centers_sorted = pts4[:, :3]
            blocks = centers_sorted.reshape(-1, L, 3)
            blk_bbox = jnp.concatenate(
                [jnp.min(blocks, axis=1), jnp.max(blocks, axis=1),
                 jnp.zeros((blocks.shape[0], 2), jnp.float32)], axis=1)
            sc = SortedCloud(pts4=pts4, blk_bbox=blk_bbox, orig_idx=None,
                             inv_perm=None, block_size=0)
            grouped, _, _ = ball_query_grouped_sorted(
                sc, centers_sorted, r, ns, tile=tc, block_mask=mask_att)
            att_s, ori_s = core.detector_on_grouped(
                variables, grouped, centers_sorted)
            ballmax = ball_max_sorted(pts4, blk_bbox, att_s,
                                      float(icfg.nms_radius),
                                      tile=nms_tile, block_mask=mask_nms)
            is_max_s = att_s >= ballmax
            # per-cloud original order (inv_perm is per-cloud local)
            att_o = jnp.take_along_axis(att_s.reshape(B, nb), inv_perm, 1)
            im_o = jnp.take_along_axis(is_max_s.reshape(B, nb), inv_perm, 1)
            cloud_o = jnp.take_along_axis(
                pts4.reshape(B, nb, 4)[..., :3], inv_perm[..., None], 1)
            valid = cloud_o[..., 0] < 5.0e8
            kp, kp_att, num, kp_idx = select_keypoints(
                cloud_o, att_o, im_o, k_max, icfg.min_response_ratio,
                valid_mask=valid, return_indices=True)
            # descriptor pass via the attention-pass neighborhoods (see
            # _extract_fn) — batched gather over the union rows
            rows = (jnp.take_along_axis(inv_perm, kp_idx, 1)
                    + jnp.arange(B, dtype=jnp.int32)[:, None] * nb)
            clusters = grouped[rows.reshape(-1)].reshape(B, k_max, ns, 3)
            offs = clusters - kp[:, :, None, :]
            # Per-cloud descriptor chunks, shape-identical to the
            # single-cloud apply: the per-cloud bit-equality contract must
            # not rest on XLA matmul rounding being invariant to the
            # leading dim (one (B*k_max)-cluster apply could round
            # differently than B separate k_max applies under a future
            # codegen change). Mirrors the detector pass's chunk_override.
            ori_kp = ori_s[rows.reshape(-1)].reshape(B, k_max)
            feats = jax.lax.map(
                lambda xs: self._describe_at_keypoints(
                    variables, xs[0], xs[1]),
                (offs, ori_kp))
            return kp, feats, kp_att, num

        return batch_core

    def _extract_batch_fn(self, n_clouds: int, n_bucket: int,
                          layout: Optional[Tuple[int, int]] = None):
        """Batched single-dispatch extraction: B clouds packed into ONE
        sorted layout and ONE executable (cached per (B, bucket)) — see
        _batch_extract_core for the isolation/bit-equality contract.

        Reference analogue: the TF1 pipeline processes one cloud per
        sess.run (inference.py:121-137); batching N small clouds per
        dispatch amortizes the dispatch/sync overhead that dominates
        small-cloud serving.
        """
        key = ("batch", n_clouds, n_bucket, layout)
        if key in self._extract_fns:
            return self._extract_fns[key]

        B, nb = n_clouds, n_bucket
        k_max = self.icfg.max_keypoints
        d = self.mcfg.feature_dim
        batch_core = self._batch_extract_core(B, nb, layout)

        @jax.jit
        def impl(variables, packed):
            pts4 = packed[:B * nb * 4].reshape(B * nb, 4)
            inv_perm = packed[B * nb * 4:].reshape(B, nb).astype(jnp.int32)
            kp, feats, kp_att, num = batch_core(variables, pts4, inv_perm)
            return jnp.concatenate([
                kp.ravel(), feats.ravel(), kp_att.ravel(),
                num.astype(jnp.float32)])

        def unpack(out):
            o = 0
            kp = out[o:o + B * k_max * 3].reshape(B, k_max, 3)
            o += B * k_max * 3
            feats = out[o:o + B * k_max * d].reshape(B, k_max, d)
            o += B * k_max * d
            kp_att = out[o:o + B * k_max].reshape(B, k_max)
            num = out[-B:].astype(np.int32)
            return kp, feats, kp_att, num

        def fn(variables, packed_np):
            return unpack(np.asarray(impl(variables, jnp.asarray(packed_np))))

        fn.impl = impl
        fn.unpack = unpack
        self._extract_fns[key] = fn
        return fn

    def _extract_batch_mesh_fn(self, n_clouds: int, n_bucket: int,
                               layout: Optional[Tuple[int, int]] = None):
        """Cloud-per-device batched extraction over `cloud_mesh` — the
        production THROUGHPUT mode for a pod: each device independently
        runs the batched-extraction core on its own B/n_devices clouds
        (no collectives; clouds are embarrassingly parallel), so
        throughput scales as clouds/s × devices. Complements the
        latency-oriented single-cloud sharding of `mesh`
        (parallel/point_parallel.make_sharded_extract).

        Per-cloud results are bit-equal to extract() on that cloud alone:
        each shard runs the SAME _batch_extract_core executable a
        single-device extract_batch of B/n_devices clouds would
        (tests/test_parallel.py::test_cloud_mesh_extract_batch).

        Reference analogue: the per-file loop of
        /root/reference/inference.py:99-180 is the workload being scaled.
        """
        from jax.sharding import PartitionSpec as P

        key = ("batch_mesh", n_clouds, n_bucket, layout)
        if key in self._extract_fns:
            return self._extract_fns[key]

        mesh = self.cloud_mesh
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        axis = mesh.axis_names[0]
        assert n_clouds % n_dev == 0, (n_clouds, n_dev)
        B, nb = n_clouds, n_bucket
        k_max = self.icfg.max_keypoints
        batch_core = self._batch_extract_core(B // n_dev, nb, layout)

        @jax.jit
        def impl(variables, pts4_b, inv_b):
            def shard_body(variables, pts4_l, inv_l):
                return batch_core(variables, pts4_l.reshape(-1, 4),
                                  inv_l.astype(jnp.int32))

            return jax.shard_map(
                shard_body, mesh=mesh,
                in_specs=(P(), P(axis), P(axis)),
                out_specs=(P(axis),) * 4, check_vma=False,
            )(variables, pts4_b, inv_b)

        def fn(variables, packed_np):
            pts4_b = packed_np[:B * nb * 4].reshape(B, nb, 4)
            inv_b = packed_np[B * nb * 4:].reshape(B, nb)
            kp, feats, kp_att, num = jax.device_get(
                impl(variables, jnp.asarray(pts4_b), jnp.asarray(inv_b)))
            return kp, feats, kp_att, num.astype(np.int32)

        self._extract_fns[key] = fn
        return fn

    def _batch_prep(self, clouds):
        """Host prep for extract_batch: per-cloud Morton layouts at the
        shared bucket, one packed upload buffer. All clouds in the batch
        share one Morton layout (the kernels see one union); under the
        auto layout the densest cloud wins (smallest chosen block — the
        saturated-cloud −12 % is what the 128 block buys, and results are
        layout-invariant for the others). Returns (B, bucket, layout,
        packed)."""
        from feat3dnet_tpu.ops.hash_grid import build_sorted_cloud_host

        if self.icfg.num_points > 0:
            clouds = [c[:self.icfg.num_points] for c in clouds]
        n_bucket = max(bucket_for(c.shape[0]) for c in clouds)
        # inv_perm rides the packed buffer as f32, exact only below 2^24 —
        # same loud failure as _host_sort_packed instead of silent
        # permutation corruption on a >16.7M-point cloud
        if n_bucket >= (1 << 24):
            raise ValueError(
                f"packed f32 transfer supports < 2^24 points per cloud, got "
                f"bucket {n_bucket}; split the cloud or extend the packed "
                f"layout to int32 indices")
        layout = min(self._layout_for(c[:, :3]) for c in clouds)
        pts4_u, inv_u = [], []
        for c in clouds:
            n = c.shape[0]
            padded = np.zeros((n_bucket, 3), np.float32)
            padded[:n] = c[:, :3]
            valid = np.zeros((n_bucket,), bool)
            valid[:n] = True
            sc = build_sorted_cloud_host(
                padded, valid, cell_size=float(self.mcfg.base_scale),
                block_size=layout[0])
            pts4_u.append(sc.pts4.ravel())
            inv_u.append(sc.inv_perm.astype(np.float32))
        return (len(clouds), n_bucket, layout,
                np.concatenate(pts4_u + inv_u))

    @staticmethod
    def _batch_results(unpacked):
        kp, feats, kp_att, num = unpacked
        return [InferenceResult(keypoints=kp[i, :num[i]],
                                features=feats[i, :num[i]],
                                attention=kp_att[i, :num[i]],
                                num_keypoints=int(num[i]))
                for i in range(kp.shape[0])]

    def extract_batch(self, clouds,
                      rng: Optional[np.random.RandomState] = None):
        """Extract keypoints + descriptors for SEVERAL clouds in ONE device
        dispatch (latency-batched serving for small-cloud streams, e.g.
        KITTI frames). Per-cloud results are bit-equal to extract() —
        clouds are isolated by cloud-pure hitmasks, not coordinate shifts.
        All clouds share the largest required point bucket. Falls back to
        sequential extract() off the single-device hashed path.

        Returns a list of InferenceResult in input order.
        """
        clouds = list(clouds)
        if not (self._use_hashed() and self.mesh is None) or len(clouds) <= 1:
            return [self.extract(c, rng=rng) for c in clouds]
        if rng is not None:
            clouds = [c[rng.permutation(c.shape[0])] for c in clouds]
        n_req = len(clouds)
        if self.cloud_mesh is not None:
            # cloud-per-device throughput mode: round the batch up to a
            # multiple of the mesh size (replicas of the last cloud — same
            # executable, padding results dropped below)
            n_dev = int(np.prod([self.cloud_mesh.shape[a]
                                 for a in self.cloud_mesh.axis_names]))
            clouds = clouds + [clouds[-1]] * (-n_req % n_dev)
            B, n_bucket, layout, packed = self._batch_prep(clouds)
            out = self._extract_batch_mesh_fn(B, n_bucket, layout)(
                self.variables, packed)
            return self._batch_results(out)[:n_req]
        B, n_bucket, layout, packed = self._batch_prep(clouds)
        return self._batch_results(
            self._extract_batch_fn(B, n_bucket, layout)(self.variables,
                                                        packed))

    def process_directory(self, data_dir: str, output_dir: str,
                          data_dim: int = 6,
                          keypoints_dir: Optional[str] = None,
                          log=print, batch_size: int = 1) -> int:
        """Directory driver (reference compute_descriptors, inference.py:66-180):
        extract for every .bin in data_dir, write [xyz | desc] .bin outputs.

        batch_size > 1 packs that many clouds per device dispatch via
        extract_batch (bit-equal per-cloud results; falls back to the
        per-cloud loop for external keypoints / randomize_points)."""
        os.makedirs(output_dir, exist_ok=True)
        bins = sorted(f for f in os.listdir(data_dir) if f.endswith(".bin"))
        rng = np.random.RandomState(0) if self.icfg.randomize_points else None

        if batch_size > 1 and keypoints_dir is None and rng is None:
            done = 0
            for i0 in range(0, len(bins), batch_size):
                chunk = bins[i0:i0 + batch_size]
                clouds = [load_point_cloud(os.path.join(data_dir, f),
                                           num_cols=data_dim) for f in chunk]
                for fname, res in zip(chunk, self.extract_batch(clouds)):
                    save_descriptors(os.path.join(output_dir, fname),
                                     res.keypoints, res.features)
                    done += 1
                    log(f"Processed {done}/{len(bins)}: {fname} "
                        f"({res.num_keypoints} keypoints)")
            return len(bins)

        for i, fname in enumerate(bins):
            cloud = load_point_cloud(os.path.join(data_dir, fname), num_cols=data_dim)
            ext_kp = None
            if keypoints_dir is not None:
                ext_kp = load_point_cloud(
                    os.path.join(keypoints_dir, fname[:-4] + "_kp.bin"), num_cols=3)
            res = self.extract(cloud, keypoints=ext_kp, rng=rng)
            save_descriptors(os.path.join(output_dir, fname), res.keypoints, res.features)
            log(f"Processed {i + 1}/{len(bins)}: {fname} ({res.num_keypoints} keypoints)")
        return len(bins)
