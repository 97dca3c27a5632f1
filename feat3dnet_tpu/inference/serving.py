"""High-throughput cluster-descriptor serving API.

`describe_clusters` is the production entry point for BASELINE.md config 2
(batches of origin-centered clusters → descriptors + attention): it uses
the fused Pallas kernel (ops/fused_describe.py) when the workload fits its
contract (TPU backend, cluster size == num_samples, eval mode) and falls
back to the general XLA model path otherwise.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from feat3dnet_tpu.config import ModelConfig
from feat3dnet_tpu.models.feat3dnet import Feat3DNet

Array = jax.Array


class ClusterDescriptorServer:
    """Holds folded weights + cached executables for repeated serving calls.

    bf16_act: cast the kernel's inter-layer activations to bfloat16 between
    the tower matmuls (matmuls still accumulate f32). Descriptor agreement
    vs f32 is gate-checked (ONCHIP_GATE.json serving phase: cos_bf16 = 1.0
    to the logged precision). Speed is KERNEL-DEPENDENT — measured +6 % on
    the rank-3 kernel but −6 % on the default slot-major 2-D kernel, whose
    concat trees don't narrow (BENCHMARKS.md roofline) — so it is opt-in;
    A/B it on your workload (benchmarks/probe_serving_ablation.py) before
    enabling in production.
    """

    def __init__(self, model: Feat3DNet, variables: Dict[str, Any], cfg: ModelConfig,
                 bf16_act: bool = False):
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.bf16_act = bf16_act
        self._weights = None
        self._weights_t = None

        @jax.jit
        def xla_path(variables, clusters):
            keypoints = jnp.zeros((clusters.shape[0], 1, 3), jnp.float32)
            out = model.apply(variables, clusters, training=False,
                              keypoints=keypoints)
            return out.features[:, 0, :], out.end_points["attention"][:, 0]

        self._xla_path = xla_path

    def __call__(self, clusters: Array) -> Tuple[Array, Array]:
        """(B, P, 3) origin-centered clusters -> (descriptors (B, D),
        attention (B,))."""
        use_fused = (jax.default_backend() == "tpu"
                     and clusters.shape[1] == self.cfg.num_samples
                     # the fused kernel folds eval BN into the weights —
                     # no-BN models take the XLA path
                     and self.cfg.use_bn
                     and bool(self.variables.get("batch_stats")))
        if use_fused:
            from feat3dnet_tpu.ops.fused_describe import (
                folded_weights, fused_describe_clusters,
                fused_describe_clusters_2d)

            if self._weights is None:
                self._weights = folded_weights(self.variables, self.cfg)
            ns = clusters.shape[1]
            if ns & (ns - 1) == 0:
                # slot-major fully-2D kernel: bit-exact vs the rank-3
                # kernel on-chip, fastest measured variant at tile=256
                # (r3 probe, benchmarks/probe_flat2d.py). Small batches
                # take tile=64 — a 32-cluster call padded to a 256 tile
                # would spend 87% of the tower matmuls on padding
                b = clusters.shape[0]
                return fused_describe_clusters_2d(
                    self._weights, jnp.asarray(clusters, jnp.float32),
                    self.cfg, tile=256 if b >= 256 else 64,
                    bf16_act=self.bf16_act)
            return fused_describe_clusters(
                self._weights, jnp.asarray(clusters, jnp.float32), self.cfg,
                bf16_act=self.bf16_act)
        return self._xla_path(self.variables, jnp.asarray(clusters, jnp.float32))

    @staticmethod
    def pack_clusters(clusters) -> "Array":
        """Host packer for the lane-dense fast path: (B, P, 3) float32
        numpy -> (P·8, B). Run it on serving prep threads (pure numpy)."""
        import numpy as _np

        from feat3dnet_tpu.ops.fused_describe import pack_clusters_lanes

        return pack_clusters_lanes(_np.asarray(clusters, _np.float32))

    def describe_packed(self, packed: Array) -> Tuple[Array, Array]:
        """FAST serving path: (P·8, B) lane-dense packed clusters (see
        pack_clusters) -> (descriptors (B, D), attention (B,)).

        Runs the transposed lane-dense kernel (fused_describe_clusters_t)
        — measured 2.8× the (B, P, 3) path on the v5e (r4 interleaved A/B,
        BENCHMARKS.md): the rank-3 layout lane-pads its 3-wide coordinate
        dim 3→128, so ~60 % of the standard path's device time is spent
        streaming padding. Requires TPU backend, P == num_samples, BN
        (folded weights); falls back are the caller's job — this method
        asserts its contract instead of silently degrading.
        """
        assert jax.default_backend() == "tpu" and self.cfg.use_bn
        from feat3dnet_tpu.ops.fused_describe import (
            folded_weights, fused_describe_clusters_t,
            transpose_folded_weights)

        if self._weights_t is None:
            if self._weights is None:
                self._weights = folded_weights(self.variables, self.cfg)
            self._weights_t = transpose_folded_weights(self._weights)
        return fused_describe_clusters_t(
            self._weights_t, jnp.asarray(packed, jnp.float32), self.cfg,
            tile=256, bf16_act=self.bf16_act)
