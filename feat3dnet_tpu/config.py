"""Configuration dataclasses for the framework.

Mirrors the reference's parameter surface (`train.py:20-67`, `inference.py:25-59`,
`config.py:1-5`, `models/feat3dnet.py:192-209` in /root/reference) as typed
dataclasses instead of argparse globals + a param dict.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Model hyperparameters (reference: feat3dnet.py:192-209, train.py:36-44).

    Attributes:
      num_clusters: clusters sampled by FPS during training (reference
        NUM_CLUSTERS=512, train.py:15). -1 = use every point as a keypoint
        (reference inference path, inference.py:82).
      base_scale: cluster radius in metres (reference BaseScale, 2.0).
      num_samples: max points per cluster (64).
      feature_dim: descriptor dimensionality, one of {16, 32, 64, 128}.
      attention: predict per-cluster attention (reference 'Attention').
      regress_orientation: regress per-cluster z-rotation (reference
        'NoRegress' inverted).
      use_bn: batch normalization in the shared MLPs (reference USE_BN).
      margin: triplet loss margin (0.2).
      compute_dtype: dtype for MLP matmuls. float32 matches the reference
        bit-for-bit; bfloat16 doubles MXU throughput at ~1e-3 descriptor
        cosine error (still far below matching thresholds).
      remat_towers: rematerialize the per-point tower segments (pre-pool
        convs, the widest training activations — (3B, M, ns, 256) alone is
        600 MB at paper shapes) in the backward pass instead of saving
        them. Bit-exact (tested); trades tower recompute FLOPs for ~GBs of
        saved-activation HBM traffic. Measured per-shape — see
        BENCHMARKS.md; unlike the trainer-level full remat, the grouping
        and pools stay saved.
      residual_dtype: training-only compressed saved activations. When set
        (jnp.bfloat16), the per-point tower segments run under a
        jax.checkpoint save_only_these_names policy whose save points are
        bf16 quantize-dequantize copies of each Dense output and each
        post-activation tensor — the backward pass streams HALF the
        saved-residual bytes of f32 while the matmuls and BN statistics
        still compute in compute_dtype. No matmul recompute (unlike
        remat_towers); backward re-derives only the elementwise BN/relu
        chains from the saved points. Forward activations are rounded to
        the bf16 grid at the squash points (the saved copy IS the forward
        value), so this is NOT bit-exact vs residual_dtype=None — see
        BENCHMARKS.md for the measured grad agreement and speed. Takes
        precedence over remat_towers when both are set.
    """

    num_clusters: int = 512
    base_scale: float = 2.0
    num_samples: int = 64
    feature_dim: int = 32
    attention: bool = True
    regress_orientation: bool = True
    use_bn: bool = True
    margin: float = 0.2
    bn_momentum: float = 0.9          # reference EMA decay (layers.py:251)
    bn_epsilon: float = 1e-3          # reference tf.nn.batch_normalization eps (layers.py:271)
    compute_dtype: Any = jnp.float32
    remat_towers: bool = False
    residual_dtype: Any = None
    # fused_towers (training-only, TPU): run the pre-pool tower segments
    # through the multi-pass Pallas fwd+bwd pipeline (ops/fused_train.py)
    # instead of the XLA towers — no inter-layer activation ever touches
    # HBM (recompute-from-input in VMEM; bf16-streamed cotangents). Same
    # BN semantics to accumulation order; NOT bit-exact vs the default.
    # f32 compute only; ignored at eval or when keypoints vary.
    fused_towers: bool = False
    # dtype of the fused pipeline's streamed inter-layer cotangents (the
    # only HBM tensor the backward touches besides the input). bfloat16
    # halves the stream; float32 matches the XLA step's update direction
    # much more closely on chip (see BENCHMARKS.md fused-towers envelope).
    fused_cot_dtype: Any = jnp.bfloat16

    # MLP widths (reference feat3dnet.py:278-301). Descriptor mlp2 widens to
    # [256] when feature_dim > 64, matching feat3dnet.py:300.
    detector_mlp: Sequence[int] = (64, 128, 256)
    detector_mlp2: Sequence[int] = (128, 64)
    descriptor_mlp: Sequence[int] = (32, 64)

    @property
    def descriptor_mlp2(self) -> Sequence[int]:
        return (256,) if self.feature_dim > 64 else (128,)

    @property
    def descriptor_mlp3(self) -> Sequence[int]:
        return (self.feature_dim,)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference: train.py:20-67, config.py, train.sh)."""

    batch_size: int = 6               # triplets per step (reference BATCH_SIZE)
    num_points: int = 4096            # points per cloud after crop+resample
    learning_rate: float = 1e-5       # reference AdamOptimizer default (feat3dnet.py:363)
    # lr schedule (framework extension; the reference trains at a fixed lr).
    # 'constant' keeps the reference semantics AND the float-lr opt_state
    # structure (old checkpoints restore unchanged); 'cosine' = linear
    # warmup then cosine decay over decay_steps (see train.make_optimizer).
    lr_schedule: str = "constant"
    warmup_steps: int = 0
    decay_steps: int = 0
    num_epochs: int = 1000
    augmentations: Sequence[str] = ("Jitter", "RotateSmall", "Shift", "Rotate1D")
    upright_axis: int = 2             # z-up (reference UPRIGHT_AXIS)
    crop_radius: float = 20.0         # metres (reference datagenerator.py:144)
    freeze_scopes: Optional[Sequence[str]] = None
    checkpoint_every_n_steps: int = 500
    validate_every_n_steps: int = 250
    summary_every_n_steps: int = 20
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class InferenceConfig:
    """Inference/NMS parameters (reference: inference.py:25-59)."""

    nms_radius: float = 0.5
    min_response_ratio: float = 1e-2
    max_keypoints: int = 1024
    # Query-points processed per device pass. The reference chunks attention
    # at MAX_POINTS=30000 for GPU memory (inference.py:22); on TPU this is a
    # static bucket size for the keypoint axis — it bounds the
    # (chunk × n_points) distance-matrix working set in HBM.
    keypoint_chunk: int = 8192
    num_points: int = -1              # -1 = no downsample
    randomize_points: bool = False
    # Attention-pass neighborhoods via the Morton-sorted spatially-pruned
    # Pallas kernel (ops/hash_grid.py; index-exact vs the dense op).
    # None = auto: on for real TPU backends, off elsewhere (the kernel runs
    # interpreted off-TPU — correct but slow).
    use_hashed_grouping: Optional[bool] = None
    # Morton-block layout parameters for the hashed kernels: points per
    # culling block (and per merge step) / centers per kernel tile. Smaller
    # blocks cull tighter (less per-step slack) but sequence more grid
    # steps; larger tiles amortize per-step block loads. 256×256 is the
    # measured optimum for the transposed merge at 120k-submap scale
    # (benchmarks/sweep_merge.py r3: 0.50-0.52 s vs 0.61 s at 256×128,
    # 0.73 s at 128×128, 0.56 s at 512×256). hash_block=0 = AUTO: per-cloud
    # density-keyed choice between 128 and 256 via
    # ops/hash_grid.estimate_ball_points (saturated clouds — estimated
    # ball population >= num_samples — take 128). Outputs are
    # bit-identical across layouts (the grouping contract is
    # layout-independent); only speed and the executable-cache key change.
    # The pinned 256 stays the DEFAULT: an interleaved same-session A/B on
    # the current compile service (benchmarks/sweep_layout_auto.py, late
    # r3) measured the 128-vs-256 gap at ±2-4 % on all three reference
    # clouds — the earlier −12 % kitti win did not survive a service
    # update — so auto's extra executable per density class isn't
    # currently paid for. Re-run the sweep when the service changes.
    hash_block: int = 256
    hash_tile: int = 256
    # Kernel flavor inside the hashed extract: True = CSR (scalar-prefetch
    # hit lists, no skipped grid steps), False = dense grid with bit-packed
    # skip mask. Identical outputs; both index-exact. Measured A/B on the
    # v5e: the dense grid wins end-to-end (oxford 0.110 s vs 0.132 s;
    # 120k submap 0.98 s vs 1.7 s median) AND is robust to per-cloud CSR
    # length-bucket changes, which recompile/reload the executable when a
    # perturbed cloud crosses a power-of-two hit-count boundary. CSR stays
    # available for sparse workloads where the hit fraction is tiny.
    use_csr_kernels: bool = False
    # Run the extraction's tower passes through the fused Pallas serving
    # kernels: the attention pass as the detector-only kernel (lane-dense
    # planes path / fused_detect_clusters_2d — the chunked XLA path
    # materializes every (chunk, ns, C) inter-layer activation in HBM,
    # ~50 GB at a 131k bucket, where the kernel streams 12 B/cluster out)
    # and the descriptor pass at the NMS keypoints as the whole-forward
    # kernel (fused_describe_clusters_2d).
    #
    # ACCURACY (r5, measured on chip against a float64 ground truth on
    # real oxford neighborhoods): the unfolded-BN detect kernels agree
    # with the HIGHEST-precision XLA detector to relmax 2.4e-7 and with
    # float64 truth to 4.8e-5, while the DEFAULT XLA towers round 2.3e-3
    # from truth (single-pass-bf16 matmul operands). The ~0.98 keypoint
    # overlap vs the default path is therefore the DEFAULT PATH'S rounding
    # — the fused detector is the more accurate (and most TF1-faithful)
    # attention pass available. Kept OPT-IN anyway: the default preserves
    # the framework's bit-equality contracts (hashed == dense extract,
    # batch == single-cloud), and the speed gap under the current compile
    # service is only +5 % at 120k / neutral below (BENCHMARKS.md).
    use_fused_detector: bool = False


# Padded-size buckets for the points axis. Static shapes are mandatory under
# jit; clouds are padded (with a validity mask) to the smallest bucket that
# fits, replacing the reference's ragged handling (duplicate-pad in
# datagenerator.py:148-156).
POINT_BUCKETS = (4096, 8192, 16384, 32768, 65536, 131072)


def bucket_for(n: int) -> int:
    """Smallest static bucket that holds n points."""
    for b in POINT_BUCKETS:
        if n <= b:
            return b
    return ((n + POINT_BUCKETS[-1] - 1) // POINT_BUCKETS[-1]) * POINT_BUCKETS[-1]
