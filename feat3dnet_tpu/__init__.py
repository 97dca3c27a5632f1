"""feat3dnet_tpu — a TPU-native point-cloud feature-learning framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of 3DFeat-Net
(ECCV 2018, arXiv 1807.09413; reference implementation: cwlroda/3DFeatNet,
TF1.15 + CUDA). Nothing here is a translation: the CUDA ragged-gather ops
become fixed-shape masked tensor ops and Pallas kernels; the TF1 static
graph becomes jit-compiled functional modules; single-GPU feed_dict training
becomes data-parallel `jax.sharding` over a TPU mesh.

Package layout
--------------
ops/        Point-set primitives (FPS, ball query, grouping, kNN, NMS):
            pure-jnp reference implementations + Pallas TPU kernels.
models/     Detector (attention + z-orientation) and descriptor (PointNet-style
            shared MLP) as flax modules, TF1-checkpoint-name compatible.
data/       Binary IO, triplet sampling, on-device augmentation, prefetching.
train/      Alignment triplet loss, optax train step, two-stage recipe,
            Orbax checkpointing with scope-style partial restore.
parallel/   Device-mesh helpers, data-parallel train step, keypoint-sharded
            inference (the TPU-native answer to the reference's 30k-point
            chunked attention loop).
inference/  End-to-end keypoint + descriptor extraction with on-device NMS.
eval/       Descriptor matching, RANSAC rigid registration, FPR@95% metric
            (Python/JAX ports of the reference's MATLAB pipeline).
utils/      TF1 checkpoint name-mapping loader, logging, profiling helpers.
"""

__version__ = "0.1.0"
