"""Multi-device parallelism over a jax.sharding.Mesh.

The reference has NO multi-device machinery (SURVEY.md §2.4: single GPU via
CUDA_VISIBLE_DEVICES, no NCCL/MPI/Horovod). The TPU-native framework
provides first-class:

  * data parallelism (data_parallel.py): batch-sharded triplets over a 1-D
    mesh; grads all-reduced by XLA over ICI — the TPU-native equivalent of
    the NCCL the reference never had;
  * point/keypoint parallelism (point_parallel.py): the TPU answer to the
    reference's 30k-point chunked attention loop (inference.py:123-137) —
    the QUERY axis is sharded across devices while the (small: ≤131k pts =
    1.5 MB) cloud is replicated, so no neighbor exchange is needed at all;
  * cross-host data sharding: TripletDataset's deterministic per-epoch
    permutation slices (data/datagenerator.py).
"""
from feat3dnet_tpu.parallel.mesh import make_mesh, data_sharding, replicated_sharding
from feat3dnet_tpu.parallel.data_parallel import (make_chained_dp_train_step,
                                                  make_dp_train_step,
                                                  make_fused_dp_train_step,
                                                  make_shardmap_fused_dp_train_step,
                                                  make_chained_shardmap_dp_train_step,
                                                  shard_batch)
from feat3dnet_tpu.parallel.point_parallel import (keypoint_sharded_attention,
                                                   make_sharded_extract)

__all__ = [
    "make_mesh", "data_sharding", "replicated_sharding",
    "make_dp_train_step", "make_fused_dp_train_step",
    "make_chained_dp_train_step", "make_shardmap_fused_dp_train_step",
    "make_chained_shardmap_dp_train_step", "shard_batch",
    "keypoint_sharded_attention", "make_sharded_extract",
]
