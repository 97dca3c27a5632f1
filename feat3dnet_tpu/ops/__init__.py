"""Point-set primitives: the TPU-native equivalents of the reference's CUDA ops.

Reference (cwlroda/3DFeatNet) op inventory and where each lives here:

  farthest_point_sample (tf_ops/sampling/tf_sampling_g.cu:105-170)
      -> fps.farthest_point_sample (lax.scan) / fps.farthest_point_sample_pallas
  gather_point (+grad)  (tf_sampling_g.cu:172-192)
      -> neighborhoods.gather_points (take_along_axis; AD gives a
         deterministic scatter-add gradient, unlike the CUDA atomicAdd)
  query_ball_point      (tf_ops/grouping/tf_grouping_g.cu:3-52)
      -> neighborhoods.ball_query  (masked cumsum + binary search)
  query_ball_point2     (tf_grouping_g.cu:56-90; per-cluster radii)
      -> neighborhoods.ball_query with per-cluster `radius` array
  group_point (+grad)   (tf_grouping_g.cu:94-132)
      -> neighborhoods.group_points
  selection_sort/knn    (tf_grouping_g.cu:137-177, tf_grouping.py:63-88)
      -> neighborhoods.knn_points (lax.top_k)
  prob_sample           (tf_sampling_g.cu:7-104)
      -> sampling.prob_sample (cumsum + searchsorted)

Beyond the reference: hash_grid.hashed_ball_query — an index-exact
spatially-pruned ball query (Morton-sorted blocks + bbox culling, Pallas)
for dense-cloud inference, O(M·local density) instead of O(M·N·ns).

All ops take fixed-shape padded tensors with optional validity masks; there is
no ragged data anywhere. See each module for the semantic-parity notes.
"""
from feat3dnet_tpu.ops.neighborhoods import (
    ball_query,
    gather_points,
    group_points,
    knn_points,
    pairwise_sqdist,
)
from feat3dnet_tpu.ops.fps import farthest_point_sample
from feat3dnet_tpu.ops.hash_grid import (ball_max_csr, ball_max_sorted,
                                         ball_query_grouped_csr,
                                         ball_query_grouped_sorted,
                                         build_hit_csr_host,
                                         build_sorted_cloud, hashed_ball_query)
from feat3dnet_tpu.ops.sampling import prob_sample
from feat3dnet_tpu.ops.nms import nms_keypoints, select_keypoints
from feat3dnet_tpu.ops.pointnet import sample_and_group, sample_and_group_all, sample_points

__all__ = [
    "ball_query",
    "gather_points",
    "group_points",
    "knn_points",
    "pairwise_sqdist",
    "farthest_point_sample",
    "prob_sample",
    "nms_keypoints",
    "sample_points",
    "sample_and_group",
    "sample_and_group_all",
    "select_keypoints",
    "hashed_ball_query",
    "ball_query_grouped_sorted",
    "ball_query_grouped_csr",
    "ball_max_sorted",
    "ball_max_csr",
    "build_hit_csr_host",
    "build_sorted_cloud",
]
