"""End-to-end keypoint + descriptor extraction (reference inference.py)."""
from feat3dnet_tpu.inference.pipeline import InferencePipeline, InferenceResult
from feat3dnet_tpu.inference.serving import ClusterDescriptorServer

__all__ = ["InferencePipeline", "InferenceResult", "ClusterDescriptorServer"]
