"""Data pipeline: binary IO, triplet sampling, on-device augmentation.

Reference: /root/reference/data/ (datagenerator.py, augment.py) — rebuilt
with seeded, shardable sampling and jit-fused on-device augmentation in
place of per-step host numpy.
"""
from feat3dnet_tpu.data.io import (load_point_cloud, save_descriptors,
                                   load_descriptors, example_data_dir,
                                   example_cloud_path)
from feat3dnet_tpu.data.datagenerator import TripletDataset, TripletMetadata, prefetch
from feat3dnet_tpu.data.augment import augment_clouds, AUGMENTATIONS

__all__ = [
    "load_point_cloud", "save_descriptors", "load_descriptors",
    "example_data_dir", "example_cloud_path",
    "TripletDataset", "TripletMetadata", "prefetch",
    "augment_clouds", "AUGMENTATIONS",
]
