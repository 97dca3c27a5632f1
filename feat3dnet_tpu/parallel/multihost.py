"""Multi-host (DCN) training glue.

The reference is strictly single-process/single-GPU; this module provides
the cross-host story the TPU framework needs (SURVEY.md §2.4): initialize
jax.distributed, build the global mesh (ICI within a slice, DCN across
hosts — jax orders devices so 1-D meshes keep intra-slice neighbors
adjacent), and wire the deterministic per-host data shard.

Usage on each host:

    from feat3dnet_tpu.parallel import multihost
    multihost.initialize()                      # env-driven (TPU pods), or
    multihost.initialize(coordinator, n, id)    # explicit
    mesh = multihost.global_mesh()
    dataset = multihost.shard_dataset("data/oxford/train/train.txt")
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize — env-driven on TPU pods when no args."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(axis_name: str = "data") -> Mesh:
    """1-D mesh over ALL devices across hosts (DP batch axis)."""
    return Mesh(np.array(jax.devices()), axis_names=(axis_name,))


def shard_dataset(metadata_file: str, num_cols: int = 6, seed: int = 0,
                  use_native: str = "auto"):
    """TripletDataset slice for THIS host: every host computes the same
    deterministic epoch permutation and takes its process_index stride —
    no coordination traffic (data/datagenerator.py epoch_order)."""
    from feat3dnet_tpu.data.datagenerator import TripletDataset

    return TripletDataset(metadata_file, num_cols=num_cols, seed=seed,
                          shard_index=jax.process_index(),
                          num_shards=jax.process_count(),
                          use_native=use_native)
