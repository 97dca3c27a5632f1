"""FPR@95%-recall validation over cluster pairs.

Reference: train.py:260-315 — loads {i}_0.bin / {i}_1.bin cluster pairs
(labels in clusters/filenames.txt, last column 0/1), packs 512 clusters
into ONE giant point cloud with 100 m x-offsets so a single sess.run can
process them, feeds the offsets as keypoints, and measures descriptor
distances.

TPU-native redesign: the packing hack disappears — clusters are simply a
BATCH (B, P, 3) with validity masks (static shapes), keypoints are the
per-cluster origin, and one jitted forward computes all descriptors. This
also removes the reference's subtle cross-talk risk (clusters 100 m apart
can never interact through ball-query anyway, but packed clusters DO share
batch-norm... nothing — eval uses EMA stats; behavior is identical).
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from feat3dnet_tpu.config import ModelConfig
from feat3dnet_tpu.data.io import load_point_cloud
from feat3dnet_tpu.eval.metrics import fpr_at_95_recall
from feat3dnet_tpu.models.feat3dnet import Feat3DNet


def load_validation_groundtruths(fname: str, proportion: float = 1.0) -> List[Tuple[int, int]]:
    """Parse clusters/filenames.txt: one header line, then rows whose last
    whitespace token is the 0/1 same-place label (train.py:244-257)."""
    gts = []
    with open(fname) as f:
        f.readline()
        for i, line in enumerate(f):
            if line.strip():
                gts.append((i, int(line.split()[-1])))
    if 0 < proportion < 1:
        gts = gts[::int(1.0 / proportion)]
    return gts


class ClusterPairValidator:
    """Batched descriptor-distance FPR@95 evaluation."""

    def __init__(self, model: Feat3DNet, model_cfg: ModelConfig,
                 cluster_folder: str, data_dim: int = 6,
                 batch: int = 512, max_cluster_points: int = 1024,
                 proportion: float = 1.0):
        self.model = model
        self.cfg = model_cfg
        self.folder = cluster_folder
        self.data_dim = data_dim
        self.batch = batch
        self.max_points = max_cluster_points
        self.groundtruths = load_validation_groundtruths(
            os.path.join(cluster_folder, "filenames.txt"), proportion)

        @jax.jit
        def describe(variables, clouds, valid_mask):
            keypoints = jnp.zeros((clouds.shape[0], 1, 3), jnp.float32)
            out = model.apply(variables, clouds, training=False,
                              keypoints=keypoints, valid_mask=valid_mask)
            return out.features[:, 0, :]                       # (B, D)

        self._describe = describe

    def _load_batch(self, indices: Sequence[int], suffix: int
                    ) -> Tuple[np.ndarray, np.ndarray]:
        clouds = np.zeros((self.batch, self.max_points, 3), np.float32)
        valid = np.zeros((self.batch, self.max_points), bool)
        for j, idx in enumerate(indices):
            c = load_point_cloud(
                os.path.join(self.folder, f"{idx}_{suffix}.bin"), self.data_dim)
            n = min(c.shape[0], self.max_points)
            clouds[j, :n] = c[:n, :3]
            valid[j, :n] = True
        return clouds, valid

    def __call__(self, variables) -> float:
        """Returns FPR at 95% recall over all cluster pairs."""
        positive, negative = [], []
        gts = self.groundtruths
        for start in range(0, len(gts), self.batch):
            chunk = gts[start:start + self.batch]
            ids = [g[0] for g in chunk]
            c0, v0 = self._load_batch(ids, 0)
            c1, v1 = self._load_batch(ids, 1)
            f0 = np.asarray(self._describe(variables, jnp.asarray(c0), jnp.asarray(v0)))
            f1 = np.asarray(self._describe(variables, jnp.asarray(c1), jnp.asarray(v1)))
            d = np.linalg.norm(f0 - f1, axis=1)[:len(chunk)]
            for (_, label), dist in zip(chunk, d):
                (positive if label == 1 else negative).append(dist)
        if not positive or not negative:
            return 1.0
        return fpr_at_95_recall(np.array(positive), np.array(negative))
