"""Triplet dataset: seeded, shardable replacement for the reference's
deque-based DataGenerator (/root/reference/data/datagenerator.py).

Semantics preserved:
  * metadata lines `fname | positives | nonnegatives` (datagenerator.py:31-39);
  * per triplet: positive drawn uniformly from the anchor's positive set,
    negative drawn uniformly from clouds outside positives ∪ nonnegatives
    (:116-136);
  * per cloud: crop to a 20 m radius around the origin (:144), then random
    downsample without replacement to num_points, or duplicate-pad with
    random resampling when short (:148-160).

TPU-native redesign:
  * deterministic seeded epochs: epoch e is `rng(seed, e).permutation`, so
    every host computes the same global order and takes its own slice —
    cross-host data sharding without coordination (the reference's
    random.shuffle deque cannot do this);
  * rejection-free negative sampling: draw an index into the precomputed
    complement set instead of the reference's retry loop;
  * a background-thread prefetcher overlaps host IO with device steps (the
    reference does blocking per-step file reads — SURVEY.md §3.1 flags it
    as a known perf sink);
  * optional native C++ reader (feat3dnet_tpu.utils.native) for the
    file-read + crop + resample hot path.
"""
from __future__ import annotations

import dataclasses
import os
import queue
import threading
from typing import Callable, Iterator, List, Optional, Sequence, Set, Tuple

import numpy as np

from feat3dnet_tpu.data.io import load_point_cloud


@dataclasses.dataclass
class TripletMetadata:
    fname: str
    positives: Set[int]
    nonnegatives: Set[int]


def parse_metadata(path: str) -> List[TripletMetadata]:
    out = []
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            fname, pos, nonneg = [p.strip() for p in line.split("|")]
            out.append(TripletMetadata(
                fname=fname,
                positives={int(s) for s in pos.split()},
                nonnegatives={int(s) for s in nonneg.split()},
            ))
    return out


class TripletDataset:
    """Seeded triplet sampler over a train.txt metadata file."""

    def __init__(self, metadata_file: str, num_cols: int = 6, seed: int = 0,
                 shard_index: int = 0, num_shards: int = 1,
                 use_native: str = "auto"):
        self.folder = os.path.split(metadata_file)[0]
        self.meta = parse_metadata(metadata_file)
        self.num_cols = num_cols
        self.seed = seed
        self.shard_index = shard_index
        self.num_shards = num_shards
        if use_native == "auto":
            from feat3dnet_tpu.utils.native import native_available
            self.use_native = native_available()
        else:
            self.use_native = use_native in (True, "true", "yes")
        self.size = len(self.meta)
        # Precompute each anchor's valid-negative pool (complement of
        # positives ∪ nonnegatives) for rejection-free sampling.
        universe = np.arange(self.size)
        self._neg_pool = []
        for m in self.meta:
            excluded = m.positives | m.nonnegatives
            self._neg_pool.append(np.array(
                [i for i in universe if i not in excluded], dtype=np.int64))

    def epoch_order(self, epoch: int) -> np.ndarray:
        """Deterministic global permutation for this epoch, sliced per shard."""
        order = np.random.RandomState((self.seed, epoch)).permutation(self.size)
        return order[self.shard_index::self.num_shards]

    def sample_triplet_indices(self, anchor: int, rng: np.random.RandomState
                               ) -> Tuple[int, int]:
        m = self.meta[anchor]
        positives = sorted(m.positives)
        positive = positives[rng.randint(len(positives))]
        pool = self._neg_pool[anchor]
        negative = int(pool[rng.randint(len(pool))])
        return positive, negative

    def load_processed(self, i: int, num_points: int,
                       rng: np.random.RandomState,
                       crop_radius: float = 20.0) -> np.ndarray:
        cloud = load_point_cloud(os.path.join(self.folder, self.meta[i].fname),
                                 num_cols=self.num_cols)
        return crop_and_resample(cloud, num_points, rng, crop_radius)

    def epoch_triplets(self, epoch: int, batch_size: int, num_points: int,
                       crop_radius: float = 20.0
                       ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Yield (anchors, positives, negatives) batches of shape
        (batch_size, num_points, num_cols); drops the ragged tail batch
        (matching the reference's `anchors.shape[0] != BATCH_SIZE: break`,
        train.py:152-153)."""
        order = self.epoch_order(epoch)
        rng = np.random.RandomState((self.seed, epoch, self.shard_index, 0xA5))

        if self.use_native:
            from feat3dnet_tpu.utils.native import load_processed_batch
            for start in range(0, len(order) - batch_size + 1, batch_size):
                ids = []
                for anchor in order[start:start + batch_size]:
                    pos, neg = self.sample_triplet_indices(int(anchor), rng)
                    ids.extend((int(anchor), pos, neg))
                paths = [os.path.join(self.folder, self.meta[i].fname) for i in ids]
                seeds = [int(rng.randint(0, 2**31)) for _ in ids]
                flat = load_processed_batch(paths, self.num_cols, crop_radius,
                                            num_points, seeds)
                flat = flat.reshape(batch_size, 3, num_points, self.num_cols)
                yield flat[:, 0], flat[:, 1], flat[:, 2]
            return

        batch_a, batch_p, batch_n = [], [], []
        for anchor in order:
            pos, neg = self.sample_triplet_indices(int(anchor), rng)
            batch_a.append(self.load_processed(int(anchor), num_points, rng, crop_radius))
            batch_p.append(self.load_processed(pos, num_points, rng, crop_radius))
            batch_n.append(self.load_processed(neg, num_points, rng, crop_radius))
            if len(batch_a) == batch_size:
                yield (np.stack(batch_a), np.stack(batch_p), np.stack(batch_n))
                batch_a, batch_p, batch_n = [], [], []


def crop_and_resample(cloud: np.ndarray, num_points: int,
                      rng: np.random.RandomState,
                      crop_radius: float = 20.0) -> np.ndarray:
    """Crop to radius, then exact-size random resample (reference
    process_point_cloud, datagenerator.py:138-160)."""
    mask = np.sum(np.square(cloud[:, :3]), axis=1) <= crop_radius * crop_radius
    cloud = cloud[mask]
    n = cloud.shape[0]
    if n == 0:
        raise ValueError("empty cloud after crop")
    if n <= num_points:
        pad = cloud[rng.choice(n, size=num_points - n, replace=True)]
        return np.concatenate([cloud, pad], axis=0)
    return cloud[rng.choice(n, size=num_points, replace=False)]


def prefetch(iterator: Iterator, depth: int = 2,
             transform: Optional[Callable] = None) -> Iterator:
    """Run `iterator` in a background thread, `depth` batches ahead.

    `transform` (optional) runs on each item IN THE WORKER THREAD — the
    hook for jax.device_put, so host->device uploads (each a ~40 ms
    round-trip on the remote-tunnel backend) overlap with device compute
    instead of serializing in front of every step."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    err: List[BaseException] = []

    def worker():
        try:
            for item in iterator:
                if transform is not None:
                    item = transform(item)
                q.put(item)
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item
