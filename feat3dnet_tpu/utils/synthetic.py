"""Shared synthetic workloads + extraction-agreement metrics.

Used by BOTH the on-chip gate (scripts/verify_on_chip.py) and the A/B
probes (benchmarks/probe_fused_detector.py) so the gate and the probes
measure exactly the same cloud with exactly the same metric — the two
previously hand-copied each other and could drift.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def synthetic_submap(n: int = 120000, seed: int = 7) -> np.ndarray:
    """The benchmark dense submap: n uniform points in a 100×100×10 m box
    (the 120k shape lands in the 131072 bucket — the scale where the
    scoped-VMEM layout rules bite), 6 columns (xyz + zeroed normals)."""
    rng = np.random.RandomState(seed)
    return np.concatenate([
        rng.rand(n, 3).astype(np.float32)
        * np.array([100, 100, 10], np.float32),
        np.zeros((n, 3), np.float32)], axis=1)


def keypoint_agreement(res_a, res_b) -> Dict[str, float]:
    """Agreement between two ExtractResults whose keypoint SETS may differ
    (e.g. rounding-divergent kernels flipping near-ties).

    Matches keypoints BY COORDINATE and compares attention only on the
    matched pairs — a slot-aligned comparison of `top_k`-sorted attention
    would only test the sorted value profile, not per-point agreement
    (it stays green even when high attention moves to different points).
    """
    def table(res):
        kp = np.asarray(res.keypoints[:res.num_keypoints])
        att = np.asarray(res.attention[:res.num_keypoints])
        return {tuple(k): float(v) for k, v in zip(kp, att)}

    ta, tb = table(res_a), table(res_b)
    matched = set(ta) & set(tb)
    overlap = len(matched) / max(len(ta), len(tb), 1)
    if matched:
        rel = max(abs(ta[k] - tb[k]) / max(abs(ta[k]), 1e-6)
                  for k in matched)
    else:
        rel = float("inf")
    return {"overlap": overlap, "att_relmax_matched": rel,
            "num_a": len(ta), "num_b": len(tb)}
