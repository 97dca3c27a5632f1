"""Quality metrics.

* FPR @ 95% recall — the reference's primary training-time metric
  (train.py:310-313; Readme.md:47): threshold at the 95th percentile of
  positive-pair descriptor distances, report the fraction of negative pairs
  below it.
* precision-vs-distance curves — the paper's Fig. 4 evaluation
  (scripts/fig4_step1.m:64, fig4_step2.m): a match is correct when the
  matched keypoint lands within 1.0 m of its groundtruth-transformed
  position.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def fpr_at_95_recall(positive_dist: np.ndarray, negative_dist: np.ndarray) -> float:
    """False-positive rate at the distance threshold giving 95% recall."""
    positive_dist = np.asarray(positive_dist)
    negative_dist = np.asarray(negative_dist)
    d_at_95 = np.percentile(positive_dist, 95)
    num_fp = np.count_nonzero(negative_dist < d_at_95)
    num_tn = negative_dist.size - num_fp
    return num_fp / max(num_fp + num_tn, 1)


def precision_at_thresholds(
    match_errors: np.ndarray,
    valid: np.ndarray,
    thresholds: Sequence[float] = (0.25, 0.5, 1.0, 2.0),
) -> dict:
    """Fraction of matches whose metric error is below each threshold.

    Args:
      match_errors: (N,) distance between matched keypoint (after applying
        the groundtruth transform) and its true correspondence.
      valid: (N,) bool — matches eligible for scoring (e.g. inside the
        0.75 m-intersection region, fig4_step1.m:9).
    """
    match_errors = np.asarray(match_errors)[np.asarray(valid, bool)]
    total = max(match_errors.size, 1)
    return {float(t): float(np.count_nonzero(match_errors < t)) / total
            for t in thresholds}
