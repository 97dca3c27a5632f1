"""Training-metrics stream.

The reference emits TensorBoard summaries: scalar loss every 20 steps,
fp_rate from validation (train.py:160-178), plus histograms of pts_cnt
(pointnet_common.py:41) and normalized_attention (feat3dnet.py:346).
Metrics stream to an append-only JSONL file (scalars AND 16-bin histogram
summaries) that any dashboard can tail; pass tensorboard=True to mirror
into real TensorBoard event files (torch.utils.tensorboard) as well.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict


def device_histogram(x, bins: int = 16) -> Dict[str, Any]:
    """Fixed-bin histogram computed ON DEVICE inside the train step (no
    extra host transfers beyond the metrics fetch): the TB-histogram
    equivalent for the reference's pts_cnt / normalized_attention
    summaries. Returns a dict of jnp scalars/arrays."""
    import jax.numpy as jnp

    x = x.reshape(-1).astype(jnp.float32)
    lo, hi = jnp.min(x), jnp.max(x)
    width = jnp.maximum(hi - lo, 1e-12)
    b = jnp.clip(((x - lo) / width * bins).astype(jnp.int32), 0, bins - 1)
    counts = jnp.zeros((bins,), jnp.int32).at[b].add(1)
    return {"lo": lo, "hi": hi, "counts": counts,
            "num": jnp.int32(x.shape[0]), "sum": jnp.sum(x),
            "sum_sq": jnp.sum(x * x)}


def _to_jsonable(v):
    import numpy as np

    if isinstance(v, dict):
        return {k: _to_jsonable(x) for k, x in v.items()}
    a = np.asarray(v)
    if a.ndim == 0:
        return a.item()
    return a.tolist()


class MetricsWriter:
    def __init__(self, path: str, tensorboard: bool = False):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        self._tb = None
        if tensorboard:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(
                os.path.join(os.path.dirname(os.path.abspath(path)), "tb"))

    def write(self, **metrics: Any) -> None:
        metrics = {k: _to_jsonable(v) for k, v in metrics.items()}
        metrics.setdefault("ts", time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(metrics) + "\n")
        if self._tb is not None:
            self._write_tb(metrics)

    def _write_tb(self, metrics: Dict[str, Any]) -> None:
        step = int(metrics.get("step", 0))
        for k, v in metrics.items():
            if k in ("step", "ts"):
                continue
            if isinstance(v, dict) and "counts" in v:  # histogram summary
                bins = len(v["counts"])
                width = max(v["hi"] - v["lo"], 1e-12) / bins
                limits = [v["lo"] + width * (i + 1) for i in range(bins)]
                self._tb.add_histogram_raw(
                    k, min=v["lo"], max=v["hi"], num=v["num"], sum=v["sum"],
                    sum_squares=v["sum_sq"], bucket_limits=limits,
                    bucket_counts=v["counts"], global_step=step)
            elif isinstance(v, (int, float)):
                self._tb.add_scalar(k, v, step)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()

    def read(self):
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]
