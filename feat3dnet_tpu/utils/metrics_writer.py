"""Training-metrics stream.

The reference uses TensorBoard summaries (scalar loss every 20 steps,
fp_rate from validation — train.py:160-178). TensorBoard isn't a
dependency here; metrics stream to an append-only JSONL file that any
dashboard (or the bundled plot helper) can tail.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any


class MetricsWriter:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path

    def write(self, **metrics: Any) -> None:
        metrics.setdefault("ts", time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(metrics) + "\n")

    def read(self):
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]
