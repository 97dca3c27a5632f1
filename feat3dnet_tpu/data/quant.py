"""Fixed-point int16 upload compression for training batches.

At the paper config every training step ships an (18, 4096, 3) f32 stack
= 884 KB host->device. Fixed-point int16 halves the bytes: the host
quantizes each stacked triplet batch to q = round(x / scale) with ONE f32
scale per stack (scale = max|x| / 32767), and the device dequantizes
inside the jitted step (q.astype(f32) * scale — fused into the
augmentation/grouping prologue by XLA).

Measured effect (remote-tunnel v5e, bench_train_step.py, 80 steps,
prefetch depth 2): f32-compute 29.3 -> 30.9 steps/s (+5% — the prefetch
thread already overlaps most of the upload with the 27 ms device step).
The win scales with the upload:compute ratio, so it matters on faster
steps (bf16 towers), slower links, or larger batches; chaining k steps
per dispatch was separately measured throughput-neutral (upload and
dispatch overlap, the link is the shared resource either way).

Worst-case coordinate error is scale/2 ≈ max|x| / 65534: 0.8 mm for a
±50 m cloud — two orders below the reference data's 0.2 m downsample
grid (scripts_data_processing/oxford/internal/processPointCloud.m:28)
and an order below its jitter augmentation noise (sigma=0.01,
data/augment.py:43-49), so training statistics are unaffected; still OPT-IN
(cli/train --upload_quant int16) because the input stream is no longer
bit-identical to the f32 path. No reference analogue (feed_dict ships
f32, train.py:155-158).
"""
from typing import Tuple

import numpy as np

__all__ = ["quantize_clouds", "QUANT_MAX"]

QUANT_MAX = 32767.0  # int16 full scale


def quantize_clouds(stacked: np.ndarray) -> Tuple[np.ndarray, np.float32]:
    """(…, 3) f32 coords -> (int16 q, f32 scale) with x ≈ q * scale.

    One scale per call (per uploaded stack). Round-to-nearest; worst-case
    abs error scale/2. Inputs are assumed finite (the loaders sanitize
    non-finite rows before batching).
    """
    stacked = np.asarray(stacked, np.float32)
    scale = np.float32(max(float(np.abs(stacked).max()), 1e-12) / QUANT_MAX)
    q = np.round(stacked / scale).astype(np.int16)
    return q, scale
