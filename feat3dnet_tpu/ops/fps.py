"""Farthest point sampling.

Parity target: reference CUDA kernel `farthestpointsamplingKernel`
(/root/reference/tf_ops/sampling/tf_sampling_g.cu:105-170): deterministic
start at index 0, per-point running min of squared distances to the chosen
set (init 1e38), argmax of that array picks each next point. The only
sequential dependency is across the `npoint` steps; each step is a parallel
distance-update + argmax — exactly the shape SURVEY.md §2.1 flags as the
hard kernel.

Two implementations:

* `farthest_point_sample` — a `lax.scan` over steps; each step is fused
  VPU work on (B, N). This is the portable path (CPU tests, autodiff-free).
* `farthest_point_sample_pallas` — a Pallas kernel that keeps coordinates
  and the min-distance array resident in VMEM across all `npoint` steps
  (grid over batch), so the loop never round-trips HBM. Coordinates are
  laid out (3, N): N on the 128-lane axis, which is what the VPU wants —
  the reference's (N, 3) layout would waste 125/128 lanes.

Neither has a gradient; the reference registers none either
(tf_sampling.py:57). Ties in the argmax resolve to the lowest index (same
as the CUDA tree reduction's bias toward lower thread indices).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_INIT_DIST = 1e38  # reference temp init (tf_sampling_g.cu:118)


def farthest_point_sample(
    xyz: Array, npoint: int, valid_mask: Optional[Array] = None
) -> Array:
    """Iterative FPS: (B, N, 3) -> (B, npoint) int32 indices.

    Dispatches to the Pallas VMEM-resident kernel on TPU (the whole
    npoint-step loop runs on-chip without HBM round-trips) and the lax.scan
    formulation elsewhere; both match the reference kernel index-exactly.

    Args:
      xyz: points. Padded entries allowed if valid_mask is given.
      npoint: number of samples (static).
      valid_mask: optional (B, N) bool; invalid points are never selected
        (the reference has no masking — clouds are pre-duplicated to size).
    """
    # Pallas path only for the shapes/dtypes the kernel supports; anything
    # else (extra batch dims, tiny npoint, non-f32, non-TPU backends — note
    # jax.default_backend() reflects the default device, so force the scan
    # explicitly when placing work on CPU from a TPU host) uses the scan.
    if (jax.default_backend() == "tpu" and xyz.ndim == 3
            and xyz.dtype == jnp.float32 and npoint > 1
            and xyz.shape[1] > 128  # Mosaic argmax fails on a single 128-lane tile
            and xyz.shape[0] * xyz.shape[1] <= 600_000):  # ~12 MB VMEM budget
        return farthest_point_sample_pallas(xyz, npoint, valid_mask=valid_mask)
    return farthest_point_sample_scan(xyz, npoint, valid_mask=valid_mask)


@partial(jax.jit, static_argnames=("npoint",))
def farthest_point_sample_scan(
    xyz: Array, npoint: int, valid_mask: Optional[Array] = None
) -> Array:
    """lax.scan FPS (portable reference implementation)."""
    n = xyz.shape[-2]
    select_penalty = None
    if valid_mask is not None:
        # Invalid points can never win the argmax.
        select_penalty = jnp.where(valid_mask, 0.0, -jnp.inf).astype(xyz.dtype)

    def step(carry, _):
        mindist, last = carry
        sel = jnp.take_along_axis(xyz, last[..., None, None], axis=-2)  # (B, 1, 3)
        d = jnp.sum(jnp.square(xyz - sel), axis=-1)                      # (B, N)
        mindist = jnp.minimum(mindist, d)
        score = mindist if select_penalty is None else mindist + select_penalty
        nxt = jnp.argmax(score, axis=-1).astype(jnp.int32)               # (B,)
        return (mindist, nxt), nxt

    batch = xyz.shape[:-2]
    init = (
        jnp.full(batch + (n,), _INIT_DIST, dtype=xyz.dtype),
        jnp.zeros(batch, dtype=jnp.int32),  # start at index 0 (tf_sampling_g.cu:114)
    )
    if npoint <= 1:
        return jnp.zeros(batch + (npoint,), dtype=jnp.int32)
    _, rest = jax.lax.scan(step, init, None, length=npoint - 1)
    rest = jnp.moveaxis(rest, 0, -1)                                     # (B, npoint-1)
    return jnp.concatenate([jnp.zeros(batch + (1,), jnp.int32), rest], axis=-1)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _fps_kernel(xyz_ref, mask_ref, idx_ref, mindist_ref, *, npoint: int,
                n: int, b: int):
    """Whole batch in one invocation — every step is (B, N) VPU work, so
    independent batch elements advance in lockstep instead of serializing
    across grid iterations (18 clouds × 512 steps lockstep beats 18
    sequential 512-step loops on a single core).

    Shapes: xyz_ref (3, B, N), mask_ref (B, N) int32, idx_ref (B, npoint),
    mindist scratch (B, N).
    """
    lanes = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    slot_lanes = jax.lax.broadcasted_iota(jnp.int32, (b, npoint), 1)

    mindist_ref[:] = jnp.full((b, n), _INIT_DIST, dtype=jnp.float32)
    idx_ref[:] = jnp.zeros((b, npoint), jnp.int32)  # slot 0 = start index 0

    penalty = jnp.where(mask_ref[:] != 0, 0.0, -jnp.inf)                # (B, N)

    def body(j, last):
        # last: (B, 1) currently-selected index per cloud. Fetch its coords
        # with a one-hot reduction — a lane-dim dynamic gather would
        # serialize; this is three fused VPU passes over (B, N).
        onehot = (lanes == last).astype(jnp.float32)                    # (B, N)
        d = jnp.zeros((b, n), jnp.float32)
        for c in range(3):
            row = xyz_ref[c]                                            # (B, N)
            sel = jnp.sum(row * onehot, axis=1, keepdims=True)          # (B, 1)
            diff = row - sel
            d = d + diff * diff
        md = jnp.minimum(mindist_ref[:], d)
        mindist_ref[:] = md
        nxt = jnp.argmax(md + penalty, axis=1, keepdims=True).astype(jnp.int32)
        # Masked column update — Mosaic forbids scalar stores to VMEM.
        idx_ref[:] = jnp.where(slot_lanes == j, nxt, idx_ref[:])
        return nxt

    jax.lax.fori_loop(1, npoint, body, jnp.zeros((b, 1), jnp.int32))


@partial(jax.jit, static_argnames=("npoint",))
def farthest_point_sample_pallas(
    xyz: Array, npoint: int, valid_mask: Optional[Array] = None
) -> Array:
    """Pallas FPS: the whole (B, npoint)-step loop on-chip, batch-vectorized.

    VMEM footprint: ~(3+2)·B·N·4 B — e.g. 1.8 MB for the training shape
    (18, 4096) and 2.5 MB for a single 131072-pt cloud, well inside ~16 MB.
    Falls back to the scan implementation upstream when B·N grows past the
    VMEM budget (farthest_point_sample dispatch).
    """
    b, n, _ = xyz.shape
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (2, 0, 1))  # (3, B, N)
    if valid_mask is None:
        mask = jnp.ones((b, n), dtype=jnp.int32)
    else:
        mask = valid_mask.astype(jnp.int32)

    out = pl.pallas_call(
        partial(_fps_kernel, npoint=npoint, n=n, b=b),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((b, n), jnp.float32)],
    )(xyz_t, mask)
    return out
