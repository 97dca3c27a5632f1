"""Data-parallel training over a mesh.

Design: the single-device train step (train/trainer.py) is jit-compiled
with NamedShardings — params/opt-state replicated, triplet batch sharded on
its leading axis. Under GSPMD, XLA partitions the forward/backward and
inserts the gradient all-reduce (and the cross-device batch-norm moment
reductions) over ICI automatically; there is no hand-written collective
anywhere, exactly as the sharding recipe prescribes (pick a mesh, annotate,
let XLA insert collectives).

This gives GLOBAL batch-norm statistics — bitwise equivalent to running the
reference's single-GPU graph on the combined batch, which per-device local
BN (the pmap-era pattern) is not.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from feat3dnet_tpu.models.feat3dnet import Feat3DNet
from feat3dnet_tpu.train.trainer import (TrainState, make_fused_train_step,
                                         make_train_step)


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a host batch (tuple of (B, ...) arrays) batch-sharded on the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def make_dp_train_step(
    model: Feat3DNet,
    tx: optax.GradientTransformation,
    margin: float,
    use_attention: bool,
    mesh: Mesh,
    axis_name: str = "data",
    donate_state: bool = True,
) -> Callable[[TrainState, jax.Array, jax.Array, jax.Array], Tuple[TrainState, dict]]:
    """jit the train step with DP shardings over `mesh`.

    Batch requirement: (3 ×) batch_size must be divisible by the mesh size.
    """
    step = make_train_step(model, tx, margin, use_attention)
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(axis_name))
    return jax.jit(
        step,
        in_shardings=(repl, batch_sh, batch_sh, batch_sh),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate_state else (),
    )


def make_fused_dp_train_step(
    model: Feat3DNet,
    tx: optax.GradientTransformation,
    margin: float,
    use_attention: bool,
    mesh: Mesh,
    augmentations=None,
    aug_seed: int = 0,
    axis_name: str = "data",
    donate_state: bool = True,
    quantized: bool = False,
) -> Callable[[TrainState, jax.Array], Tuple[TrainState, dict]]:
    """DP version of make_fused_train_step: ONE stacked (3B, N, 3) batch
    array sharded on its leading axis, augmentation + step in one
    executable. Each of the three B-row segments must split across the
    mesh (batch_size divisible by the mesh size), so the triplet split
    inside the step stays shard-aligned. With `quantized`, the batch is
    the (int16 q, f32 scale) pair from data/quant.quantize_clouds — q
    sharded, scale replicated."""
    step = make_fused_train_step(model, tx, margin, use_attention,
                                 augmentations=augmentations,
                                 aug_seed=aug_seed)
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(axis_name))
    return jax.jit(
        step,
        in_shardings=(repl, (batch_sh, repl) if quantized else batch_sh),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate_state else (),
    )


def make_chained_dp_train_step(
    model: Feat3DNet,
    tx: optax.GradientTransformation,
    margin: float,
    use_attention: bool,
    mesh: Mesh,
    augmentations=None,
    aug_seed: int = 0,
    axis_name: str = "data",
    donate_state: bool = True,
    quantized: bool = False,
) -> Callable[[TrainState, jax.Array], Tuple[TrainState, dict]]:
    """DP version of trainer.make_chained_train_step: ONE (k, 3B, N, >=3)
    stack of k triplet batches, sharded on the 3B axis, k steps scanned
    inside one executable (amortizes the per-dispatch tunnel RTT over k
    steps; XLA still inserts the per-step grad all-reduce inside the scan
    body). Returns (state, metrics_k) with a leading k axis on every
    metric leaf. With `quantized`, the batch is the ((k, 3B, N, 3) int16,
    (k,) f32 scales) pair — q sharded on the 3B axis, scales replicated."""
    from feat3dnet_tpu.train.trainer import make_chained_train_step

    step = make_chained_train_step(model, tx, margin, use_attention,
                                   augmentations=augmentations,
                                   aug_seed=aug_seed)
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(None, axis_name))
    return jax.jit(
        step,
        in_shardings=(repl, (batch_sh, repl) if quantized else batch_sh),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate_state else (),
    )
