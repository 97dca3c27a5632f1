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


def make_shardmap_fused_dp_train_step(
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
    """shard_map flavor of make_fused_dp_train_step — the DP path for
    `cfg.fused_towers` models.

    GSPMD cannot partition a pallas_call, so the jit-with-shardings DP
    builders would run the fused tower kernels replicated (correct but no
    speedup). Here the train core runs INSIDE jax.shard_map on each
    device's local shard and the cross-device reductions are explicit:
    BN batch moments psum over `axis_name` (ops/fused_train._finalize_stats
    — the model must be constructed with bn_axis_name=axis_name, enforced
    below), gradients/loss pmean (trainer.make_train_step grad_reduce_axis),
    metric histograms all_gather. This keeps GLOBAL batch-norm statistics,
    matching the reference's single-GPU graph on the combined batch.

    Dequantization + augmentation stay OUTSIDE the shard_map in the same
    jit (GSPMD region): augmentation draws batch-shaped randoms, so running
    it on the global batch keeps the RNG stream identical to the
    single-device fused step. The (3B, N, 3) stacked batch is then
    reshaped to (3, B, N, 3) and sharded on the B axis so each device's
    local triplet split stays role-aligned (a contiguous (3B/d)-row slice
    of the stacked batch would mix anchors into positives).

    Equality with the single-device fused step is to tolerance, not
    bitwise: psum-of-partial-sums reassociates the BN moment and gradient
    reductions. Tested in tests/test_parallel.py.
    """
    step = _shardmap_fused_step(model, tx, margin, use_attention, mesh,
                                augmentations, aug_seed, axis_name)
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(axis_name))
    return jax.jit(
        step,
        in_shardings=(repl, (batch_sh, repl) if quantized else batch_sh),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate_state else (),
    )


def make_chained_shardmap_dp_train_step(
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
    """k shard_map DP steps scanned inside one executable — the chained
    (RTT-amortizing) flavor of make_shardmap_fused_dp_train_step, for
    `cfg.fused_towers` models. Batch: (k, 3B, N, >=3) sharded on the 3B
    axis (quantized: ((k, 3B, N, 3) int16, (k,) f32 scales))."""
    inner = _shardmap_fused_step(model, tx, margin, use_attention, mesh,
                                 augmentations, aug_seed, axis_name)

    def step(state: TrainState, clouds_k):
        return jax.lax.scan(inner, state, clouds_k)

    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(None, axis_name))
    return jax.jit(
        step,
        in_shardings=(repl, (batch_sh, repl) if quantized else batch_sh),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate_state else (),
    )


def _shardmap_fused_step(model, tx, margin, use_attention, mesh,
                         augmentations, aug_seed, axis_name):
    """Un-jitted shard_map fused step shared by the one-step and chained
    builders. Augmentation/dequant run in the GSPMD region (global RNG
    stream identical to the single-device fused step); the train core runs
    inside shard_map on role-aligned (3, B/d) shards with explicit psum
    reductions."""
    if getattr(model, "bn_axis_name", None) != axis_name:
        raise ValueError(
            "shard_map DP needs the model built with "
            f"bn_axis_name={axis_name!r} (got {getattr(model, 'bn_axis_name', None)!r}) "
            "so BN moments reduce over the mesh")
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec

    base = make_train_step(model, tx, margin, use_attention,
                           grad_reduce_axis=axis_name)
    core = base._train_core

    def local_core(state, stacked):
        # stacked: (3, B/d, N, 3) local shard -> (3*B/d, N, 3) role-aligned
        clouds = stacked.reshape((-1,) + stacked.shape[2:])
        return core(state, clouds)

    smapped = jax.shard_map(
        local_core, mesh=mesh,
        in_specs=(PartitionSpec(), PartitionSpec(None, axis_name)),
        out_specs=(PartitionSpec(), PartitionSpec()),
        check_vma=False)

    def step(state: TrainState, clouds):
        if isinstance(clouds, tuple):
            # int16 fixed-point upload (data/quant.py): dequantize on device
            q, scale = clouds
            clouds = q.astype(jnp.float32) * scale
        clouds = clouds[..., :3]
        if augmentations:
            from feat3dnet_tpu.data.augment import augment_clouds

            key = jax.random.fold_in(jax.random.PRNGKey(aug_seed), state.step)
            clouds = augment_clouds(key, clouds, augmentations)
        b3 = clouds.shape[0]
        stacked = clouds.reshape((3, b3 // 3) + clouds.shape[1:])
        return smapped(state, stacked)

    return step


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
