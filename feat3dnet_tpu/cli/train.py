"""Training CLI.

Flag surface mirrors the reference driver (/root/reference/train.py:20-67)
so the train.sh two-stage recipe ports verbatim:

  python -m feat3dnet_tpu.cli.train --data_dir data/oxford \\
      --noattention --noregress --num_epochs 2 \\
      --augmentation Jitter RotateSmall Shift --log_dir ckpt_stage1

  python -m feat3dnet_tpu.cli.train --data_dir data/oxford \\
      --checkpoint ckpt_stage1 --restore_exclude detection \\
      --augmentation Jitter RotateSmall Shift Rotate1D --num_epochs 70

Differences from the reference, by design:
  * data-parallel over all local devices when --num_devices > 1;
  * augmentation runs on-device (fused), not in the host loop;
  * Orbax checkpoints instead of tf.train.Saver (TF1 npz checkpoints can be
    imported with --tf1_checkpoint).
"""
from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train 3DFeat-Net (TPU)")
    p.add_argument("--data_dim", type=int, default=6)
    p.add_argument("--data_dir", type=str, default="data/oxford",
                   help='Should contain "train" and "clusters" folders')
    p.add_argument("--model", type=str, default="3DFeatNet")
    p.add_argument("--noregress", action="store_true")
    p.add_argument("--noattention", action="store_true")
    p.add_argument("--margin", type=float, default=0.2)
    p.add_argument("--feature_dim", type=int, default=32, choices=[16, 32, 64, 128])
    p.add_argument("--num_points", type=int, default=4096)
    p.add_argument("--base_scale", type=float, default=2.0)
    p.add_argument("--num_samples", type=int, default=64)
    p.add_argument("--num_clusters", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=6)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--lr_schedule", type=str, default="constant",
                   choices=["constant", "cosine"],
                   help="'cosine': linear warmup then cosine decay to 0 "
                        "(framework extension — the reference trains at a "
                        "fixed lr). The schedule count lives in opt_state "
                        "and restores with the checkpoint, so a two-stage "
                        "recipe continues ONE global schedule when both "
                        "stages pass the same --decay_steps; both stages "
                        "must use the same --lr_schedule (the opt_state "
                        "structure differs between modes)")
    p.add_argument("--warmup_steps", type=int, default=0)
    p.add_argument("--decay_steps", type=int, default=0,
                   help="cosine horizon in optimizer steps; 0 = auto "
                        "(num_epochs x steps-per-epoch of THIS run)")
    p.add_argument("--augmentation", type=str, nargs="+",
                   default=["Jitter", "RotateSmall", "Shift", "Rotate1D"],
                   choices=["Jitter", "RotateSmall", "Rotate1D", "Scale", "Shift"])
    p.add_argument("--log_dir", type=str, default="./ckpt")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="Orbax checkpoint dir to restore")
    p.add_argument("--tf1_checkpoint", type=str, default=None,
                   help="npz export of a reference TF1 checkpoint")
    p.add_argument("--restore_exclude", type=str, nargs="+", default=None)
    p.add_argument("--freeze_scopes", type=str, nargs="+", default=None)
    p.add_argument("--num_epochs", type=int, default=1000)
    p.add_argument("--auto_resume", action="store_true",
                   help="resume from the latest checkpoint in --log_dir if "
                        "one exists (crash/preemption recovery)")
    p.add_argument("--summary_every_n_steps", type=int, default=20)
    p.add_argument("--tensorboard", action="store_true",
                   help="mirror metrics into TensorBoard event files (log_dir/tb)")
    p.add_argument("--validate_every_n_steps", type=int, default=250)
    p.add_argument("--checkpoint_every_n_steps", type=int, default=500)
    p.add_argument("--num_devices", type=int, default=1)
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="chain this many optimizer steps inside ONE device "
                        "dispatch (lax.scan) — amortizes the per-dispatch "
                        "latency (~40 ms on the remote-tunnel backend) over "
                        "k steps. Bit-equal to k single steps; checkpoint/"
                        "validation cadences round up to chunk boundaries")
    p.add_argument("--upload_quant", type=str, default="none",
                   choices=["none", "int16"],
                   help="compress the per-step host->device batch upload "
                        "to fixed-point int16 (data/quant.py): halves the "
                        "uploaded bytes at a worst-case coordinate error "
                        "of max|x|/65534 (~1 mm), far below the 0.2 m "
                        "data grid and the Jitter augmentation noise; "
                        "helps when upload time rivals the device step")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--remat_towers", action="store_true",
                   help="rematerialize the per-point tower segments in the "
                        "backward instead of saving their (…, ns, C) "
                        "activations — bit-exact; trades recompute for "
                        "HBM, for memory-constrained / large-batch runs")
    p.add_argument("--residual_dtype", type=str, default="none",
                   choices=["none", "bfloat16"],
                   help="store the towers' saved activations compressed "
                        "(bf16 quantize-dequantize save points; matmuls and "
                        "BN statistics stay in --compute_dtype) — halves "
                        "saved-residual HBM traffic without matmul "
                        "recompute; NOT bit-exact (see BENCHMARKS.md)")
    p.add_argument("--fused_towers", action="store_true",
                   help="run the training towers' pre-pool segments through "
                        "the fused Pallas fwd+bwd kernels (ops/fused_train) "
                        "instead of the default XLA towers — f32 training "
                        "only; same checkpoint tree; gradients agree in "
                        "direction, not bitwise (see BENCHMARKS.md). "
                        "Measured r5: 17.6 vs 25.1 ms/step (−30 %) — the "
                        "fastest f32 mode; bf16 XLA towers (16.1 ms) remain "
                        "the absolute frontier")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from feat3dnet_tpu.config import ModelConfig, TrainConfig
    from feat3dnet_tpu.data import TripletDataset, prefetch
    from feat3dnet_tpu.data.augment import resolve_augmentations
    from feat3dnet_tpu.eval import ClusterPairValidator
    from feat3dnet_tpu.models import get_network
    from feat3dnet_tpu.parallel import make_mesh
    from feat3dnet_tpu.train.trainer import init_state, make_optimizer
    from feat3dnet_tpu.utils import enable_compilation_cache
    from feat3dnet_tpu.utils.checkpoint import CheckpointManager
    from feat3dnet_tpu.utils.logging import setup_logging
    from feat3dnet_tpu.utils.metrics_writer import MetricsWriter

    enable_compilation_cache()
    logger = setup_logging(os.path.join(args.log_dir, "log.txt"))
    logger.info("Arguments: %s", vars(args))

    mcfg = ModelConfig(
        num_clusters=args.num_clusters, base_scale=args.base_scale,
        num_samples=args.num_samples, feature_dim=args.feature_dim,
        attention=not args.noattention, regress_orientation=not args.noregress,
        margin=args.margin,
        compute_dtype=jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32,
        remat_towers=args.remat_towers,
        residual_dtype=jnp.bfloat16 if args.residual_dtype == "bfloat16" else None,
        fused_towers=args.fused_towers)
    tcfg = TrainConfig(
        batch_size=args.batch_size, num_points=args.num_points,
        learning_rate=args.learning_rate, num_epochs=args.num_epochs,
        lr_schedule=args.lr_schedule, warmup_steps=args.warmup_steps,
        decay_steps=args.decay_steps,
        augmentations=tuple(args.augmentation),
        freeze_scopes=tuple(args.freeze_scopes) if args.freeze_scopes else None,
        seed=args.seed)

    model_cls = get_network(args.model)
    # fused_towers + DP runs the tower kernels inside shard_map, so the
    # model must reduce its BN moments over the mesh axis itself
    dp_shardmap = args.fused_towers and args.num_devices > 1
    model = model_cls(mcfg, bn_axis_name="data") if dp_shardmap else model_cls(mcfg)
    decay_steps = tcfg.decay_steps
    if tcfg.lr_schedule == "cosine" and decay_steps <= 0:
        # auto horizon: this run's planned optimizer steps (metadata-only
        # dataset load; the epoch iterator re-reads clouds lazily later)
        n_meta = TripletDataset(
            os.path.join(args.data_dir, "train/train.txt"),
            num_cols=args.data_dim, seed=args.seed).size
        decay_steps = max(1, (n_meta // tcfg.batch_size) * tcfg.num_epochs)
        logger.info("cosine lr: auto decay_steps=%d", decay_steps)
    tx = make_optimizer(tcfg.learning_rate, tcfg.freeze_scopes,
                        lr_schedule=tcfg.lr_schedule,
                        warmup_steps=tcfg.warmup_steps,
                        decay_steps=decay_steps)
    state, _ = init_state(model, tcfg, mcfg, jax.random.PRNGKey(args.seed), tx=tx)

    ckpt = CheckpointManager(os.path.join(args.log_dir, "ckpt"))
    if args.auto_resume and ckpt.latest_step() is not None:
        # Elastic recovery: preempted/crashed runs restart with the same
        # command and continue from the last saved step (the reference's
        # recovery story is a manual --checkpoint restart, train.py:203-204).
        state = ckpt.restore(state)
        logger.info("Auto-resumed from step %d", int(state.step))
    elif args.tf1_checkpoint:
        from feat3dnet_tpu.utils.tf1_loader import load_tf1_arrays, restore_tf1_variables
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        new_vars, restored, skipped = restore_tf1_variables(
            variables, load_tf1_arrays(args.tf1_checkpoint),
            restore_exclude=args.restore_exclude, ignore_missing=True)
        state = state.replace(params=new_vars["params"],
                              batch_stats=new_vars["batch_stats"])
        logger.info("TF1 restore: %d restored, %d skipped", len(restored), len(skipped))
    elif args.checkpoint:
        src = CheckpointManager(os.path.join(args.checkpoint, "ckpt")
                                if os.path.isdir(os.path.join(args.checkpoint, "ckpt"))
                                else args.checkpoint)
        state = src.restore(state, restore_exclude=args.restore_exclude)
        logger.info("Restored checkpoint at step %d", int(state.step))

    # Single-dispatch fused step everywhere: augmentation inside the jit,
    # aug key derived on device from state.step, one stacked (3B, N, 3)
    # upload per step (batch-sharded over the mesh when num_devices > 1 —
    # GSPMD inserts the grad all-reduce + global-BN moment reductions).
    aug_names = tuple(resolve_augmentations(tcfg.augmentations, tcfg.upright_axis))
    spd = max(1, args.steps_per_dispatch)
    quant = args.upload_quant == "int16"
    batch_sharding = None   # when quantized: (q sharding, scale sharding)
    if args.num_devices > 1:
        from jax.sharding import NamedSharding, PartitionSpec

        mesh = make_mesh(args.num_devices)
        repl = NamedSharding(mesh, PartitionSpec())
        if spd > 1:
            from feat3dnet_tpu.parallel import (
                make_chained_dp_train_step, make_chained_shardmap_dp_train_step)

            build_dp = (make_chained_shardmap_dp_train_step if dp_shardmap
                        else make_chained_dp_train_step)
            step_fn = build_dp(
                model, tx, mcfg.margin, mcfg.attention, mesh,
                augmentations=aug_names or None, aug_seed=args.seed + 1,
                quantized=quant)
            sh = NamedSharding(mesh, PartitionSpec(None, "data"))
        else:
            from feat3dnet_tpu.parallel import (
                make_fused_dp_train_step, make_shardmap_fused_dp_train_step)

            build_dp = (make_shardmap_fused_dp_train_step if dp_shardmap
                        else make_fused_dp_train_step)
            step_fn = build_dp(
                model, tx, mcfg.margin, mcfg.attention, mesh,
                augmentations=aug_names or None, aug_seed=args.seed + 1,
                quantized=quant)
            sh = NamedSharding(mesh, PartitionSpec("data"))
        batch_sharding = (sh, repl) if quant else sh
    else:
        from feat3dnet_tpu.train.trainer import (make_chained_train_step,
                                                 make_fused_train_step)

        build = make_chained_train_step if spd > 1 else make_fused_train_step
        step_fn = jax.jit(
            build(model, tx, mcfg.margin, mcfg.attention,
                  augmentations=aug_names or None,
                  aug_seed=args.seed + 1),
            donate_argnums=0)

    dataset = TripletDataset(os.path.join(args.data_dir, "train/train.txt"),
                             num_cols=args.data_dim, seed=args.seed)
    logger.info("Loaded train metadata: %d instances", dataset.size)

    val_folder = os.path.join(args.data_dir, "clusters")
    validator = None
    if os.path.exists(os.path.join(val_folder, "filenames.txt")):
        validator = ClusterPairValidator(model, mcfg, val_folder, args.data_dim)

    writer = MetricsWriter(os.path.join(args.log_dir, "metrics.jsonl"),
                           tensorboard=args.tensorboard)

    # stack the triplet(s) and upload from the prefetch worker thread —
    # one device transfer per dispatch, overlapped with compute
    def _upload(stacked, n_scales=None):
        if quant:
            from feat3dnet_tpu.data.quant import quantize_clouds

            q, scale = quantize_clouds(stacked)
            if n_scales is not None:   # chained: scan needs a (k,) leaf
                scale = np.full(n_scales, scale, np.float32)
            stacked = (q, scale)
        if batch_sharding is not None:
            return jax.device_put(stacked, batch_sharding)
        return jax.device_put(stacked)

    def to_device(batch):
        a, p, n = batch
        return _upload(
            np.concatenate([a[..., :3], p[..., :3], n[..., :3]], axis=0))

    def to_device_chunk(bufs):
        stacked = np.stack([np.concatenate(
            [a[..., :3], p[..., :3], n[..., :3]], axis=0) for a, p, n in bufs])
        return _upload(stacked, n_scales=len(bufs))

    def chunked(it, k):
        buf = []
        for b in it:
            buf.append(b)
            if len(buf) == k:
                yield buf
                buf = []
        if buf:    # epoch tail: a shorter chunk (one extra cached executable)
            yield buf

    def run_hooks(prev_step, new_step, metrics_k, stacked):
        """Fire summary/checkpoint/validation for inner steps in
        (prev_step, new_step]. When `stacked`, metric leaves carry a
        leading axis of length new_step - prev_step (one entry per inner
        step of the chained dispatch)."""
        nonlocal state
        r = new_step - prev_step
        hits = [j for j in range(r)
                if (prev_step + j + 1) % args.summary_every_n_steps == 0]
        if hits:
            # ONE batched fetch (device_get starts async copies for all
            # leaves first) — per-leaf np.asarray in the writer would pay
            # a ~40 ms tunnel round-trip per metric leaf
            host_k = jax.device_get(metrics_k)
            for j in hits:
                m = jax.tree.map(lambda x: x[j], host_k) if stacked else host_k
                loss = float(m["loss"])
                writer.write(step=prev_step + j + 1, loss=loss,
                             **{k: v for k, v in m.items() if k != "loss"})
            print(f"\rStep {prev_step + hits[-1] + 1}, Loss: {loss:.5f}",
                  end="", flush=True)
        if new_step // args.checkpoint_every_n_steps > prev_step // args.checkpoint_every_n_steps:
            ckpt.save(state)
        if validator is not None and (
                new_step // args.validate_every_n_steps > prev_step // args.validate_every_n_steps
                or prev_step == 0):
            fpr = validator({"params": state.params, "batch_stats": state.batch_stats})
            writer.write(step=new_step, fp_rate=fpr)
            logger.info("Step %d. FP Rate: %f", new_step, fpr)

    # host-side step mirror: state.step is step0 + i by construction, so
    # hook scheduling needs no per-step device->host readback (which would
    # serialize host batch prep with device compute)
    step = int(state.step)
    for epoch in range(args.num_epochs):
        logger.info("Starting epoch %d", epoch)
        batches = dataset.epoch_triplets(
            epoch, tcfg.batch_size, tcfg.num_points, tcfg.crop_radius)
        if spd == 1:
            for batch in prefetch(batches, transform=to_device):
                state, metrics = step_fn(state, batch)
                step += 1
                run_hooks(step - 1, step, metrics, stacked=False)
        else:
            for chunk in prefetch(chunked(batches, spd),
                                  transform=to_device_chunk):
                r = (chunk[0] if isinstance(chunk, tuple) else chunk).shape[0]
                state, metrics_k = step_fn(state, chunk)
                step += r
                run_hooks(step - r, step, metrics_k, stacked=True)
        print()
    ckpt.save(state)
    return state


if __name__ == "__main__":
    main()
