"""Two-process jax.distributed exercise of parallel/multihost.py.

No multi-host hardware exists in CI, so this spawns two REAL processes on
one machine, each a jax.distributed participant with 2 virtual CPU devices
(JAX's multi-controller runtime works on the CPU backend), and checks:

  * multihost.initialize(coordinator, n, id) brings up the cluster;
  * multihost.global_mesh() sees all 4 global devices from each process;
  * a psum over the mesh reduces across process boundaries;
  * multihost.shard_dataset gives each process a disjoint, complementary
    slice of the epoch order.

The workers run a fresh interpreter (no conftest jax pinning) so
jax.distributed owns its own backend setup.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("GLOO_SOCKET_IFNAME", "lo")  # localhost collectives
import jax
jax.config.update("jax_platforms", "cpu")

coordinator, pid = sys.argv[1], int(sys.argv[2])
sys.path.insert(0, sys.argv[3])

from feat3dnet_tpu.parallel import multihost

multihost.initialize(coordinator_address=coordinator, num_processes=2,
                     process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.local_devices()) == 2
mesh = multihost.global_mesh()
assert mesh.devices.size == 4, mesh

# Cross-process psum: each process contributes its local shard of a
# global (4,) array; the reduction must see all 4 devices.
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

sharding = NamedSharding(mesh, P("data"))
# each process contributes (process_id+1) per local device: global sum =
# 2*1 + 2*2 = 6 — wrong if either process's shard is missing or doubled
local = [jnp.full((1,), float(pid + 1), jnp.float32) for _ in jax.local_devices()]
garr = jax.make_array_from_single_device_arrays(
    (4,), sharding, [jax.device_put(x, d) for x, d in zip(local, jax.local_devices())])

total = jax.jit(lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P()))(garr)
assert float(total) == 6.0, float(total)

# Deterministic complementary data shards, no coordination traffic.
ds = multihost.shard_dataset(sys.argv[4])
order = ds.epoch_order(epoch=3)
print("SHARD", pid, ",".join(map(str, order)), flush=True)
print("OK", pid, flush=True)
"""


def test_two_process_distributed(tmp_path):
    # tiny 6-cloud dataset for shard_dataset
    lines = []
    for i in range(6):
        cloud = np.random.RandomState(i).randn(64, 6).astype(np.float32)
        cloud.tofile(tmp_path / f"{i}.bin")
        lines.append(f"{i}.bin | {(i + 1) % 6} | {(i + 2) % 6}")
    meta = tmp_path / "train.txt"
    meta.write_text("\n".join(lines))

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coordinator = f"localhost:{port}"

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coordinator, str(pid), repo, str(meta)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0 and f"OK {pid}" in out, \
            f"worker {pid} failed:\n{out}"

    # shards are disjoint and complementary (epoch_order interleaves by stride)
    shards = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("SHARD"):
                _, pid, order = line.split(" ", 2)
                shards[int(pid)] = [int(x) for x in order.split(",")]
    assert set(shards) == {0, 1}
    merged = np.empty(len(shards[0]) + len(shards[1]), int)
    merged[0::2], merged[1::2] = shards[0], shards[1]
    assert sorted(merged.tolist()) == list(range(6))
    assert not set(shards[0]) & set(shards[1])


TRAIN_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("GLOO_SOCKET_IFNAME", "lo")
import jax
jax.config.update("jax_platforms", "cpu")

coordinator, pid = sys.argv[1], int(sys.argv[2])
sys.path.insert(0, sys.argv[3])

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from feat3dnet_tpu.parallel import multihost
from feat3dnet_tpu.config import ModelConfig, TrainConfig
from feat3dnet_tpu.models import Feat3DNet
from feat3dnet_tpu.parallel import make_fused_dp_train_step
from feat3dnet_tpu.train.trainer import init_state

multihost.initialize(coordinator_address=coordinator, num_processes=2,
                     process_id=pid)
mesh = multihost.global_mesh()
assert mesh.devices.size == 4, mesh

cfg = ModelConfig(num_clusters=8, num_samples=8, feature_dim=16,
                  base_scale=10.0, detector_mlp=(8,), detector_mlp2=(8,),
                  descriptor_mlp=(8, 8))
tcfg = TrainConfig(batch_size=8, num_points=64)
model = Feat3DNet(cfg)
# identical init in both processes (same PRNGKey) -> host state arrays are
# process-identical and become fully replicated under in_shardings=repl
state, tx = init_state(model, tcfg, cfg, jax.random.PRNGKey(0))
step = make_fused_dp_train_step(model, tx, cfg.margin, cfg.attention, mesh,
                                donate_state=False)

# the SAME deterministic global batch the parent test computes its
# single-device reference from
rng = np.random.RandomState(0)
b, n = tcfg.batch_size, tcfg.num_points
anchors = rng.randn(b, n, 3).astype(np.float32)
positives = anchors + 0.01 * rng.randn(b, n, 3).astype(np.float32)
negatives = anchors + 0.2 * rng.randn(b, n, 3).astype(np.float32)
stacked = np.concatenate([anchors, positives, negatives], 0)   # (24, n, 3)

# distribute: each of the 4 global devices owns 6 rows; this process holds
# devices [2*pid, 2*pid+1]
sharding = NamedSharding(mesh, P("data"))
rows_per_dev = stacked.shape[0] // 4
local_devs = jax.local_devices()
shards = [jax.device_put(
              stacked[(2 * pid + i) * rows_per_dev:
                      (2 * pid + i + 1) * rows_per_dev], d)
          for i, d in enumerate(local_devs)]
batch = jax.make_array_from_single_device_arrays(
    stacked.shape, sharding, shards)

new_state, metrics = step(state, batch)
loss = float(metrics["loss"])
leaf = np.asarray(new_state.params["detection"]["conv0"]["conv2d"]["kernel"])
print("LOSS", pid, repr(loss), flush=True)
print("LEAFSUM", pid, repr(float(np.float64(leaf.ravel().astype(np.float64)
                                            .sum()))), flush=True)

# shard_map DP flavor (explicit psum BN/grad reductions) across the SAME
# 2-process global mesh — the fused-towers production DP path
from feat3dnet_tpu.parallel import make_shardmap_fused_dp_train_step
sm_model = Feat3DNet(cfg, bn_axis_name="data")
sm_step = make_shardmap_fused_dp_train_step(
    sm_model, tx, cfg.margin, cfg.attention, mesh, donate_state=False)
sm_state, sm_metrics = sm_step(state, batch)
print("SMLOSS", pid, repr(float(sm_metrics["loss"])), flush=True)
print("OK", pid, flush=True)
"""


def test_two_process_dp_train_step(tmp_path):
    """The actual workload across process boundaries (VERDICT r3 #9): the
    fused DP train step over the 2-process x 2-device global mesh must
    produce the same loss and post-step params as the single-process
    single-device step on the full batch — in both processes."""
    import jax
    import jax.numpy as jnp

    from feat3dnet_tpu.config import ModelConfig, TrainConfig
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.train.trainer import init_state, make_fused_train_step

    # single-device reference in THIS process (conftest CPU backend)
    cfg = ModelConfig(num_clusters=8, num_samples=8, feature_dim=16,
                      base_scale=10.0, detector_mlp=(8,), detector_mlp2=(8,),
                      descriptor_mlp=(8, 8))
    tcfg = TrainConfig(batch_size=8, num_points=64)
    model = Feat3DNet(cfg)
    state, tx = init_state(model, tcfg, cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_fused_train_step(model, tx, cfg.margin, cfg.attention))
    rng = np.random.RandomState(0)
    b, n = tcfg.batch_size, tcfg.num_points
    anchors = rng.randn(b, n, 3).astype(np.float32)
    positives = anchors + 0.01 * rng.randn(b, n, 3).astype(np.float32)
    negatives = anchors + 0.2 * rng.randn(b, n, 3).astype(np.float32)
    stacked = jnp.asarray(np.concatenate([anchors, positives, negatives], 0))
    ref_state, ref_metrics = step(state, stacked)
    ref_loss = float(ref_metrics["loss"])
    ref_leaf = np.asarray(
        ref_state.params["detection"]["conv0"]["conv2d"]["kernel"])
    ref_sum = float(ref_leaf.ravel().astype(np.float64).sum())

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coordinator = f"localhost:{port}"

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "train_worker.py"
    script.write_text(TRAIN_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coordinator, str(pid), repo],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0 and f"OK {pid}" in out, \
            f"worker {pid} failed:\n{out}"

    losses, sums, sm_losses = {}, {}, {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("LOSS"):
                _, pid, v = line.split(" ", 2)
                losses[int(pid)] = float(eval(v))
            if line.startswith("LEAFSUM"):
                _, pid, v = line.split(" ", 2)
                sums[int(pid)] = float(eval(v))
            if line.startswith("SMLOSS"):
                _, pid, v = line.split(" ", 2)
                sm_losses[int(pid)] = float(eval(v))
    assert set(losses) == {0, 1}
    # both processes agree with each other exactly (replicated outputs)
    assert losses[0] == losses[1]
    assert sums[0] == sums[1]
    # and with the single-process reference (same CPU backend numerics;
    # the DP grad all-reduce may reassociate the batch reduction)
    np.testing.assert_allclose(losses[0], ref_loss, rtol=1e-4)
    np.testing.assert_allclose(sums[0], ref_sum, rtol=1e-4)
    # shard_map DP flavor: replicated across processes, same loss envelope
    assert set(sm_losses) == {0, 1}
    assert sm_losses[0] == sm_losses[1]
    np.testing.assert_allclose(sm_losses[0], ref_loss, rtol=1e-4)
