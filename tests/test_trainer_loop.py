"""Trainer-loop driver tests + a small learning test (the reference has no
training tests at all; SURVEY.md §4 flags the gap)."""
import numpy as np

import jax
import jax.numpy as jnp

from feat3dnet_tpu.config import ModelConfig, TrainConfig
from feat3dnet_tpu.models import Feat3DNet
from feat3dnet_tpu.train.trainer import Trainer

CFG = ModelConfig(num_clusters=8, num_samples=8, feature_dim=16, base_scale=10.0,
                  detector_mlp=(8,), detector_mlp2=(8,), descriptor_mlp=(8, 8),
                  margin=1.0)
TCFG = TrainConfig(batch_size=2, num_points=64, learning_rate=1e-3)


def _iter(rng, n_batches):
    for _ in range(n_batches):
        a = rng.randn(2, 64, 3).astype(np.float32)
        p = a + 0.01 * rng.randn(2, 64, 3).astype(np.float32)
        n = a + 0.2 * rng.randn(2, 64, 3).astype(np.float32)
        yield tuple(jnp.asarray(x) for x in (a, p, n))


def test_trainer_fit_and_hooks(rng):
    model = Feat3DNet(CFG)
    trainer = Trainer(model, CFG, TCFG)
    state = trainer.init(jax.random.PRNGKey(0))

    hook_steps = []
    state, metrics = trainer.fit(
        state, _iter(rng, 7), num_steps=100,
        hooks={3: lambda s, m: hook_steps.append(int(s.step))})
    assert int(state.step) == 7          # iterator exhausted before num_steps
    assert hook_steps == [3, 6]
    assert np.isfinite(float(metrics["loss"]))


def test_trainer_learns(rng):
    """Mean loss over the last steps must drop below the first step's loss
    when feeding the same data distribution repeatedly."""
    model = Feat3DNet(CFG)
    trainer = Trainer(model, CFG, TCFG)
    state = trainer.init(jax.random.PRNGKey(0))

    fixed = list(_iter(rng, 2))
    losses = []
    for _ in range(15):
        state, metrics = trainer.fit(state, iter(fixed), num_steps=2)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_histogram_metrics_and_tensorboard(rng, tmp_path):
    """Train-step metrics carry the reference's TB-histogram equivalents
    (pts_cnt -> hist_det_cnt, normalized_attention) and MetricsWriter
    serializes them to JSONL + real TensorBoard event files."""
    from feat3dnet_tpu.utils.metrics_writer import MetricsWriter

    model = Feat3DNet(CFG)
    trainer = Trainer(model, CFG, TCFG)
    state = trainer.init(jax.random.PRNGKey(0))
    state, metrics = trainer.fit(state, _iter(rng, 2), num_steps=2)

    for key in ("hist_det_cnt", "hist_normalized_attention"):
        h = metrics[key]
        counts = np.asarray(h["counts"])
        assert counts.sum() == int(np.asarray(h["num"]))
        assert float(np.asarray(h["lo"])) <= float(np.asarray(h["hi"]))
    # det_cnt histogram covers [0, nsample]
    assert 0 <= float(np.asarray(metrics["hist_det_cnt"]["hi"])) <= CFG.num_samples

    w = MetricsWriter(str(tmp_path / "m.jsonl"), tensorboard=True)
    w.write(step=2, loss=float(metrics["loss"]), **{
        k: v for k, v in metrics.items() if k.startswith("hist_")})
    w.close()
    rows = w.read()
    assert rows and "hist_det_cnt" in rows[0]
    assert len(rows[0]["hist_det_cnt"]["counts"]) == 16
    tb_files = list((tmp_path / "tb").glob("events.out.tfevents.*"))
    assert tb_files and tb_files[0].stat().st_size > 0
