"""Training-step tests: loss decreases, freezing works, state round-trips."""
import numpy as np

import jax
import jax.numpy as jnp

from feat3dnet_tpu.config import ModelConfig, TrainConfig
from feat3dnet_tpu.models import Feat3DNet
from feat3dnet_tpu.train.trainer import init_state, make_optimizer, make_train_step

CFG = ModelConfig(num_clusters=8, num_samples=8, feature_dim=16, base_scale=10.0,
                  detector_mlp=(8,), detector_mlp2=(8,), descriptor_mlp=(8, 8))
TCFG = TrainConfig(batch_size=2, num_points=64, learning_rate=1e-3)


def _triplet_batch(rng, b=2, n=64):
    # hard negatives (small perturbations of the anchor) so the hinge is
    # active at init and training has something to optimize.
    anchors = rng.randn(b, n, 3).astype(np.float32)
    positives = anchors + 0.01 * rng.randn(b, n, 3).astype(np.float32)
    negatives = anchors + 0.2 * rng.randn(b, n, 3).astype(np.float32)
    return tuple(jnp.asarray(x) for x in (anchors, positives, negatives))


def test_train_step_decreases_loss(rng):
    model = Feat3DNet(CFG)
    state, tx = init_state(model, TCFG, CFG, jax.random.PRNGKey(0))
    # margin=1.0 keeps the hinge active at init (random-init descriptors
    # already separate easy negatives beyond the paper margin of 0.2).
    step = jax.jit(make_train_step(model, tx, 1.0, CFG.attention))
    batch = _triplet_batch(rng)
    losses = []
    for _ in range(8):
        state, metrics = step(state, *batch)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 8
    assert losses[-1] < losses[0], losses


def test_freeze_scopes(rng):
    model = Feat3DNet(CFG)
    tx = make_optimizer(1e-3, freeze_scopes=["detection"])
    state, _ = init_state(model, TCFG, CFG, jax.random.PRNGKey(0), tx=tx)
    step = jax.jit(make_train_step(model, tx, 1.0, CFG.attention))  # active hinge
    before_det = jax.tree.map(np.asarray, state.params["detection"])
    before_desc = jax.tree.leaves(jax.tree.map(np.asarray, state.params["description"]))
    state, _ = step(state, *_triplet_batch(rng))
    after_det = state.params["detection"]
    after_desc = jax.tree.leaves(state.params["description"])
    # frozen scope unchanged
    for b, a in zip(jax.tree.leaves(before_det), jax.tree.leaves(after_det)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    # unfrozen scope moved
    assert any(not np.allclose(b, np.asarray(a)) for b, a in zip(before_desc, after_desc))


def test_cosine_lr_schedule(rng):
    """cosine make_optimizer: warmup ramps the update size up, the decay
    tail shrinks it to ~0 at the horizon; freeze composes; the schedule
    count restores with opt_state (two-stage continuation contract)."""
    import optax

    model = Feat3DNet(CFG)
    tx = make_optimizer(1e-3, lr_schedule="cosine", warmup_steps=4,
                        decay_steps=16)
    state, _ = init_state(model, TCFG, CFG, jax.random.PRNGKey(0), tx=tx)
    step = jax.jit(make_train_step(model, tx, 1.0, CFG.attention))
    batch = _triplet_batch(rng)

    def norm_delta(s0, s1):
        return float(optax.global_norm(jax.tree.map(
            lambda a, b: a - b, s0.params, s1.params)))

    deltas = []
    for _ in range(16):
        prev = state
        state, _ = step(state, *batch)
        deltas.append(norm_delta(prev, state))
    assert deltas[0] < deltas[3]          # warmup ramps up
    assert deltas[-1] < 0.25 * max(deltas)  # decayed tail
    # the schedule count is part of opt_state (it checkpoints/restores)
    counts = [int(np.asarray(leaf)) for path, leaf in
              jax.tree_util.tree_flatten_with_path(state.opt_state)[0]
              if np.asarray(leaf).ndim == 0 and
              np.asarray(leaf).dtype == np.int32]
    assert 16 in counts, counts
    # freeze + cosine compose
    tx2 = make_optimizer(1e-3, freeze_scopes=["detection"],
                         lr_schedule="cosine", decay_steps=8)
    s2, _ = init_state(model, TCFG, CFG, jax.random.PRNGKey(0), tx=tx2)
    step2 = jax.jit(make_train_step(model, tx2, 1.0, CFG.attention))
    before_det = jax.tree.map(np.asarray, s2.params["detection"])
    s2, _ = step2(s2, *batch)
    for b, a in zip(jax.tree.leaves(before_det),
                    jax.tree.leaves(s2.params["detection"])):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


def test_stage1_config_noattention_noregress(rng):
    """Stage 1 of train.sh: --noattention --noregress (unweighted loss,
    no orientation canonicalization)."""
    cfg = ModelConfig(num_clusters=8, num_samples=8, feature_dim=16, base_scale=10.0,
                      attention=False, regress_orientation=False,
                      detector_mlp=(8,), detector_mlp2=(8,), descriptor_mlp=(8, 8))
    model = Feat3DNet(cfg)
    state, tx = init_state(model, TCFG, cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, tx, cfg.margin, cfg.attention))
    state, metrics = step(state, *_triplet_batch(rng))
    assert np.isfinite(float(metrics["loss"]))


def test_fused_train_step_matches_unfused(rng):
    """make_fused_train_step on the stacked batch must be bit-equivalent to
    make_train_step on the triplet (no augmentations)."""
    from feat3dnet_tpu.train.trainer import make_fused_train_step

    model = Feat3DNet(CFG)
    state1, tx = init_state(model, TCFG, CFG, jax.random.PRNGKey(0))
    state2 = jax.tree.map(lambda x: x, state1)
    step = jax.jit(make_train_step(model, tx, 1.0, CFG.attention))
    fused = jax.jit(make_fused_train_step(model, tx, 1.0, CFG.attention))
    a, p, n = _triplet_batch(rng)
    stacked = jnp.concatenate([a, p, n], axis=0)
    for _ in range(3):
        state1, m1 = step(state1, a, p, n)
        state2, m2 = fused(state2, stacked)
    assert float(m1["loss"]) == float(m2["loss"])
    jax.tree.map(np.testing.assert_array_equal, state1.params, state2.params)


def test_fused_train_step_augmented_deterministic(rng):
    """Augmentation inside the fused step: deterministic per state.step and
    actually perturbs the inputs (loss differs from the unaugmented step)."""
    from feat3dnet_tpu.train.trainer import make_fused_train_step

    model = Feat3DNet(CFG)
    state, tx = init_state(model, TCFG, CFG, jax.random.PRNGKey(0))
    state_b = jax.tree.map(lambda x: x, state)
    fused = jax.jit(make_fused_train_step(
        model, tx, 1.0, CFG.attention,
        augmentations=("RotateSmall", "Jitter"), aug_seed=7))
    plain = jax.jit(make_fused_train_step(model, tx, 1.0, CFG.attention))
    a, p, n = _triplet_batch(rng)
    stacked = jnp.concatenate([a, p, n], axis=0)
    _, m1 = fused(state, stacked)
    _, m1b = fused(state_b, stacked)
    assert float(m1["loss"]) == float(m1b["loss"])   # same step -> same key
    _, m2 = plain(state_b, stacked)
    assert float(m1["loss"]) != float(m2["loss"])


def test_remat_step_matches_plain(rng):
    """remat=True recomputes the forward in the backward pass — the step
    outputs (loss, params, batch_stats) must be identical to the plain
    step (same primals, same cotangents, just not saved)."""
    model = Feat3DNet(CFG)
    state, tx = init_state(model, TCFG, CFG, jax.random.PRNGKey(0))
    plain = jax.jit(make_train_step(model, tx, 1.0, CFG.attention))
    remat = jax.jit(make_train_step(model, tx, 1.0, CFG.attention,
                                    remat=True))
    batch = _triplet_batch(rng)
    s_p, m_p = plain(state, *batch)
    s_r, m_r = remat(state, *batch)
    np.testing.assert_allclose(float(m_r["loss"]), float(m_p["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_p.params), jax.tree.leaves(s_r.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree.leaves(s_p.batch_stats),
                    jax.tree.leaves(s_r.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
