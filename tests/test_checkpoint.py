"""Checkpoint tests: Orbax round-trip + scope exclusion; TF1 name mapping."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from feat3dnet_tpu.config import ModelConfig, TrainConfig
from feat3dnet_tpu.models import Feat3DNet
from feat3dnet_tpu.train.trainer import init_state
from feat3dnet_tpu.utils.checkpoint import CheckpointManager
from feat3dnet_tpu.utils.tf1_loader import restore_tf1_variables

CFG = ModelConfig(num_clusters=8, num_samples=8, feature_dim=16, base_scale=10.0,
                  detector_mlp=(8,), detector_mlp2=(8,), descriptor_mlp=(8, 8))


def _state():
    model = Feat3DNet(CFG)
    state, _ = init_state(model, TrainConfig(num_points=64), CFG, jax.random.PRNGKey(0))
    return state


def _perturb(state, delta=1.0):
    return state.replace(
        step=state.step + 41,
        params=jax.tree.map(lambda x: x + delta, state.params))


def test_orbax_roundtrip(tmp_path):
    state = _state()
    saved = _perturb(state)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(saved)
    restored = mgr.restore(state)
    assert int(restored.step) == 41
    for a, b in zip(jax.tree.leaves(saved.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_restore_exclude_scope(tmp_path):
    """Stage-2 recipe: restore everything except 'detection'."""
    init = _state()
    saved = _perturb(init)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(saved)
    restored = mgr.restore(init, restore_exclude=["detection"])
    # detection = fresh init; description = checkpoint values
    for a, b in zip(jax.tree.leaves(init.params["detection"]),
                    jax.tree.leaves(restored.params["detection"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(saved.params["description"]),
                    jax.tree.leaves(restored.params["description"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _tf1_arrays_for(variables):
    """Synthesize a TF1-named array dict covering the full variable tree."""
    arrays = {}

    def add_convbn(tf_scope, tree_params, tree_stats):
        ci, co = np.shape(tree_params["conv2d"]["kernel"])
        arrays[f"{tf_scope}/conv2d/weights"] = np.random.randn(1, 1, ci, co).astype(np.float32)
        arrays[f"{tf_scope}/conv2d/biases"] = np.random.randn(co).astype(np.float32)
        arrays[f"{tf_scope}/bn/beta"] = np.random.randn(co).astype(np.float32)
        arrays[f"{tf_scope}/bn/gamma"] = np.random.randn(co).astype(np.float32)
        arrays[f"{tf_scope}/bn/moments/Squeeze/ExponentialMovingAverage"] = \
            np.random.randn(co).astype(np.float32)
        arrays[f"{tf_scope}/bn/moments/Squeeze_1/ExponentialMovingAverage"] = \
            np.abs(np.random.randn(co)).astype(np.float32)

    p = variables["params"]
    s = variables["batch_stats"]
    for i in range(len(CFG.detector_mlp)):
        add_convbn(f"detection/conv{i}", p["detection"][f"conv{i}"], s)
    for i in range(len(CFG.detector_mlp2)):
        add_convbn(f"detection/conv_post_{i}", p["detection"][f"conv_post_{i}"], s)
    for head in ("attention", "orientation"):
        ci, co = np.shape(p["detection"][head]["kernel"])
        arrays[f"detection/{head}/conv2d/weights"] = np.random.randn(1, 1, ci, co).astype(np.float32)
        arrays[f"detection/{head}/conv2d/biases"] = np.random.randn(co).astype(np.float32)
    for i in range(len(CFG.descriptor_mlp)):
        add_convbn(f"description/layer1/conv{i}", p["description"][f"conv{i}"], s)
    add_convbn("description/layer1/conv_mid_0", p["description"]["conv_mid_0"], s)
    add_convbn("description/layer1/conv_post_0", p["description"]["conv_post_0"], s)
    # noise that must be skipped
    arrays["global_step"] = np.int64(7)
    arrays["detection/conv0/conv2d/weights/Adam"] = np.zeros((1, 1, 3, 8), np.float32)
    arrays["beta1_power"] = np.float32(0.9)
    return arrays


def test_tf1_name_mapping_full_coverage():
    model = Feat3DNet(CFG)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 3)), training=False)
    np.random.seed(0)
    arrays = _tf1_arrays_for(variables)
    new_vars, restored, skipped = restore_tf1_variables(variables, arrays)

    assert "global_step" in skipped
    assert any("Adam" in s for s in skipped)
    # every conv kernel got the checkpoint value
    w = arrays["detection/conv0/conv2d/weights"][0, 0]
    np.testing.assert_array_equal(new_vars["params"]["detection"]["conv0"]["conv2d"]["kernel"], w)
    # descriptor 'layer1' flattening worked
    w = arrays["description/layer1/conv_mid_0/conv2d/weights"][0, 0]
    np.testing.assert_array_equal(new_vars["params"]["description"]["conv_mid_0"]["conv2d"]["kernel"], w)
    # EMA stats landed in batch_stats
    m = arrays["detection/conv0/bn/moments/Squeeze/ExponentialMovingAverage"]
    np.testing.assert_array_equal(new_vars["batch_stats"]["detection"]["conv0"]["bn"]["mean"], m)
    v = arrays["detection/conv0/bn/moments/Squeeze_1/ExponentialMovingAverage"]
    np.testing.assert_array_equal(new_vars["batch_stats"]["detection"]["conv0"]["bn"]["var"], v)
    # heads mapped without inner conv2d level
    w = arrays["detection/attention/conv2d/weights"][0, 0]
    np.testing.assert_array_equal(new_vars["params"]["detection"]["attention"]["kernel"], w)
    # the model must run with the restored variables
    model.apply(new_vars, jnp.zeros((1, 64, 3)), training=False)


def test_tf1_restore_exclude():
    model = Feat3DNet(CFG)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 3)), training=False)
    np.random.seed(0)
    arrays = _tf1_arrays_for(variables)
    new_vars, restored, skipped = restore_tf1_variables(
        variables, arrays, restore_exclude=["detection"])
    orig = np.asarray(variables["params"]["detection"]["conv0"]["conv2d"]["kernel"])
    np.testing.assert_array_equal(
        new_vars["params"]["detection"]["conv0"]["conv2d"]["kernel"], orig)
    w = arrays["description/layer1/conv0/conv2d/weights"][0, 0]
    np.testing.assert_array_equal(
        new_vars["params"]["description"]["conv0"]["conv2d"]["kernel"], w)


def test_tf1_export_restore_roundtrip():
    """export_tf1_arrays -> restore_tf1_variables is the identity: the
    regression lock on the name mapping in both directions."""
    from feat3dnet_tpu.utils.tf1_loader import export_tf1_arrays

    model = Feat3DNet(CFG)
    src = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 3)), training=False)
    src = jax.tree.map(lambda x: x + np.random.RandomState(0).randn(*x.shape)
                       .astype(np.float32), src)
    arrays = export_tf1_arrays(src)
    dst = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 64, 3)), training=False)
    restored, names, skipped = restore_tf1_variables(dst, arrays)
    assert not skipped
    assert len(names) == len(arrays)
    for a, b in zip(jax.tree.leaves(src), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tf1_export_names_match_reference_convention():
    """Exported names must be exactly the reference Saver names (the
    synthetic dict in _tf1_arrays_for encodes that convention)."""
    from feat3dnet_tpu.utils.tf1_loader import export_tf1_arrays

    model = Feat3DNet(CFG)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 3)), training=False)
    np.random.seed(0)
    reference_names = {n for n in _tf1_arrays_for(variables)
                       if "Adam" not in n and n not in ("global_step", "beta1_power")}
    assert set(export_tf1_arrays(variables)) == reference_names


def test_tf1_golden_fixture_regression():
    """Frozen fixture: restoring tests/fixtures/tf1_golden.npz and running
    the model must reproduce the committed descriptors/attention. Locks the
    name mapping AND the model's numerical semantics; regenerate only
    deliberately via scripts/make_golden_fixture.py."""
    import os

    fdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
    arrays = dict(np.load(os.path.join(fdir, "tf1_golden.npz")))
    expected = np.load(os.path.join(fdir, "tf1_golden_expected.npz"))

    cfg = ModelConfig(num_clusters=8, num_samples=8, feature_dim=16,
                      base_scale=10.0, detector_mlp=(8, 16), detector_mlp2=(8,),
                      descriptor_mlp=(8, 8))
    model = Feat3DNet(cfg)
    fresh = model.init(jax.random.PRNGKey(9), jnp.zeros((1, 64, 3)), training=False)
    restored, names, skipped = restore_tf1_variables(fresh, arrays)
    assert not skipped
    out = model.apply(restored, jnp.asarray(expected["cloud"]), training=False,
                      keypoints=jnp.asarray(expected["keypoints"]))
    np.testing.assert_allclose(np.asarray(out.features), expected["features"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.end_points["attention"]),
                               expected["attention"], rtol=1e-5, atol=1e-5)


def test_tf1_shape_mismatch_raises():
    model = Feat3DNet(CFG)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 3)), training=False)
    arrays = {"detection/conv0/conv2d/weights": np.zeros((1, 1, 5, 5), np.float32)}
    with pytest.raises(ValueError):
        restore_tf1_variables(variables, arrays)


def test_restore_exclude_resets_optimizer_slots(tmp_path):
    """Adam moments under an excluded scope must come from init, not the
    checkpoint (reference Saver var_list semantics)."""
    import optax
    state = _state()
    # fabricate nonzero moments by perturbing the whole opt_state
    dirty = state.replace(
        step=state.step + 10,
        opt_state=jax.tree.map(lambda x: x + 1.0 if jnp.issubdtype(x.dtype, jnp.floating) else x,
                               state.opt_state))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(dirty)
    restored = mgr.restore(state, restore_exclude=["detection"])

    def leaves_under(opt_state, scope):
        import jax.tree_util as jtu
        out = []
        for path, leaf in jtu.tree_flatten_with_path(opt_state)[0]:
            if any(getattr(k, "key", None) == scope for k in path):
                out.append((path, leaf))
        return out

    for (path, leaf), (_, init_leaf) in zip(
            leaves_under(restored.opt_state, "detection"),
            leaves_under(state.opt_state, "detection")):
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(init_leaf))
    # non-excluded scope moments come from the checkpoint (perturbed)
    desc = leaves_under(restored.opt_state, "description")
    assert any(not np.allclose(np.asarray(l), 0.0) for _, l in desc)
