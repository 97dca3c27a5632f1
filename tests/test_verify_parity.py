"""verify_parity CLI: end-to-end self-consistency gate.

Exports a random paper-config model through the TF1 naming convention,
writes a 'reference output' using the framework's own extraction, then
runs the gate — it must restore every variable, match the fused path, and
report cosine ~1.0 against the self-produced reference (PASS, exit 0).
A corrupted checkpoint must FAIL (exit 1)."""
import numpy as np

import jax
import jax.numpy as jnp


def _write_tf1_npz(path, **cfg_kwargs):
    from feat3dnet_tpu.config import ModelConfig
    from feat3dnet_tpu.models import Feat3DNet
    from feat3dnet_tpu.utils.tf1_loader import export_tf1_arrays

    cfg = ModelConfig(num_clusters=-1, **cfg_kwargs)  # paper config
    model = Feat3DNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 3)),
                           training=False)
    # noise the params so descriptors are non-degenerate
    rng = np.random.RandomState(7)
    variables = jax.tree.map(
        lambda x: x + 0.3 * rng.randn(*x.shape).astype(np.float32), variables)
    arrays = export_tf1_arrays(variables)
    np.savez(path, **arrays)
    return cfg, model, variables


def test_verify_parity_cli_pass_and_fail(tmp_path):
    from feat3dnet_tpu.cli.verify_parity import main as gate
    from feat3dnet_tpu.config import InferenceConfig
    from feat3dnet_tpu.data.io import save_descriptors
    from feat3dnet_tpu.inference import InferencePipeline

    npz = str(tmp_path / "ckpt.npz")
    cfg, model, variables = _write_tf1_npz(npz)

    rng = np.random.RandomState(0)
    cloud = np.concatenate([
        (rng.rand(600, 3).astype(np.float32) - 0.5) * 30.0,
        np.zeros((600, 3), np.float32)], axis=1)
    cloud_path = str(tmp_path / "cloud.bin")
    cloud.tofile(cloud_path)

    # self-produced "reference" output: extract with the same weights
    pipe = InferencePipeline(model, variables, cfg,
                             InferenceConfig(max_keypoints=32))
    res = pipe.extract(cloud)
    ref_path = str(tmp_path / "ref_out.bin")
    save_descriptors(ref_path, res.keypoints, res.features)

    rc = gate(["--npz", npz, "--cloud", cloud_path,
               "--reference_output", ref_path])
    assert rc == 0

    # corrupt one descriptor-tower kernel -> descriptors change -> FAIL
    arrays = dict(np.load(npz))
    key = "description/layer1/conv0/conv2d/weights"
    arrays[key] = arrays[key] + 3.0
    bad_npz = str(tmp_path / "bad.npz")
    np.savez(bad_npz, **arrays)
    rc = gate(["--npz", bad_npz, "--cloud", cloud_path,
               "--reference_output", ref_path])
    assert rc == 1


def _run_gate_config(tmp_path, tag, cfg_kwargs, extra_args):
    """Export → gate round trip for one reference config variant."""
    from feat3dnet_tpu.cli.verify_parity import main as gate
    from feat3dnet_tpu.config import InferenceConfig
    from feat3dnet_tpu.data.io import save_descriptors
    from feat3dnet_tpu.inference import InferencePipeline

    npz = str(tmp_path / f"ckpt_{tag}.npz")
    cfg, model, variables = _write_tf1_npz(npz, **cfg_kwargs)

    rng = np.random.RandomState(1)
    cloud = np.concatenate([
        (rng.rand(500, 3).astype(np.float32) - 0.5) * 30.0,
        np.zeros((500, 3), np.float32)], axis=1)
    cloud_path = str(tmp_path / f"cloud_{tag}.bin")
    cloud.tofile(cloud_path)

    pipe = InferencePipeline(model, variables, cfg,
                             InferenceConfig(max_keypoints=32))
    res = pipe.extract(cloud)
    assert res.features.shape[1] == cfg.feature_dim
    ref_path = str(tmp_path / f"ref_{tag}.bin")
    save_descriptors(ref_path, res.keypoints, res.features)

    rc = gate(["--npz", npz, "--cloud", cloud_path,
               "--reference_output", ref_path] + extra_args)
    assert rc == 0


def test_verify_parity_feature_dim_128(tmp_path):
    """mlp2 widens to [256] for feature_dim>64 (reference feat3dnet.py:300);
    the TF1 name mapping must round-trip the widened descriptor tree."""
    _run_gate_config(tmp_path, "fd128", dict(feature_dim=128),
                     ["--feature_dim", "128"])


def test_verify_parity_no_bn(tmp_path):
    """USE_BN=False checkpoints (reference config.py:2) carry no bn/*
    variables; restore must be strict-complete without them and the gate
    must skip the folded-BN fused sub-check."""
    _run_gate_config(tmp_path, "nobn", dict(use_bn=False), ["--no_bn"])
