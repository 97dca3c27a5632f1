"""API-parity wrapper tests (sample_points / sample_and_group[_all],
FullyConnected, dropout) + train CLI auto-resume."""
import numpy as np

import jax
import jax.numpy as jnp

from feat3dnet_tpu.models.layers import FullyConnected, dropout
from feat3dnet_tpu.ops.pointnet import sample_and_group, sample_and_group_all, sample_points


def test_sample_points_identity_and_fps(rng):
    xyz = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(sample_points(xyz, -1)), np.asarray(xyz))
    out = sample_points(xyz, 8)
    assert out.shape == (2, 8, 3)
    # first FPS center is point 0
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(xyz[:, 0]))


def test_sample_and_group(rng):
    xyz = jnp.asarray(rng.rand(1, 64, 3).astype(np.float32))
    centers, grouped, idx, cnt = sample_and_group(4, 0.5, 8, xyz)
    assert centers.shape == (1, 4, 3) and grouped.shape == (1, 4, 8, 3)
    # normalized coords within unit ball (radius normalization)
    real = np.arange(8)[None, None, :] < np.asarray(cnt)[:, :, None]   # (1, 4, 8)
    r = np.linalg.norm(np.asarray(grouped), axis=-1)                   # (1, 4, 8)
    assert np.all(r[real] <= 1.0 + 1e-5)
    # unnormalized variant scales back
    _, g2, _, _ = sample_and_group(4, 0.5, 8, xyz, normalize_radius=False)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(grouped) * 0.5, rtol=1e-5)


def test_sample_and_group_all(rng):
    xyz = jnp.asarray(rng.rand(2, 16, 3).astype(np.float32))
    centers, grouped, idx = sample_and_group_all(xyz)
    assert centers.shape == (2, 1, 3) and np.all(np.asarray(centers) == 0)
    np.testing.assert_array_equal(np.asarray(grouped)[:, 0], np.asarray(xyz))
    np.testing.assert_array_equal(np.asarray(idx)[0, 0], np.arange(16))


def test_fully_connected_and_dropout(rng):
    fc = FullyConnected(7, use_bn=True)
    x = jnp.asarray(rng.randn(4, 5).astype(np.float32))
    v = fc.init(jax.random.PRNGKey(0), x)
    y = fc.apply(v, x)
    assert y.shape == (4, 7)
    assert np.all(np.asarray(y) >= 0)  # relu

    z = dropout(jnp.ones((100, 100)), jax.random.PRNGKey(1), keep_prob=0.5)
    kept = float(jnp.mean(z > 0))
    assert 0.4 < kept < 0.6
    np.testing.assert_allclose(np.asarray(z)[np.asarray(z) > 0], 2.0)
    # eval mode: identity
    np.testing.assert_array_equal(
        np.asarray(dropout(jnp.ones((3, 3)), jax.random.PRNGKey(2), training=False)),
        np.ones((3, 3)))


def test_train_cli_auto_resume(tmp_path, rng):
    train_dir = tmp_path / "train"
    train_dir.mkdir()
    lines = []
    for i in range(4):
        cloud = (rng.rand(300, 6).astype(np.float32) - 0.5) * 12.0
        cloud.tofile(str(train_dir / f"{i}.bin"))
        lines.append(f"{i}.bin | {(i + 1) % 4} | {(i + 2) % 4}")
    (train_dir / "train.txt").write_text("\n".join(lines))

    from feat3dnet_tpu.cli.train import main as train_main
    common = ["--data_dir", str(tmp_path), "--num_points", "128",
              "--num_clusters", "8", "--num_samples", "8",
              "--feature_dim", "16", "--batch_size", "2",
              "--checkpoint_every_n_steps", "2", "--num_epochs", "1",
              "--log_dir", str(tmp_path / "run"), "--auto_resume"]
    s1 = train_main(common)
    assert int(s1.step) == 2
    s2 = train_main(common)          # resumes from saved step 2
    assert int(s2.step) == 4
