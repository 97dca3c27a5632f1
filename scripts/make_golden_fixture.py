"""Regenerate the TF1-parity golden fixture (tests/fixtures/tf1_golden*).

The fixture freezes (a) a seeded TF1-style checkpoint export and (b) the
descriptors/attention the CURRENT model produces from it on a seeded cloud.
tests/test_checkpoint.py replays it every run, so neither the TF1 name
mapping nor the model's numerical semantics can drift silently.

Only rerun this when a semantics change is INTENDED:

    python scripts/make_golden_fixture.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from feat3dnet_tpu.config import ModelConfig
from feat3dnet_tpu.models import Feat3DNet
from feat3dnet_tpu.utils.tf1_loader import export_tf1_arrays, restore_tf1_variables

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "tests", "fixtures")

# Tiny config: full architecture shape (both towers, BN, heads), small dims.
CFG = ModelConfig(num_clusters=8, num_samples=8, feature_dim=16, base_scale=10.0,
                  detector_mlp=(8, 16), detector_mlp2=(8,), descriptor_mlp=(8, 8))


def main():
    model = Feat3DNet(CFG)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 3)),
                           training=False)

    # Randomize every leaf (seeded) so the fixture exercises non-default
    # values everywhere, incl. BN running stats (var kept positive).
    rng = np.random.RandomState(42)

    def rand_like(path, x):
        v = rng.randn(*np.shape(x)).astype(np.float32) * 0.5
        if path and getattr(path[-1], "key", None) == "var":
            v = np.abs(v) + 0.5
        return v

    import jax.tree_util as jtu
    variables = jtu.tree_map_with_path(rand_like, variables)

    arrays = export_tf1_arrays(variables)
    np.savez(os.path.join(FIXTURE_DIR, "tf1_golden.npz"), **arrays)

    # expected outputs: descriptors + attention at seeded keypoints
    cloud = jnp.asarray(rng.randn(1, 64, 3).astype(np.float32) * 3.0)
    kp = cloud[:, :8]
    fresh = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 3)), training=False)
    restored, _, _ = restore_tf1_variables(fresh, arrays)
    out = model.apply(restored, cloud, training=False, keypoints=kp)
    np.savez(os.path.join(FIXTURE_DIR, "tf1_golden_expected.npz"),
             cloud=np.asarray(cloud), keypoints=np.asarray(kp),
             features=np.asarray(out.features),
             attention=np.asarray(out.end_points["attention"]))
    print("wrote", os.path.join(FIXTURE_DIR, "tf1_golden.npz"),
          "and tf1_golden_expected.npz")
    print("features[0,0,:4] =", np.asarray(out.features)[0, 0, :4])


if __name__ == "__main__":
    main()
