"""Accel-cache and train-state persistence round-trips."""

import numpy as np
import optax

from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.parallel.train import init_state
from raytracer_tpu.utils.checkpoint import (
    load_accel,
    load_train_state,
    save_accel,
    save_train_state,
)


def test_accel_cache_roundtrip(reference_inputs, tmp_path):
    """Self-describing: load needs NO freshly built templates, and bare
    paths (no .npz suffix) round-trip too."""
    data, meta = load_scene(f"{reference_inputs}/simple.xml")
    bvh = build_bvh(data, meta)
    clusters = build_clusters(data, meta, bvh)
    for name in ("accel.npz", "accel.ckpt"):
        path = str(tmp_path / name)
        save_accel(path, bvh, clusters)
        bvh2, clusters2 = load_accel(path)
        import jax

        for a, b in zip(jax.tree.leaves(bvh), jax.tree.leaves(bvh2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(clusters), jax.tree.leaves(clusters2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert clusters2.n_tri == clusters.n_tri
        assert clusters2.n_sph == clusters.n_sph


def test_train_state_roundtrip(reference_inputs, tmp_path):
    import jax

    data, meta = load_scene(f"{reference_inputs}/simple.xml")
    opt = optax.adam(1e-3)
    state = init_state(data, opt)
    path = str(tmp_path / "state.npz")
    save_train_state(path, state)
    fresh = init_state(data, opt)
    restored = load_train_state(path, fresh)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
