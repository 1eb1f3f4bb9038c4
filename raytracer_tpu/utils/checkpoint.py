"""Checkpoint / cache persistence.

The reference has no persistence at all (SURVEY.md §5 — its only artifact
is the final PPM).  The framework adds two optional layers:

- **accel cache**: the host-built BVH + cluster set saved as one npz so
  repeated renders of a scene skip the build entirely (the build is ms-
  scale with the native library, but the cache also pins determinism).
- **train-state checkpoints** for inverse-rendering runs: parameters and
  optimizer state flattened to npz; restore validates against the target
  pytree structure from a fresh ``optimizer.init``.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import numpy as np

from raytracer_tpu.models.bvh import BVH
from raytracer_tpu.models.clusters import ClusterSet


def _flatten_to_npz(path: str, tree, extra: dict | None = None) -> None:
    leaves, _ = jax.tree_util.tree_flatten(tree)
    payload = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    if extra:
        payload.update(extra)
    np.savez_compressed(path, **payload)


def _unflatten_from_npz(path: str, like) -> Any:
    leaves, treedef = jax.tree_util.tree_flatten(like)
    with np.load(path) as z:
        loaded = [z[f"leaf_{i}"] for i in range(len(leaves))]
    for got, want in zip(loaded, leaves):
        if got.shape != np.shape(want):
            raise ValueError(
                f"{path}: leaf shape {got.shape} != expected {np.shape(want)}"
            )
    return jax.tree_util.tree_unflatten(treedef, loaded)


def save_accel(path: str, bvh: BVH, clusters: ClusterSet) -> None:
    """Persist the acceleration structures for a scene."""
    _flatten_to_npz(
        path, (bvh, clusters),
        extra={
            "n_tri": np.int64(clusters.n_tri),
            "n_sph": np.int64(clusters.n_sph),
        },
    )


def load_accel(path: str, bvh_like: BVH, clusters_like: ClusterSet
               ) -> Tuple[BVH, ClusterSet]:
    """Reload accel structures; `*_like` provide the pytree structure
    (e.g. freshly built on a changed scene — shapes are validated)."""
    bvh, clusters = _unflatten_from_npz(path, (bvh_like, clusters_like))
    return bvh, clusters


def save_train_state(path: str, state) -> None:
    _flatten_to_npz(path, state)


def load_train_state(path: str, state_like):
    """Restore a parallel.train.TrainState saved with save_train_state.
    `state_like` (e.g. ``init_state(data, optimizer)``) supplies the
    structure."""
    return _unflatten_from_npz(path, state_like)
