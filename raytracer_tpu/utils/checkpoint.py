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

import dataclasses
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
    # an open file handle keeps numpy from appending '.npz' to bare paths,
    # so save/load agree on the exact filename
    with open(path, "wb") as f:
        np.savez_compressed(f, **payload)


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


_ACCEL_VERSION = 5  # v5: BVH grew optional oct_* ordered-descent threads


def save_accel(path: str, bvh: BVH, clusters: ClusterSet) -> None:
    """Persist the acceleration structures for a scene.

    The file is SELF-DESCRIBING: every dataclass field is stored under its
    own key (npz records shapes/dtypes; None-valued optional fields are
    simply omitted), so ``load_accel`` reconstructs the pytrees without
    redoing the build it is meant to skip.
    """
    payload: dict = {"accel_version": np.int64(_ACCEL_VERSION)}
    for f in dataclasses.fields(BVH):
        v = getattr(bvh, f.name)
        if v is not None:
            payload[f"bvh.{f.name}"] = np.asarray(v)
    for f in dataclasses.fields(ClusterSet):
        v = getattr(clusters, f.name)
        payload[f"cluster.{f.name}"] = (
            np.int64(v) if isinstance(v, int) else np.asarray(v)
        )
    with open(path, "wb") as f:
        np.savez_compressed(f, **payload)


def load_accel(path: str) -> Tuple[BVH, ClusterSet]:
    """Reload accel structures from a ``save_accel`` file — no freshly
    built templates needed (shapes/dtypes come from the npz itself)."""
    with np.load(path) as z:
        if int(z.get("accel_version", 0)) != _ACCEL_VERSION:
            raise ValueError(
                f"{path}: not a version-{_ACCEL_VERSION} accel cache"
            )
        bvh = BVH(**{
            f.name: z[f"bvh.{f.name}"] if f"bvh.{f.name}" in z else None
            for f in dataclasses.fields(BVH)
        })
        ckw = {}
        for f in dataclasses.fields(ClusterSet):
            v = z[f"cluster.{f.name}"]
            ckw[f.name] = int(v) if v.ndim == 0 else v
        clusters = ClusterSet(**ckw)
    return bvh, clusters


def save_train_state(path: str, state) -> None:
    _flatten_to_npz(path, state)


def load_train_state(path: str, state_like):
    """Restore a parallel.train.TrainState saved with save_train_state.
    `state_like` (e.g. ``init_state(data, optimizer)``) supplies the
    structure."""
    return _unflatten_from_npz(path, state_like)
