"""SPMD rendering: shard the ray axis over the mesh, replicate the scene.

This is the TPU-native replacement for the reference's row-interleaved
pthread render loop (/root/reference/raytracer.cpp:352-381): instead of T
threads owning interleaved rows of one shared image, N chips own contiguous
shards of the flattened ray axis; each shard is traced independently (rays
never communicate) and the image is assembled by the host gather implicit in
``np.asarray`` on the sharded output.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from raytracer_tpu.models.bvh import BVH
from raytracer_tpu.models.scene import Camera, SceneData, SceneMeta
from raytracer_tpu.models.whitted import render_rays
from raytracer_tpu.ops.camera import eye_rays
from raytracer_tpu.parallel.mesh import RAY_AXIS, ray_sharding, replicated


def _sharded_render_fn(mesh: Mesh, meta: SceneMeta, engine: str, has_bvh: bool):
    """Build the jitted shard_map'ed render over `mesh`. Cached per config."""
    del has_bvh  # a None bvh is an empty pytree; P() prefixes both cases
    bvh_spec = P()

    def local(data, bvh, origin, dirs):
        return render_rays(data, meta, origin, dirs, bvh=bvh, engine=engine)

    smapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), bvh_spec, P(), P(RAY_AXIS)),
        out_specs=P(RAY_AXIS),
        check_vma=False,
    )
    return jax.jit(smapped)


_FN_CACHE: dict = {}


def render_rays_sharded(
    data: SceneData,
    meta: SceneMeta,
    origin,
    dirs,
    mesh: Mesh,
    bvh: Optional[BVH] = None,
    engine: str = "brute",
):
    """Trace a wavefront with the ray axis sharded over `mesh`.

    `dirs.shape[0]` must be a multiple of the mesh size (callers pad; see
    `render_camera_sharded`).  Returns (R, 3) radiance sharded over the mesh.
    """
    key = (mesh, meta, engine, bvh is not None)  # Mesh is hashable
    fn = _FN_CACHE.get(key)
    if fn is None:
        fn = _FN_CACHE[key] = _sharded_render_fn(mesh, meta, engine, bvh is not None)
    return fn(data, bvh, jnp.asarray(origin, jnp.float32), dirs)


def render_camera_sharded(
    data: SceneData,
    meta: SceneMeta,
    cam: Camera,
    mesh: Mesh,
    bvh: Optional[BVH] = None,
    engine: str = "brute",
) -> np.ndarray:
    """Render one camera over the mesh; returns host (H, W, 3) float32."""
    origin, dirs = eye_rays(cam)
    r = dirs.shape[0]
    blocks = perm = inv = None
    if engine == "cluster":
        # the cluster engine's shortlist quality depends on TILE-ray runs
        # being coherent pixel blocks (ops.tiling); order BEFORE sharding
        # so every shard receives whole blocks, undo after assembly
        from raytracer_tpu.models.whitted import _tile_block_shape
        from raytracer_tpu.ops.tiling import (
            apply_tile_order, block_permutation, divides,
        )

        bh, bw = _tile_block_shape()
        if divides(cam.height, cam.width, bh, bw):
            blocks = (bh, bw)
        else:
            perm, inv = block_permutation(cam.height, cam.width, bh, bw)
        dirs = apply_tile_order(
            jnp.asarray(dirs), cam.height, cam.width, blocks,
            None if perm is None else jnp.asarray(perm))
    n = mesh.size
    pad = (-r) % n
    if pad:
        dirs = jnp.concatenate([dirs, jnp.broadcast_to(dirs[-1:], (pad, 3))], 0)
    dirs = jax.device_put(dirs, ray_sharding(mesh))
    data = jax.device_put(data, replicated(mesh))
    if bvh is not None:
        bvh = jax.device_put(bvh, replicated(mesh))
    color = render_rays_sharded(data, meta, origin, dirs, mesh, bvh=bvh, engine=engine)
    from raytracer_tpu.parallel.distributed import assemble_image

    # per-host tile gather (works multi-process, unlike a bare np.asarray)
    color = assemble_image(color)[:r]
    if engine == "cluster":
        from raytracer_tpu.ops.tiling import undo_tile_order

        color = undo_tile_order(color, cam.height, cam.width, blocks, inv)
    return color.reshape(cam.height, cam.width, 3)
