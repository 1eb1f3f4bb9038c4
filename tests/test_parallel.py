"""Multi-chip SPMD paths on the forced 8-device CPU mesh.

The reference's only parallelism is pthread row interleaving trusted by
construction (SURVEY.md §5); here the sharded render must be bitwise
equal to the single-device render, and the sharded train step must reduce
gradients identically on every replica.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.models.whitted import render_camera
from raytracer_tpu.ops.camera import eye_rays
from raytracer_tpu.parallel import (
    make_mesh,
    ray_sharding,
    render_camera_sharded,
    replicated,
)
from raytracer_tpu.parallel.train import init_state, make_train_step


@pytest.fixture(scope="module")
def scene(reference_inputs):
    return load_scene(f"{reference_inputs}/simple_reflectance.xml")


def test_mesh_uses_all_devices():
    mesh = make_mesh()
    assert mesh.size == len(jax.devices()) == 8


def test_sharded_render_matches_local(scene):
    data, meta = scene
    cam = dataclasses.replace(meta.cameras[0], width=40, height=40)
    mesh = make_mesh()
    sharded = render_camera_sharded(data, meta, cam, mesh, engine="brute")
    local = np.asarray(render_camera(data, meta, cam, engine="brute"))
    np.testing.assert_array_equal(sharded, local)


def test_sharded_cluster_render_matches_local(scene):
    """The cluster engine under shard_map, with the pre-shard tile order:
    must match the local cluster render (which applies the same ordering
    internally) to within fusion-order float noise."""
    from raytracer_tpu.models.bvh import build_bvh
    from raytracer_tpu.models.clusters import build_clusters

    data, meta = scene
    # 64x64 divides into 8x16 blocks -> reshape path; 8 shards get whole
    # blocks (512 rays each)
    cam = dataclasses.replace(meta.cameras[0], width=64, height=64)
    accel = build_clusters(data, meta, build_bvh(data, meta))
    mesh = make_mesh()
    sharded = render_camera_sharded(data, meta, cam, mesh, bvh=accel,
                                    engine="cluster")
    local = np.asarray(render_camera(data, meta, cam, bvh=accel,
                                     engine="cluster"))
    # shard shapes change XLA's fusion of the shading glue around the
    # kernels: 1-2 ULP drift on the 0-255 radiance scale is expected
    np.testing.assert_allclose(sharded, local, atol=1e-3)


def test_sharded_cluster_render_nondividing_frame(scene):
    """Non-dividing frame -> permutation path + pad; same tolerance."""
    from raytracer_tpu.models.bvh import build_bvh
    from raytracer_tpu.models.clusters import build_clusters

    data, meta = scene
    cam = dataclasses.replace(meta.cameras[0], width=30, height=30)
    accel = build_clusters(data, meta, build_bvh(data, meta))
    mesh = make_mesh()
    sharded = render_camera_sharded(data, meta, cam, mesh, bvh=accel,
                                    engine="cluster")
    local = np.asarray(render_camera(data, meta, cam, bvh=accel,
                                     engine="cluster"))
    np.testing.assert_allclose(sharded, local, atol=1e-3)


def test_sharded_render_nondivisible_ray_count(scene):
    data, meta = scene
    # 30*30 = 900 rays, not a multiple of 8 -> exercises padding
    cam = dataclasses.replace(meta.cameras[0], width=30, height=30)
    mesh = make_mesh()
    sharded = render_camera_sharded(data, meta, cam, mesh, engine="brute")
    local = np.asarray(render_camera(data, meta, cam, engine="brute"))
    np.testing.assert_array_equal(sharded, local)


def test_train_step_decreases_loss_and_keeps_replicas_synced(scene):
    data, meta = scene
    cam = dataclasses.replace(meta.cameras[0], width=16, height=16)
    origin, dirs = eye_rays(cam)
    mesh = make_mesh()

    target = jnp.asarray(
        np.asarray(render_camera(data, meta, cam, engine="brute")).reshape(-1, 3)
    )
    data_bad = dataclasses.replace(data, mat_diffuse=np.asarray(data.mat_diffuse) * 0.2)

    data_dev = jax.device_put(data_bad, replicated(mesh))
    dirs_dev = jax.device_put(jnp.asarray(dirs), ray_sharding(mesh))
    target_dev = jax.device_put(target, ray_sharding(mesh))

    optimizer = optax.adam(5e-2)
    state = jax.device_put(init_state(data_bad, optimizer), replicated(mesh))
    step = make_train_step(meta, mesh, optimizer, engine="brute")

    losses = []
    for _ in range(10):
        state, loss = step(state, data_dev, jnp.asarray(origin), dirs_dev,
                           target_dev)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses

    # parameters must be truly replicated (identical on every device)
    diff = np.asarray(state.params["mat_diffuse"])
    assert np.isfinite(diff).all()
    for shard in state.params["mat_diffuse"].addressable_shards:
        np.testing.assert_array_equal(np.asarray(shard.data), diff)
