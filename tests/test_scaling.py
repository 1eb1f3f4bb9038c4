"""Scaling harness + multi-host assembly + cluster engine under shard_map.

VERDICT round-1 item 5: the flagship (cluster/Pallas) engine must run
under shard_map on a multi-device mesh, image assembly must go through
the per-host tile gather (not a bare np.asarray), and a scaling curve
must be measurable.  On the virtual CPU mesh wall-clock efficiency is
meaningless (the "devices" share cores), so tests assert correctness and
harness integrity, not speedup — the real curve is recorded from TPU
runs in BASELINE.md.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.models.whitted import render_camera
from raytracer_tpu.ops.camera import eye_rays
from raytracer_tpu.parallel import make_mesh, render_camera_sharded
from raytracer_tpu.parallel.distributed import assemble_image, initialize
from raytracer_tpu.parallel.scaling import measure_scaling


@pytest.fixture(scope="module")
def scene(reference_inputs):
    return load_scene(f"{reference_inputs}/simple.xml")


def test_initialize_single_process_noop():
    """Without cluster env vars this must be a no-op returning index 0."""
    assert initialize() == 0
    assert jax.process_count() == 1


def test_assemble_image_single_process(scene):
    data, meta = scene
    x = jnp.arange(24.0).reshape(8, 3)
    np.testing.assert_array_equal(assemble_image(x), np.asarray(x))


@pytest.mark.slow
def test_cluster_engine_under_shard_map(scene):
    """The flagship Pallas engine, sharded over all 8 devices, matches the
    single-device cluster render bitwise."""
    data, meta = scene
    accel = build_clusters(data, meta, build_bvh(data, meta))
    cam = dataclasses.replace(meta.cameras[0], width=48, height=48)
    mesh = make_mesh()
    sharded = render_camera_sharded(
        data, meta, cam, mesh, bvh=accel, engine="cluster"
    )
    local = np.asarray(render_camera(data, meta, cam, bvh=accel,
                                     engine="cluster"))
    np.testing.assert_array_equal(sharded, local)


def test_scaling_curve_runs(scene):
    """measure_scaling produces a monotone-device curve of finite rates
    whose per-size renders partition the same wavefront."""
    data, meta = scene
    cam = dataclasses.replace(meta.cameras[0], width=32, height=32)
    origin, dirs = eye_rays(cam)
    points = measure_scaling(
        data, meta, jnp.asarray(origin), jnp.asarray(dirs),
        engine="brute", sizes=[1, 2, 4, 8], frames=2,
    )
    assert [p.n_devices for p in points] == [1, 2, 4, 8]
    for p in points:
        assert np.isfinite(p.rays_per_s) and p.rays_per_s > 0
        assert p.seconds_per_frame > 0
    assert points[0].efficiency == 1.0
