"""Inverse rendering demo: recover scene parameters from a target image.

The reference tracer is forward-only; differentiability is this
framework's headline new capability.  This script perturbs a scene's
material albedos and light intensity, then recovers them by Adam descent
on an L2 image loss — sharded across every available device.

    python examples/inverse_rendering.py [scene.xml] [engine]

`engine` defaults to `cluster` — the flagship Pallas engine's
differentiable path (hit ids from the kernel, smooth factors re-derived
by ops.shade.refine_hit).  On a CPU-only machine, force a virtual mesh
first:
    XLA_FLAGS=--xla_force_host_platform_device_count=8
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.models.whitted import render_camera
from raytracer_tpu.ops.camera import eye_rays
from raytracer_tpu.parallel import make_mesh, ray_sharding, replicated
from raytracer_tpu.parallel.train import TrainState, init_state, make_train_step

SCENE = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/inputs/simple.xml"
ENGINE = sys.argv[2] if len(sys.argv) > 2 else "cluster"


def main() -> None:
    data, meta = load_scene(SCENE)
    cam = dataclasses.replace(meta.cameras[0], width=64, height=64)
    origin, dirs = eye_rays(cam)
    accel = None
    if ENGINE == "cluster":
        accel = jax.tree.map(
            jnp.asarray, build_clusters(data, meta, build_bvh(data, meta))
        )

    # ground-truth target from the unperturbed scene
    target = jnp.asarray(
        np.asarray(render_camera(data, meta, cam, bvh=accel,
                                 engine=ENGINE)).reshape(-1, 3)
    )

    # corrupt the parameter the optimizer must recover (normalize the
    # loss scale: radiance is O(100), albedo is O(1))
    data_bad = dataclasses.replace(
        data, mat_diffuse=np.asarray(data.mat_diffuse) * 0.25 + 0.05
    )

    mesh = make_mesh()
    print(f"devices: {mesh.size}  scene: {SCENE}  rays/step: {dirs.shape[0]}")

    data_dev = jax.device_put(data_bad, replicated(mesh))
    dirs_dev = jax.device_put(jnp.asarray(dirs), ray_sharding(mesh))
    target_dev = jax.device_put(target, ray_sharding(mesh))
    accel_dev = (jax.device_put(accel, replicated(mesh))
                 if accel is not None else None)

    optimizer = optax.adam(3e-2)
    # optimize ONLY the corrupted field; free geometry/lights would wander
    state: TrainState = jax.device_put(
        init_state(data_bad, optimizer, fields=("mat_diffuse",)),
        replicated(mesh),
    )
    step = make_train_step(meta, mesh, optimizer, engine=ENGINE)

    for i in range(200):
        state, loss = step(state, data_dev, jnp.asarray(origin), dirs_dev,
                           target_dev, bvh=accel_dev)
        if i % 20 == 0 or i == 199:
            print(f"step {i:4d}  loss {float(loss):.6f}")

    true_diffuse = np.asarray(data.mat_diffuse)[: meta.n_materials]
    got_diffuse = np.asarray(state.params["mat_diffuse"])[: meta.n_materials]
    print("true diffuse:", np.round(true_diffuse, 3).tolist())
    print("recovered   :", np.round(got_diffuse, 3).tolist())


if __name__ == "__main__":
    main()
