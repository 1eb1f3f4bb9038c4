"""Differentiable inverse rendering: the framework's "training step".

The reference has no learning loop — differentiability is a new capability
of the TPU framework (SURVEY.md §7 step 7).  The flagship optimization task
is classic inverse rendering: given a target image, recover scene parameters
(vertex positions, sphere radii, material reflectances, light intensities /
positions) by gradient descent on an L2 image loss.

Parallelism layout (the real sharding story used by `dryrun_multichip`):
  - rays + target pixels: sharded over the 1-D ``rays`` mesh axis (dp/sp —
    the ray axis IS this workload's long axis, SURVEY.md §5),
  - scene + parameters: replicated,
  - per-shard loss/grads reduced with `jax.lax.pmean` inside shard_map —
    XLA compiles these to psum collectives over ICI, overlapped with the
    backward pass by the latency-hiding scheduler.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from raytracer_tpu.models.bvh import BVH
from raytracer_tpu.models.scene import SceneData, SceneMeta
from raytracer_tpu.models.whitted import render_rays
from raytracer_tpu.parallel.mesh import RAY_AXIS

# SceneData fields exposed as trainable parameters. Geometry gradients flow
# through `vertices` (triangle corners AND sphere centers, which are vertex
# references, parser.h:200-204).
PARAM_FIELDS = (
    "vertices",
    "sphere_rad",
    "mat_ambient",
    "mat_diffuse",
    "mat_specular",
    "mat_mirror",
    "light_pos",
    "light_int",
)


class TrainState(NamedTuple):
    params: dict
    opt_state: Any


def extract_params(data: SceneData, fields=PARAM_FIELDS) -> dict:
    return {f: getattr(data, f) for f in fields}


def apply_params(data: SceneData, params: dict) -> SceneData:
    return dataclasses.replace(data, **params)


def image_loss(params, data, meta, origin, dirs, target, bvh, engine,
               ldr: bool = False):
    """Mean squared error between rendered radiance and target (R, 3).

    ``ldr``: the target came from an 8-bit image — apply the quantizer's
    saturation (clip to [0, 255]) to the rendered radiance before
    comparing, else every >255 highlight contributes an irreducible
    squared error that dwarfs the recoverable signal (measured: simple.xml
    has 8.4% of channels above 255, up to 525 — a loss floor of ~4e3
    without the clip).  Clipped pixels get zero gradient, mirroring the
    real camera's saturation."""
    color = render_rays(
        apply_params(data, params), meta, origin, dirs, bvh=bvh, engine=engine,
        differentiable=True,
    )
    if ldr:
        color = jnp.clip(color, 0.0, 255.0)
    return jnp.mean((color - target) ** 2)


def make_train_step(
    meta: SceneMeta,
    mesh: Mesh,
    optimizer: optax.GradientTransformation,
    engine: str = "brute",
    has_bvh: bool = False,
    ldr: bool = False,
):
    """Jitted SPMD train step: (state, data, origin, dirs, target) -> (state, loss).

    dirs/target are sharded on the leading ray axis; everything else is
    replicated. Gradients are pmean'ed across the mesh before the optimizer
    update, so parameter replicas stay bitwise identical.
    """
    del has_bvh  # a None bvh is an empty pytree; P() prefixes both cases
    bvh_spec = P()

    def local_step(params, opt_state, data, origin, dirs, target, bvh):
        loss, grads = jax.value_and_grad(image_loss)(
            params, data, meta, origin, dirs, target, bvh, engine, ldr
        )
        grads = jax.lax.pmean(grads, RAY_AXIS)
        loss = jax.lax.pmean(loss, RAY_AXIS)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    smapped = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(RAY_AXIS), P(RAY_AXIS), bvh_spec),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(state: TrainState, data, origin, dirs, target, bvh=None):
        params, opt_state, loss = smapped(
            state.params, state.opt_state, data, origin, dirs, target, bvh
        )
        return TrainState(params, opt_state), loss

    return step


def init_state(data: SceneData, optimizer: optax.GradientTransformation,
               fields=PARAM_FIELDS) -> TrainState:
    """Fresh state optimizing `fields` (default: every differentiable
    scene field; pass a subset to pin the rest)."""
    params = extract_params(data, fields)
    return TrainState(params, optimizer.init(params))
