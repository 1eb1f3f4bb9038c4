"""Multi-chip execution: device meshes, sharded rendering, sharded training.

The reference's only parallelism is row-interleaved pthreads over pixels
(/root/reference/raytracer.cpp:352-381).  The TPU-native analog is SPMD data
parallelism over the flattened ray axis: scene and BVH replicated per chip,
rays sharded over a 1-D mesh, image tiles gathered on the host, and (for the
differentiable path, which has no reference analog) scene-parameter gradients
all-reduced with `psum` over ICI.
"""

from raytracer_tpu.parallel.mesh import make_mesh, ray_sharding, replicated
from raytracer_tpu.parallel.render import render_camera_sharded, render_rays_sharded
from raytracer_tpu.parallel.train import (
    TrainState,
    apply_params,
    extract_params,
    make_train_step,
)

__all__ = [
    "make_mesh",
    "ray_sharding",
    "replicated",
    "render_camera_sharded",
    "render_rays_sharded",
    "TrainState",
    "extract_params",
    "apply_params",
    "make_train_step",
]
