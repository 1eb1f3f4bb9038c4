"""raytracer_tpu — a TPU-native differentiable Whitted-style ray tracer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
CPU ray tracer `lutfullaherkaya/raytracer-ceng477-graphics-hw-1` (C++11 +
pthreads).  Nothing here is a translation of the reference: the recursive
per-pixel integrator becomes a bounded-depth wavefront loop over a flattened,
shardable ray axis; the pointer-chasing BVH walk becomes SIMD-lockstep
traversal over a flat skip-threaded node array resident in HBM; pthread row
interleaving becomes `jax.sharding` over a device mesh.

Package layout
--------------
- ``models``  : scene data model (struct-of-arrays pytrees), BVH build,
                the Whitted wavefront integrator (the "flagship model").
- ``ops``     : camera ray generation, intersection kernels, traversal
                engines (dense brute / BVH / Pallas packet), shading, image
                quantization + SSAA.
- ``parallel``: device-mesh sharded rendering and distributed helpers.
- ``utils``   : XML scene ingest, PPM I/O, timing/metrics, config.
"""

from raytracer_tpu.models.scene import SceneData, SceneMeta, Camera, load_scene
from raytracer_tpu.models.bvh import BVH, build_bvh
from raytracer_tpu.models.clusters import ClusterSet, build_clusters
from raytracer_tpu.models.whitted import render_rays, render_camera

__all__ = [
    "SceneData",
    "SceneMeta",
    "Camera",
    "load_scene",
    "BVH",
    "build_bvh",
    "ClusterSet",
    "build_clusters",
    "render_rays",
    "render_camera",
]

__version__ = "0.1.0"
