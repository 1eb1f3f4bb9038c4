from raytracer_tpu.ops.camera import eye_rays
from raytracer_tpu.ops.intersect import (
    tri_intersect,
    sphere_intersect,
    aabb_intersect,
)
from raytracer_tpu.ops.image import quantize, downsample_parity, downsample_mean

__all__ = [
    "eye_rays",
    "tri_intersect",
    "sphere_intersect",
    "aabb_intersect",
    "quantize",
    "downsample_parity",
    "downsample_mean",
]
