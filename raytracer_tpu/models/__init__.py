from raytracer_tpu.models.scene import SceneData, SceneMeta, Camera, load_scene
from raytracer_tpu.models.bvh import BVH, build_bvh

__all__ = ["SceneData", "SceneMeta", "Camera", "load_scene", "BVH", "build_bvh"]
