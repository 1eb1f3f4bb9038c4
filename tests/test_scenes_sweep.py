"""Engine-equivalence sweep over every bundled scene (reduced resolution).

The de-facto test matrix is the reference's inputs/ directory (SURVEY.md
§2); rendering each at 48x48 through BOTH engines exercises every scene
feature: multi-camera files, mirrors, sphere-heavy BVHs, multi-mesh
scenes, and the one non-default shadow epsilon (dragon).
"""

import dataclasses
import os

import numpy as np
import pytest

from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.models.whitted import render_camera
from raytracer_tpu.ops.image import quantize

SCENES = [
    "simple", "simple_shading", "simple_reflectance", "cornellbox",
    "mirror_spheres", "marbles", "monkey", "bunny", "low_poly",
    "berserker", "car", "dragon_lowres", "horse_and_mug",
]


@pytest.mark.parametrize("scene", SCENES)
def test_engines_agree(reference_inputs, scene):
    path = f"{reference_inputs}/{scene}.xml"
    if not os.path.exists(path):
        pytest.skip(f"{scene}.xml not bundled")
    data, meta = load_scene(path)
    bvh = build_bvh(data, meta)
    cset = build_clusters(data, meta, bvh)
    for cam in meta.cameras:
        small = dataclasses.replace(cam, width=48, height=48)
        brute = np.asarray(
            quantize(render_camera(data, meta, small, engine="brute"))
        ).astype(int)
        clus = np.asarray(
            quantize(render_camera(data, meta, small, bvh=cset, engine="cluster"))
        ).astype(int)
        d = np.abs(brute - clus).max(-1)
        frac = (d > 1).mean()
        # <=1 LSB everywhere except shared-edge t-tie pixels (<1% of frame)
        assert frac < 0.01, (
            f"{scene}/{cam.image_name}: {frac:.2%} pixels differ by >1 LSB"
        )
