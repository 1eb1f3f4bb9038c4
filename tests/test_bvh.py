"""BVH structural invariants + engine equivalence (bvh == brute)."""

import dataclasses

import numpy as np
import pytest

from raytracer_tpu.models.bvh import build_bvh, validate_bvh
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.models.whitted import render_camera

SCENES = ["simple", "cornellbox", "marbles", "bunny", "mirror_spheres"]


@pytest.mark.parametrize("name", SCENES)
def test_invariants(reference_inputs, name):
    data, meta = load_scene(f"{reference_inputs}/{name}.xml")
    bvh = build_bvh(data, meta)
    validate_bvh(bvh, meta.n_tris + meta.n_spheres)


def test_leaf_triangles_before_spheres(reference_inputs):
    """Within a leaf, triangles must precede spheres so tie-breaking matches
    the reference's leaf test order (raytracer.cpp:199-216)."""
    data, meta = load_scene(f"{reference_inputs}/simple.xml")
    bvh = build_bvh(data, meta)
    t_pad = np.asarray(data.tri_v).shape[0]
    starts = np.asarray(bvh.leaf_start)
    counts = np.asarray(bvh.leaf_count)
    prim = np.asarray(bvh.prim_idx)
    for s, c in zip(starts, counts):
        if c > 1:
            kinds = (prim[s : s + c] >= t_pad).astype(int)
            assert (np.diff(kinds) >= 0).all()


@pytest.mark.parametrize("name", ["simple", "cornellbox", "marbles", "bunny",
                                  "dragon_lowres"])
def test_engine_equivalence(reference_inputs, name):
    """The lockstep skip-walk must reproduce the dense engine exactly."""
    data, meta = load_scene(f"{reference_inputs}/{name}.xml")
    bvh = build_bvh(data, meta)
    cam = dataclasses.replace(meta.cameras[0], width=48, height=48)
    a = np.asarray(render_camera(data, meta, cam, engine="brute"))
    b = np.asarray(render_camera(data, meta, cam, bvh=bvh, engine="bvh"))
    assert np.array_equal(a, b), f"max diff {np.abs(a - b).max()}"
