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


def test_octant_threads_invariants(reference_inputs):
    """Each of the 8 ordered-descent blocks is a permutation of the base
    preorder carrying the same boxes/leaves; block 0 (all-positive
    directions = left-first everywhere) IS the base preorder; skip
    pointers are global and stay inside their block."""
    data, meta = load_scene(f"{reference_inputs}/bunny.xml")
    bvh = build_bvh(data, meta, ordered=True)
    n = np.asarray(bvh.skip).shape[0]
    obm = np.asarray(bvh.oct_box_min).reshape(8, n, 3)
    osk = np.asarray(bvh.oct_skip).reshape(8, n)
    olc = np.asarray(bvh.oct_leaf_count).reshape(8, n)
    base_min = np.asarray(bvh.box_min)
    assert np.array_equal(obm[0], base_min)
    assert np.array_equal(osk[0], np.asarray(bvh.skip))
    for o in range(8):
        # same multiset of boxes/leaf counts (permutation check via sort)
        assert np.array_equal(np.sort(obm[o], axis=0),
                              np.sort(base_min, axis=0))
        assert olc[o].sum() == np.asarray(bvh.leaf_count).sum()
        local = osk[o] - o * n
        assert (local >= np.arange(n) + 1).all()
        assert (local <= n).all()


def test_ordered_walk_matches_plain(reference_inputs):
    """Ordered-descent walk == plain preorder walk on the bvh engine
    (same minima; exact-t tie flips are possible in principle but these
    scenes measure bitwise-equal — also pinned at full res on
    bunny/dragon by experiments/exp_ordered_ab.py)."""
    data, meta = load_scene(f"{reference_inputs}/dragon_lowres.xml")
    plain = build_bvh(data, meta, ordered=False)
    ordered = build_bvh(data, meta, ordered=True)
    assert ordered.oct_skip is not None and plain.oct_skip is None
    cam = dataclasses.replace(meta.cameras[0], width=64, height=64)
    a = np.asarray(render_camera(data, meta, cam, bvh=plain, engine="bvh"))
    b = np.asarray(render_camera(data, meta, cam, bvh=ordered, engine="bvh"))
    assert np.array_equal(a, b), f"max diff {np.abs(a - b).max()}"
