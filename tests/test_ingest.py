"""Scene ingest: counts must match the reference parser's data model
(verified scene-by-scene in SURVEY.md §2's asset table)."""

import numpy as np
import pytest

from raytracer_tpu.models.scene import load_scene

# (scene, cams, maxdepth, lights, materials, verts, tris_total, spheres)
EXPECTED = [
    ("simple", 1, 6, 1, 1, 8, 3, 1),          # 2 mesh faces + 1 lone triangle
    ("cornellbox", 3, 2, 1, 6, 10, 10, 2),
    ("marbles", 1, 6, 2, 6, 650, 0, 650),
    ("bunny", 1, 6, 1, 1, 2503, 4968, 0),
    ("horse_and_mug", 1, 2, 2, 6, 15870, 31582, 2),
]


@pytest.mark.parametrize("name,cams,md,nl,nm,nv,nt,ns", EXPECTED)
def test_counts(reference_inputs, name, cams, md, nl, nm, nv, nt, ns):
    data, meta = load_scene(f"{reference_inputs}/{name}.xml")
    assert len(meta.cameras) == cams
    assert meta.max_depth == md
    assert meta.n_lights == nl
    assert meta.n_materials == nm
    assert meta.n_verts >= nv  # padded
    assert meta.n_tris == nt
    assert meta.n_spheres == ns
    # masks consistent with counts
    assert int(np.asarray(data.tri_valid).sum()) == nt
    assert int(np.asarray(data.sphere_valid).sum()) == ns


def test_defaults_and_mirror_flag(reference_inputs):
    data, meta = load_scene(f"{reference_inputs}/simple_reflectance.xml")
    assert meta.shadow_eps == pytest.approx(1e-3)
    mir = np.asarray(data.mat_is_mirror)[: meta.n_materials]
    assert mir.sum() == 1  # one type="mirror" material


def test_dragon_epsilon(reference_inputs):
    _, meta = load_scene(f"{reference_inputs}/dragon_lowres.xml")
    assert meta.shadow_eps == pytest.approx(1e-4)  # only non-default scene


def test_triangle_soup_order(reference_inputs):
    """Lone triangles come before mesh faces (raytracer.cpp:336-341)."""
    data, meta = load_scene(f"{reference_inputs}/simple.xml")
    tri_v = np.asarray(data.tri_v)[: meta.n_tris]
    # simple.xml: lone triangle uses vertices 5 6 7 (1-based) → 4 5 6
    assert (tri_v[0] == [4, 5, 6]).all()
    assert (tri_v[1] == [2, 0, 1]).all()  # first mesh face "3 1 2"
