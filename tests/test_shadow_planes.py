"""Unit tests for the fixed-light shadow plane predicate.

build_shadow_planes turns each (triangle, light) pair into four planes so
occlusion of a segment origin->light is four sign tests at the origin
(ops/cluster_trace.py docstring; reference semantics
raytracer.cpp:129-175,227-253).  Hand cases pin the window, edge
inclusivity, orientation independence, degeneracy, and bfc; the
engine-level agreement with the generic kernel is covered by the 13-scene
sweep (tests/test_scenes_sweep.py) and cluster_shadow-vs-brute below.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import CLUSTER, ClusterSet, build_clusters
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.ops import traverse
from raytracer_tpu.ops.cluster_trace import build_shadow_planes, cluster_shadow


def _cset_with_tri(a, b, c):
    pt = CLUSTER
    tv = np.zeros((9, pt), np.float32)
    tv[:, 0] = np.asarray([*a, *b, *c], np.float32)
    z = np.zeros
    return ClusterSet(
        tri_dat=z((12, pt), np.float32), tri_slot=z(pt, np.int32),
        tri_cmin=z((1, 3), np.float32), tri_cmax=z((1, 3), np.float32),
        sph_dat=z((4, CLUSTER), np.float32), sph_slot=z(CLUSTER, np.int32),
        sph_cmin=z((1, 3), np.float32), sph_cmax=z((1, 3), np.float32),
        slot_pack=z((pt + CLUSTER, 8), np.float32), tri_verts=tv,
        n_tri=1, n_sph=0,
    )


def _occludes(planes, p):
    """Evaluate the 4-plane test for slot 0 at point p (numpy)."""
    q = np.asarray(planes)[:, 0]
    vals = [q[4 * i + 0] * p[0] + q[4 * i + 1] * p[1] + q[4 * i + 2] * p[2]
            + q[4 * i + 3] for i in range(4)]
    return bool(all(v >= 0.0 for v in vals))


TRI = ([0.0, 0.0, 1.0], [1.0, 0.0, 1.0], [0.0, 1.0, 1.0])  # plane z=1
LIGHT = [0.0, 0.0, 0.0]  # below the plane


def test_window_and_inside():
    planes = build_shadow_planes(_cset_with_tri(*TRI), LIGHT)
    assert _occludes(planes, [0.25, 0.25, 2.0])      # crosses inside
    assert not _occludes(planes, [2.0, 2.0, 2.0])    # crosses outside
    assert not _occludes(planes, [0.1, 0.1, -1.0])   # behind the light
    assert not _occludes(planes, [0.05, 0.05, 0.5])  # between light & plane
    assert _occludes(planes, [0.0, 0.0, 5.0])        # through vertex A: edges
    #                                                  are inclusive (alpha=
    #                                                  beta=gamma boundary)
    assert _occludes(planes, [0.25, 0.0, 3.0])       # on edge AB: inclusive


def test_orientation_independent():
    p1 = build_shadow_planes(_cset_with_tri(*TRI), LIGHT)
    p2 = build_shadow_planes(
        _cset_with_tri(TRI[0], TRI[2], TRI[1]), LIGHT  # reversed winding
    )
    for p in ([0.25, 0.25, 2.0], [2.0, 2.0, 2.0], [0.1, 0.1, -1.0],
              [0.3, 0.3, 7.0]):
        assert _occludes(p1, p) == _occludes(p2, p)


def test_degenerate_light_in_plane_never_occludes():
    planes = build_shadow_planes(_cset_with_tri(*TRI), [0.2, 0.2, 1.0])
    for p in ([0.25, 0.25, 2.0], [0.2, 0.2, 0.0], [0.1, 0.1, 1.0]):
        assert not _occludes(planes, p)


def test_zero_area_and_padding_never_occlude():
    cset = _cset_with_tri([0, 0, 1], [1, 0, 1], [2, 0, 1])  # collinear
    planes = np.asarray(build_shadow_planes(cset, LIGHT))
    assert not _occludes(planes, [0.5, 0.0, 2.0])
    # padding slots (all-zero vertices) must hard-fail for EVERY origin
    assert planes[3, 1:].max() == -1.0


def test_bfc_culls_backfacing_occluder():
    # n = (B-A)x(C-A) = +z for TRI; light below plane -> k0 = n.(L-A) < 0
    # -> the segment hits the FRONT face (n.d < 0): kept under bfc
    front = build_shadow_planes(_cset_with_tri(*TRI), LIGHT, bfc=True)
    assert _occludes(front, [0.25, 0.25, 2.0])
    # reversed winding flips n -> same geometry now backfacing -> culled
    back = build_shadow_planes(
        _cset_with_tri(TRI[0], TRI[2], TRI[1]), LIGHT, bfc=True
    )
    assert not _occludes(back, [0.25, 0.25, 2.0])


@pytest.mark.parametrize("scene", ["simple_shading", "cornellbox", "bunny"])
def test_cluster_shadow_matches_brute_segments(reference_inputs, scene):
    """End-to-end: the plane kernel's occlusion equals the brute engine's
    segment any-hit on a grid of real surface points (boundary pixels may
    flip by float rounding; demand >=99.5% agreement)."""
    data, meta = load_scene(f"{reference_inputs}/{scene}.xml")
    bvh = build_bvh(data, meta)
    cset = build_clusters(data, meta, bvh)
    cam = dataclasses.replace(meta.cameras[0], width=32, height=32)
    from raytracer_tpu.ops.camera import eye_rays
    from raytracer_tpu.ops.cluster_trace import cluster_closest_hit

    origin, dirs = eye_rays(cam)
    hit, t, normal, mat, point, offset, prim = cluster_closest_hit(
        cset, origin, jnp.asarray(dirs), meta.shadow_eps
    )
    lp = data.light_pos[0]
    sdir = lp[None, :] - offset
    planes = build_shadow_planes(cset, lp)
    occ_new = cluster_shadow(cset, planes, offset, sdir, lp, active=hit)
    occ_ref = traverse.any_hit(
        data, offset, sdir, jnp.ones(offset.shape[0]), None, "brute",
        active=hit,
    )
    m = np.asarray(hit)
    agree = (np.asarray(occ_new)[m] == np.asarray(occ_ref)[m]).mean()
    assert agree >= 0.995, f"{scene}: only {agree:.4f} agreement"


def test_three_light_multi_kernel_matches_brute():
    """No bundled scene has >2 lights; the merged multi-light shadow
    kernel (cluster_shadow_multi) is generic over the static light
    count — pin a 3-light render against the brute engine."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from raytracer_tpu.models.bvh import build_bvh
    from raytracer_tpu.models.clusters import build_clusters
    from raytracer_tpu.models.scene import load_scene
    from raytracer_tpu.models.whitted import render_camera
    from raytracer_tpu.ops.image import quantize

    data, meta = load_scene("tests/data/entry_scene.xml")
    lp = np.asarray(data.light_pos)[: meta.n_lights]
    li = np.asarray(data.light_int)[: meta.n_lights]
    lp3 = np.concatenate([lp, lp + [[0.9, 0.4, 0.2]], lp + [[-0.7, 0.8, 0.1]]])
    li3 = np.concatenate([li, li * 0.6, li * 0.3])
    data = dataclasses.replace(
        data, light_pos=jnp.asarray(lp3, jnp.float32),
        light_int=jnp.asarray(li3, jnp.float32),
        light_valid=jnp.ones((3,), bool),
    )
    meta = dataclasses.replace(meta, n_lights=3)
    cam = meta.cameras[0]
    accel = build_clusters(data, meta, build_bvh(data, meta))
    img_c = quantize(render_camera(data, meta, cam, bvh=accel,
                                   engine="cluster"))
    img_b = quantize(render_camera(data, meta, cam, engine="brute"))
    d = np.abs(np.asarray(img_c).astype(int) - np.asarray(img_b).astype(int))
    assert d.max() <= 1, f"3-light cluster vs brute max|delta|={d.max()}"
