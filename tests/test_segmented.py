"""Cluster-axis segmentation for scenes beyond the VMEM budget.

Scenes with more than SEG_SLOTS triangle slots run the visit kernels
once per segment with min-merged results (ops.cluster_trace,
_segmented_closest/_segmented_any) — scene size is then bounded by HBM,
not the ~16 MB of VMEM the whole-array tri_dat residency implies.
Pinned here by forcing a small SEG_SLOTS on a 20k-tri synthetic terrain
and comparing the segmented cluster render against (a) the unsegmented
cluster render and (b) the BVH engine, both bitwise at quantized output.
"""

import dataclasses

import numpy as np
import pytest

from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.models.whitted import render_camera
from raytracer_tpu.ops import cluster_trace as ct
from raytracer_tpu.ops.image import quantize
from raytracer_tpu.utils.synth import terrain_scene


@pytest.mark.parametrize("mirror_stripes", [False, True])
def test_segmented_matches_unsegmented(mirror_stripes):
    data, meta = terrain_scene(cells=100, res=64, max_depth=2,
                               mirror_stripes=mirror_stripes)
    bvh = build_bvh(data, meta)
    cset = build_clusters(data, meta, bvh)
    assert cset.tri_dat.shape[1] > 2 * 8192  # >= 3 segments when forced
    cam = meta.cameras[0]
    saved = ct.SEG_SLOTS
    try:
        ct.SEG_SLOTS = 8192
        from raytracer_tpu.models import whitted
        whitted._render_camera_jit.clear_cache()
        seg = np.asarray(quantize(
            render_camera(data, meta, cam, bvh=cset, engine="cluster")))
    finally:
        ct.SEG_SLOTS = saved
    from raytracer_tpu.models import whitted
    whitted._render_camera_jit.clear_cache()
    unseg = np.asarray(quantize(
        render_camera(data, meta, cam, bvh=cset, engine="cluster")))
    np.testing.assert_array_equal(seg, unseg)
    bv = np.asarray(quantize(
        render_camera(data, meta, cam, bvh=bvh, engine="bvh")))
    d = np.abs(unseg.astype(int) - bv.astype(int)).max(-1)
    assert (d > 1).sum() <= 4  # same tolerance class as test_cluster


def test_sphere_segmented_matches_unsegmented():
    """Round 5: SPHERE-axis segmentation (the 4-row sphere table
    previously rode whole into every kernel).  Forced-small SEG_SLOTS on
    a 2,000-sphere field -> 4 sphere segments; quantized output must
    match the unsegmented render exactly and the bvh engine within the
    documented silhouette class."""
    from raytracer_tpu.utils.synth import sphere_field

    data, meta = sphere_field(n_spheres=2000, res=64, max_depth=2)
    bvh = build_bvh(data, meta)
    cset = build_clusters(data, meta, bvh)
    assert cset.sph_dat.shape[1] >= 2048
    cam = meta.cameras[0]
    saved = ct.SEG_SLOTS
    try:
        ct.SEG_SLOTS = 512
        from raytracer_tpu.models import whitted
        whitted._render_camera_jit.clear_cache()
        seg = np.asarray(quantize(
            render_camera(data, meta, cam, bvh=cset, engine="cluster")))
    finally:
        ct.SEG_SLOTS = saved
    from raytracer_tpu.models import whitted
    whitted._render_camera_jit.clear_cache()
    unseg = np.asarray(quantize(
        render_camera(data, meta, cam, bvh=cset, engine="cluster")))
    np.testing.assert_array_equal(seg, unseg)
    bv = np.asarray(quantize(
        render_camera(data, meta, cam, bvh=bvh, engine="bvh")))
    d = np.abs(unseg.astype(int) - bv.astype(int)).max(-1)
    # a 2,000-tangent-sphere field has a larger grazing/silhouette tie
    # class than the terrain (measured: 9 of 4,096 pixels, identical
    # segmented and unsegmented — not a segmentation artifact)
    assert (d > 1).mean() <= 5e-3
