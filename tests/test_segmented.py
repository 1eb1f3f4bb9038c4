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
