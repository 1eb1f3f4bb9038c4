"""Cluster engine (Pallas, interpret mode on CPU) vs brute reference."""

import dataclasses

import numpy as np
import pytest

from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.models.whitted import render_camera


@pytest.mark.parametrize("scene", ["simple", "cornellbox", "marbles"])
def test_cluster_matches_brute(reference_inputs, scene):
    data, meta = load_scene(f"{reference_inputs}/{scene}.xml")
    bvh = build_bvh(data, meta)
    cset = build_clusters(data, meta, bvh)
    cam = dataclasses.replace(meta.cameras[0], width=64, height=64)
    from raytracer_tpu.ops.image import quantize

    brute = np.asarray(quantize(render_camera(data, meta, cam, engine="brute")))
    clus = np.asarray(
        quantize(render_camera(data, meta, cam, bvh=cset, engine="cluster"))
    )
    # compare after tone quantization (the framework's output contract):
    # the engines evaluate the same math in different float orders, so
    # radiance differs in the last few ulps (<=1 LSB quantized); shared-
    # edge t-ties may additionally flip a handful of edge pixels between
    # two equally-near primitives (the reference's own BVH order does too).
    d = np.abs(brute.astype(int) - clus.astype(int)).max(-1)
    assert (d > 1).sum() <= 4, f"{(d > 1).sum()} pixels differ by >1 LSB"


def test_cluster_set_structure(reference_inputs):
    from raytracer_tpu.models.clusters import CLUSTER

    data, meta = load_scene(f"{reference_inputs}/marbles.xml")
    bvh = build_bvh(data, meta)
    cset = build_clusters(data, meta, bvh)
    # valid sphere slots are exactly those with positive radius (treelet
    # clusters pad their strides with degenerate zero-radius entries)
    rad = np.asarray(cset.sph_dat)[3]
    valid = rad > 0
    assert int(valid.sum()) == meta.n_spheres
    sph_ids = np.asarray(cset.sph_slot)[valid]
    assert len(set(sph_ids.tolist())) == meta.n_spheres
    # every valid slot's sphere lies inside its cluster's AABB
    centers = np.asarray(cset.sph_dat)[0:3].T
    cmin = np.asarray(cset.sph_cmin)
    cmax = np.asarray(cset.sph_cmax)
    for s in np.nonzero(valid)[0]:
        ci = s // CLUSTER
        assert (centers[s] - rad[s] >= cmin[ci] - 1e-5).all()
        assert (centers[s] + rad[s] <= cmax[ci] + 1e-5).all()
    # triangle side: valid slots hold each real triangle exactly once
    data2, meta2 = load_scene(f"{reference_inputs}/bunny.xml")
    cset2 = build_clusters(data2, meta2, build_bvh(data2, meta2))
    n = np.asarray(cset2.tri_dat)[0:3]
    tvalid = (n != 0).any(axis=0)
    ids = np.asarray(cset2.tri_slot)[tvalid]
    assert len(set(ids.tolist())) == len(ids) == meta2.n_tris
