"""Row-band streamed rendering must be pixel-identical to the whole-frame
path (same math, different dispatch granularity).  The streamed path is
what renders the reference README's big configurations (256x SSAA, 8K)
without materializing hundreds of millions of rays (raytracer.cpp:506-512
just allocates the scaled buffer; we can't)."""

import dataclasses

import numpy as np
import pytest

from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.models.whitted import render_camera, render_camera_streamed
from raytracer_tpu.ops.image import downsample_mean, downsample_parity, quantize


@pytest.fixture(scope="module")
def scene(reference_inputs):
    return load_scene(f"{reference_inputs}/simple_reflectance.xml")


@pytest.mark.parametrize("engine", ["brute", "cluster"])
@pytest.mark.parametrize("ssaa", [1, 2])
def test_streamed_matches_whole_frame(scene, engine, ssaa):
    data, meta = scene
    cam = dataclasses.replace(meta.cameras[0], width=64, height=96)
    accel = None
    if engine == "cluster":
        accel = build_clusters(data, meta, build_bvh(data, meta))
    rcam = cam.scaled(ssaa) if ssaa > 1 else cam
    color = render_camera(data, meta, rcam, bvh=accel, engine=engine)
    if ssaa > 1:
        ref = np.asarray(downsample_parity(quantize(color), ssaa))
    else:
        ref = np.asarray(quantize(color))
    # tiny chunk -> many bands, including a shorter trailing band
    img = np.asarray(render_camera_streamed(
        data, meta, cam, bvh=accel, engine=engine, chunk=64 * 64,
        ssaa=ssaa,
    ))
    np.testing.assert_array_equal(img, ref)


def test_streamed_mean_mode(scene):
    data, meta = scene
    cam = dataclasses.replace(meta.cameras[0], width=48, height=48)
    rcam = cam.scaled(2)
    color = render_camera(data, meta, rcam, engine="brute")
    ref = np.asarray(quantize(downsample_mean(color, 2)))
    img = np.asarray(render_camera_streamed(
        data, meta, cam, engine="brute", chunk=48 * 48, ssaa=2,
        ssaa_mode="mean",
    ))
    np.testing.assert_array_equal(img, ref)


def test_streamed_jitter_mode(scene):
    """Stochastic sub-pixel sampling (quality extension, non-parity):
    deterministic per band key, close to the fixed-grid mean image, and
    actually different from it (the jitter is live)."""
    data, meta = scene
    cam = dataclasses.replace(meta.cameras[0], width=48, height=48)
    kwargs = dict(engine="brute", chunk=48 * 48, ssaa=2, ssaa_mode="jitter")
    a = np.asarray(render_camera_streamed(data, meta, cam, **kwargs))
    b = np.asarray(render_camera_streamed(data, meta, cam, **kwargs))
    np.testing.assert_array_equal(a, b)  # reproducible

    mean_img = np.asarray(render_camera_streamed(
        data, meta, cam, engine="brute", chunk=48 * 48, ssaa=2,
        ssaa_mode="mean",
    ))
    assert not np.array_equal(a, mean_img)  # offsets actually applied
    # anti-aliased estimates of the same image: close in the mean
    diff = np.abs(a.astype(np.int32) - mean_img.astype(np.int32))
    assert diff.mean() < 4.0, diff.mean()

    # a different seed draws an independent sample set, same seed repeats
    c = np.asarray(render_camera_streamed(data, meta, cam, seed=7, **kwargs))
    assert not np.array_equal(a, c)
    c2 = np.asarray(render_camera_streamed(data, meta, cam, seed=7, **kwargs))
    np.testing.assert_array_equal(c, c2)
    diff7 = np.abs(c.astype(np.int32) - mean_img.astype(np.int32))
    assert diff7.mean() < 4.0, diff7.mean()
