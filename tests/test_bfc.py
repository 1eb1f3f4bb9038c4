"""Backface-culling flag (SURVEY §7.6).

The reference code never culls (raytracer.cpp:129-175) and matches
outputs_nobfc/; the TA's outputs/ set was rendered WITH culling.  All four
bundled golden pairs are binary-identical (outputs_nobfc/README.txt lists
only stripped scenes as differing), so these tests check the culling
semantics directly and that a bfc-on render stays in the goldens'
"tiny differences" class.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.models.whitted import render_camera
from raytracer_tpu.ops.image import quantize
from raytracer_tpu.ops.intersect import tri_intersect
from raytracer_tpu.utils.ppm import read_ppm


def test_tri_bfc_semantics():
    """A triangle whose normal (b-a)x(c-a) points along the ray direction
    is a backface: hit without bfc, culled with bfc; the front-facing
    winding is hit either way."""
    o = jnp.array([0.0, 0.0, -1.0])
    d = jnp.array([0.0, 0.0, 1.0])
    a = jnp.array([1.0, 0.0, 0.0])
    b = jnp.array([0.0, 1.0, 0.0])
    c = jnp.array([0.0, 0.0, 0.0])
    # n = (b-a)x(c-a) = (-1,1,0)x(-1,0,0) = (0,0,1) — along d: backface
    _, ok_nobfc = tri_intersect(o, d, a, b, c, bfc=False)
    _, ok_bfc = tri_intersect(o, d, a, b, c, bfc=True)
    assert bool(ok_nobfc) and not bool(ok_bfc)
    # swapped winding: n = (0,0,-1), against d: front face, never culled
    _, ok_front = tri_intersect(o, d, a, c, b, bfc=True)
    assert bool(ok_front)


@pytest.mark.parametrize("engine", ["brute", "bvh", "cluster"])
def test_engines_agree_with_bfc(reference_inputs, engine):
    """All three engines implement the same culling rule (small frame)."""
    data, meta = load_scene(f"{reference_inputs}/simple.xml")
    import dataclasses

    cam = dataclasses.replace(meta.cameras[0], width=64, height=64)
    accel = None
    if engine == "bvh":
        accel = build_bvh(data, meta)
    elif engine == "cluster":
        from raytracer_tpu.models.clusters import build_clusters

        accel = build_clusters(data, meta, build_bvh(data, meta))
    on = np.asarray(quantize(render_camera(
        data, meta, cam, bvh=accel, engine=engine, bfc=True)))
    off = np.asarray(quantize(render_camera(
        data, meta, cam, bvh=accel, engine=engine, bfc=False)))
    ref_on = np.asarray(quantize(render_camera(
        data, meta, cam, engine="brute", bfc=True)))
    ref_off = np.asarray(quantize(render_camera(
        data, meta, cam, engine="brute", bfc=False)))
    assert np.abs(on.astype(int) - ref_on.astype(int)).max() <= 1
    assert np.abs(off.astype(int) - ref_off.astype(int)).max() <= 1
    # simple.xml's visible faces are front-facing: bfc changes nothing
    assert np.array_equal(on, off) or np.abs(
        on.astype(int) - off.astype(int)).max() <= 1


@pytest.mark.slow
def test_bunny_bfc_parity(reference_inputs, reference_outputs):
    """bunny bfc-on vs outputs/bunny.ppm (VERDICT item 8): bunny's golden
    pair is binary-identical, so a culled render must stay within the
    'tiny differences' class the TA describes (measured: 156/786k channels
    beyond ±2, max |Δ|=73 at silhouette pixels where a backface was the
    reference's visible surface)."""
    data, meta = load_scene(f"{reference_inputs}/bunny.xml")
    cam = meta.cameras[0]
    accel = build_bvh(data, meta)
    img = np.asarray(quantize(render_camera(
        data, meta, cam, bvh=accel, engine="bvh", bfc=True)))
    gold = read_ppm(f"{reference_outputs}/bunny.ppm")
    d = np.abs(img.astype(int) - gold.astype(int))
    assert (d > 0).mean() <= 0.02
    assert (d > 2).mean() <= 1e-3
    assert (d.astype(float) ** 2).mean() <= 0.5
