"""Pin the reference's behavioral quirks (SURVEY.md parity checklist).

Each of these is a deliberate reproduction of something odd in the
reference; a refactor that 'fixes' them would silently break golden
parity, so they get explicit regression tests.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.models.whitted import render_camera
from raytracer_tpu.ops.camera import eye_rays
from raytracer_tpu.ops.intersect import sphere_intersect
from raytracer_tpu.ops.shade import RAD_TO_DEG, SPEC_GATE_DEG


def test_eye_rays_unnormalized(reference_inputs):
    """Quirk 1 (raytracer.cpp:61-67): stored eye-ray directions are s - e,
    NOT unit vectors."""
    _, meta = load_scene(f"{reference_inputs}/simple.xml")
    _, dirs = eye_rays(meta.cameras[0])
    norms = np.linalg.norm(np.asarray(dirs), axis=-1)
    assert not np.allclose(norms, 1.0, atol=1e-3)


def test_sphere_reports_negative_near_root():
    """Quirk 2 (raytracer.cpp:82-92): t1 is reported even when negative,
    as long as not both roots are negative (origin inside the sphere)."""
    o = jnp.array([0.0, 0.0, 0.0])
    d = jnp.array([0.0, 0.0, -1.0])
    c = jnp.array([0.0, 0.0, -1.0])   # origin inside (r=2)
    t, ok = sphere_intersect(o, d, c, jnp.float32(2.0))
    assert bool(ok)
    assert float(t) < 0.0             # t1 = -1 (behind), t2 = +3
    # both roots negative -> miss
    t2, ok2 = sphere_intersect(o, jnp.array([0.0, 0.0, 1.0]),
                               jnp.array([0.0, 0.0, 10.0]), jnp.float32(1.0))
    t3, ok3 = sphere_intersect(o, jnp.array([0.0, 0.0, -1.0]),
                               jnp.array([0.0, 0.0, 10.0]), jnp.float32(1.0))
    assert bool(ok2) and not bool(ok3)


def test_specular_gate_constants():
    """Quirk 3 (raytracer.cpp:411): the gate uses the literal 3.1415 (not
    pi) and 90.01 degrees — the effective cos threshold is a tiny negative
    number (-1.28e-4), and the zero-contribution shadow skip margin
    (RELEVANT_COS, derived from the same constants minus a safety epsilon)
    must stay strictly below it to be sound."""
    from raytracer_tpu.ops.shade import RELEVANT_COS

    assert SPEC_GATE_DEG == 90.01
    assert abs(RAD_TO_DEG - 180.0 / 3.1415) < 1e-12
    cos_threshold = np.cos(SPEC_GATE_DEG / RAD_TO_DEG)
    assert -2e-4 < cos_threshold < 0
    assert RELEVANT_COS < cos_threshold  # skip margin is conservative


def test_ambient_added_every_bounce(reference_inputs):
    """Quirk 5 (raytracer.cpp:394): mirror paths re-add ambient at every
    bounce — a 2-mirror corridor is strictly brighter than single-depth."""
    data, meta = load_scene(f"{reference_inputs}/mirror_spheres.xml")
    cam = dataclasses.replace(meta.cameras[0], width=48, height=48)
    deep = np.asarray(render_camera(data, meta, cam, engine="brute"))
    meta0 = dataclasses.replace(meta, max_depth=0)
    shallow = np.asarray(render_camera(data, meta0, cam, engine="brute"))
    assert deep.sum() > shallow.sum() * 1.05


def test_deep_miss_is_black_not_background(tmp_path):
    """Quirk 5b (raytracer.cpp:442-449): a mirror bounce that misses adds
    BLACK, never the background color."""
    import textwrap

    xml = tmp_path / "mirror_to_sky.xml"
    xml.write_text(textwrap.dedent("""\
        <Scene>
            <BackgroundColor>200 0 0</BackgroundColor>
            <MaxRecursionDepth>3</MaxRecursionDepth>
            <Cameras>
                <Camera id="1">
                    <Position>0 0 1</Position>
                    <Gaze>0 0 -1</Gaze>
                    <Up>0 1 0</Up>
                    <NearPlane>-0.1 0.1 -0.1 0.1</NearPlane>
                    <NearDistance>1</NearDistance>
                    <ImageResolution>8 8</ImageResolution>
                    <ImageName>m.ppm</ImageName>
                </Camera>
            </Cameras>
            <Lights><AmbientLight>0 0 0</AmbientLight></Lights>
            <Materials>
                <Material id="1" type="mirror">
                    <AmbientReflectance>0 0 0</AmbientReflectance>
                    <DiffuseReflectance>0 0 0</DiffuseReflectance>
                    <SpecularReflectance>0 0 0</SpecularReflectance>
                    <MirrorReflectance>1 1 1</MirrorReflectance>
                    <PhongExponent>1</PhongExponent>
                </Material>
            </Materials>
            <VertexData>
                -5 -5 -2
                5 -5 -2
                0 5 -2
            </VertexData>
            <Objects>
                <Triangle id="1">
                    <Material>1</Material>
                    <Indices>1 2 3</Indices>
                </Triangle>
            </Objects>
        </Scene>
    """))
    data, meta = load_scene(str(xml))
    img = np.asarray(render_camera(data, meta, meta.cameras[0], engine="brute"))
    # the mirror reflects the camera rays back toward +z into empty space:
    # that deep miss must be black (0), not the red background
    center = img[4, 4]
    assert center[0] == 0.0 and center.sum() == 0.0


def test_fused_and_chunked_render_agree(reference_inputs):
    """The single-dispatch fused frame and the chunked fallback must be
    bitwise identical (same kernels, same order)."""
    from raytracer_tpu.models.bvh import build_bvh
    from raytracer_tpu.models.clusters import build_clusters

    data, meta = load_scene(f"{reference_inputs}/simple_reflectance.xml")
    cset = build_clusters(data, meta, build_bvh(data, meta))
    cam = dataclasses.replace(meta.cameras[0], width=64, height=64)
    fused = np.asarray(
        render_camera(data, meta, cam, bvh=cset, engine="cluster")
    )
    chunked = np.asarray(
        render_camera(data, meta, cam, bvh=cset, engine="cluster", chunk=2048)
    )
    np.testing.assert_array_equal(fused, chunked)
