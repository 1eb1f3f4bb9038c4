"""Camera basis and eye-ray generation vs hand-computed values
(raytracer.cpp:284-325 semantics)."""

import numpy as np

from raytracer_tpu.models.scene import Camera
from raytracer_tpu.ops.camera import eye_rays

CAM = Camera(
    position=(0.0, 0.0, 0.0),
    gaze=(0.0, 0.0, -1.0),
    up=(0.0, 1.0, 0.0),
    near_plane=(-1.0, 1.0, -1.0, 1.0),
    near_distance=1.0,
    width=4,
    height=4,
    image_name="x.ppm",
)


def test_center_symmetry_and_plane():
    o, d = eye_rays(CAM)
    d = np.asarray(d).reshape(4, 4, 3)
    assert np.allclose(np.asarray(o), 0.0)
    # all rays point at the z=-1 near plane (unnormalized: dir_z == -1)
    assert np.allclose(d[..., 2], -1.0)
    # top-left pixel center: su=(0.5)(2/4)=0.25 → x=-1+0.25=-0.75; y=+0.75
    assert np.allclose(d[0, 0], [-0.75, 0.75, -1.0])
    # rows go top-down, cols left-right
    assert np.allclose(d[3, 3], [0.75, -0.75, -1.0])


def test_directions_unnormalized():
    """Eye-ray directions keep the s - e scale (reference Ray ctor quirk,
    raytracer.cpp:61-67)."""
    o, d = eye_rays(CAM)
    n = np.linalg.norm(np.asarray(d), axis=-1)
    assert (np.abs(n - 1.0) > 1e-3).any()


def test_up_not_orthonormalized():
    cam = Camera(
        position=(0.0, 0.0, 0.0),
        gaze=(0.0, 0.0, -2.0),       # non-unit gaze
        up=(0.0, 2.0, 0.1),          # non-unit, non-orthogonal up
        near_plane=(-1.0, 1.0, -1.0, 1.0),
        near_distance=1.0,
        width=2,
        height=2,
        image_name="x.ppm",
    )
    o, d = eye_rays(cam)
    d = np.asarray(d).reshape(2, 2, 3)
    # m = e + gaze*dist = (0,0,-2); u = up × (-gaze) = (2,0,0.1)×... verify
    # against a direct recomputation of the reference formulas:
    e = np.zeros(3)
    gaze = np.array([0.0, 0.0, -2.0])
    v = np.array([0.0, 2.0, 0.1])
    w = -gaze
    u = np.cross(v, w)
    q = (e + gaze * 1.0) + u * -1.0 + v * 1.0
    su = (0 + 0.5) * (2.0 / 2)
    sv = (0 + 0.5) * (2.0 / 2)
    s = q + u * su - v * sv
    assert np.allclose(d[0, 0], s - e, atol=1e-6)
