"""Primary (eye) ray generation as a pure broadcast over the pixel grid.

Semantics match the reference's EyeRayGenerator
(``/root/reference/raytracer.cpp:284-325``):

- basis: ``w = -gaze`` (NOT normalized), ``v = up`` verbatim (no
  re-orthonormalization), ``u = v x w`` — right-handed per hw1_v1.pdf.
- image-plane origin ``q = (e + gaze*near_distance) + u*l + v*t``.
- pixel (row, col) sampled at its center: ``su = (col+0.5)(r-l)/nx``,
  ``sv = (row+0.5)(t-b)/ny``; sample point ``s = q + u*su - v*sv``; the ray
  direction is ``s - e`` and is deliberately left UNNORMALIZED — the
  reference's Ray ctor never normalizes the stored member (its parameter
  shadows it, raytracer.cpp:61-67), so t along eye rays is in units of
  |s - e|.  Hit points and t-ordering are invariant to that scale.

Rows run top-down: row 0 is the top image row.
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracer_tpu.models.scene import Camera


def camera_basis(cam: Camera):
    """Return (e, u, v, q, su_mult, sv_mult) as f32 jnp arrays/scalars."""
    e = jnp.asarray(cam.position, dtype=jnp.float32)
    gaze = jnp.asarray(cam.gaze, dtype=jnp.float32)
    v = jnp.asarray(cam.up, dtype=jnp.float32)
    w = -gaze
    u = jnp.cross(v, w)
    l, r, b, t = [jnp.float32(x) for x in cam.near_plane]
    m = e + gaze * jnp.float32(cam.near_distance)
    q = m + u * l + v * t
    su_mult = (r - l) / jnp.float32(cam.width)
    sv_mult = (t - b) / jnp.float32(cam.height)
    return e, u, v, q, su_mult, sv_mult


def eye_rays(cam: Camera):
    """Eye rays for the full pixel grid.

    Returns:
      origin: (3,) f32 — shared camera position.
      dirs:   (H*W, 3) f32 — unnormalized directions, row-major, row 0 = top.
    """
    e, u, v, q, su_mult, sv_mult = camera_basis(cam)
    cols = (jnp.arange(cam.width, dtype=jnp.float32) + 0.5) * su_mult   # (W,)
    rows = (jnp.arange(cam.height, dtype=jnp.float32) + 0.5) * sv_mult  # (H,)
    # s = q + u*su - v*sv  →  dir = s - e
    s = (
        q[None, None, :]
        + u[None, None, :] * cols[None, :, None]
        - v[None, None, :] * rows[:, None, None]
    )  # (H, W, 3)
    dirs = (s - e[None, None, :]).reshape(-1, 3)
    return e, dirs
