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


def camera_vectors(cam: Camera):
    """The camera's numeric parameters as one (5, 3) f32 array:
    rows = position, gaze, up, (l, r, b) and a fifth scalar group folded
    as (t, near_distance, 0) — packed (5, 3) so cameras sharing a
    resolution can share one compiled render (parameters traced, only
    W/H static)."""
    import numpy as _np

    l, r, b, t = cam.near_plane
    return _np.array(
        [cam.position, cam.gaze, cam.up, (l, r, b),
         (t, cam.near_distance, 0.0)], dtype=_np.float32,
    )


def camera_basis_from(vec, width: int, height: int):
    """(e, u, v, q, su_mult, sv_mult) from a packed camera_vectors array."""
    vec = jnp.asarray(vec, jnp.float32)
    e, gaze, v = vec[0], vec[1], vec[2]
    l, r, b = vec[3, 0], vec[3, 1], vec[3, 2]
    t, near = vec[4, 0], vec[4, 1]
    w = -gaze
    u = jnp.cross(v, w)
    m = e + gaze * near
    q = m + u * l + v * t
    su_mult = (r - l) / jnp.float32(width)
    sv_mult = (t - b) / jnp.float32(height)
    return e, u, v, q, su_mult, sv_mult


def camera_basis(cam: Camera):
    """Return (e, u, v, q, su_mult, sv_mult) as f32 jnp arrays/scalars."""
    return camera_basis_from(camera_vectors(cam), cam.width, cam.height)


def eye_rays_from(vec, width: int, height: int):
    """Eye rays from packed camera vectors (shapes static, values traced)."""
    e, u, v, q, su_mult, sv_mult = camera_basis_from(vec, width, height)
    cols = (jnp.arange(width, dtype=jnp.float32) + 0.5) * su_mult   # (W,)
    rows = (jnp.arange(height, dtype=jnp.float32) + 0.5) * sv_mult  # (H,)
    # s = q + u*su - v*sv  →  dir = s - e
    s = (
        q[None, None, :]
        + u[None, None, :] * cols[None, :, None]
        - v[None, None, :] * rows[:, None, None]
    )  # (H, W, 3)
    dirs = (s - e[None, None, :]).reshape(-1, 3)
    return e, dirs


def eye_rays_band(vec, width: int, height: int, row0, band_h: int,
                  jitter=None):
    """Eye rays for rows [row0, row0+band_h) of the full pixel grid.

    ``row0`` is TRACED (one compile serves every band of a streamed
    frame); only the band SHAPE is static.  Semantics identical to
    ``eye_rays_from`` restricted to those rows.

    ``jitter`` ((band_h, W, 2) f32 in [-0.5, 0.5), optional) offsets each
    sample from its pixel center — stochastic supersampling, a quality
    extension beyond the reference's fixed-grid SSAA (raytracer.cpp:
    506-512 only scales the resolution; centers stay at +0.5).
    """
    e, u, v, q, su_mult, sv_mult = camera_basis_from(vec, width, height)
    row0 = jnp.asarray(row0, jnp.float32)
    if jitter is None:
        cols = (jnp.arange(width, dtype=jnp.float32) + 0.5) * su_mult
        rows = (row0 + jnp.arange(band_h, dtype=jnp.float32) + 0.5) * sv_mult
        s = (
            q[None, None, :]
            + u[None, None, :] * cols[None, :, None]
            - v[None, None, :] * rows[:, None, None]
        )  # (band_h, W, 3)
    else:
        su = (jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5
              + jitter[..., 0]) * su_mult                       # (band_h, W)
        sv = (row0 + jnp.arange(band_h, dtype=jnp.float32)[:, None] + 0.5
              + jitter[..., 1]) * sv_mult
        s = (
            q[None, None, :]
            + u[None, None, :] * su[..., None]
            - v[None, None, :] * sv[..., None]
        )
    dirs = (s - e[None, None, :]).reshape(-1, 3)
    return e, dirs


def eye_rays_pixels(vec, width: int, height: int, rows, cols, jitter=None):
    """Eye rays for an ARBITRARY set of pixels (not a dense grid).

    ``rows``/``cols`` are (N,) pixel coordinates (row 0 = top, same
    convention as the grid forms); ``jitter`` ((N, 2) f32 in [-0.5, 0.5),
    optional) offsets each sample from its pixel center.  This is the
    generator behind adaptive sampling (ops.adaptive): refinement waves
    re-sample only selected pixel blocks, so ray N maps to whatever pixel
    the caller chose rather than a raster position.  Semantics otherwise
    identical to ``eye_rays_from``.
    """
    e, u, v, q, su_mult, sv_mult = camera_basis_from(vec, width, height)
    rows = jnp.asarray(rows, jnp.float32)
    cols = jnp.asarray(cols, jnp.float32)
    jx = jitter[..., 0] if jitter is not None else 0.0
    jy = jitter[..., 1] if jitter is not None else 0.0
    su = (cols + 0.5 + jx) * su_mult          # (N,)
    sv = (rows + 0.5 + jy) * sv_mult
    s = q[None, :] + u[None, :] * su[:, None] - v[None, :] * sv[:, None]
    return e, s - e[None, :]


def eye_rays(cam: Camera):
    """Eye rays for the full pixel grid.

    Returns:
      origin: (3,) f32 — shared camera position.
      dirs:   (H*W, 3) f32 — unnormalized directions, row-major, row 0 = top.
    """
    return eye_rays_from(camera_vectors(cam), cam.width, cam.height)
