"""Intersection kernels: ray-triangle, ray-sphere, ray-AABB.

Pure jnp, broadcast over arbitrary leading batch dims, fully vectorized for
the VPU.  The math reproduces the reference kernels' acceptance semantics
exactly (verified against /root/reference/raytracer.cpp):

- triangle (raytracer.cpp:129-175): Cramer's-rule barycentric solve with
  INCLUSIVE edges (alpha, beta, gamma >= 0), t >= 0, and NO backface culling.
  A degenerate triangle yields detA == 0 → inf/nan barycentrics → all
  comparisons false → miss, same as IEEE C++.
- sphere (raytracer.cpp:70-96): quadratic with the reference's quirk that the
  reported t is t1 = (-B - sqrt(disc)) / 2A EVEN WHEN NEGATIVE, as long as
  not both roots are negative (origin-inside case).
- AABB (raytracer.cpp:101-126): branchless slab test against a cached
  reciprocal direction; hit iff tmax >= max(0, tmin); returns tmin (negative
  when the origin is inside the box).  min/max replicate C++ std::min /
  std::max NaN semantics (return the FIRST argument when the comparison is
  false) so the 0 * inf = NaN corner behaves identically.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def normalize(v):
    """x / |x| with no epsilon, matching parser.h:72-79."""
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def cpp_min(a, b):
    """std::min(a, b) == (b < a) ? b : a — returns `a` on NaN comparison."""
    return jnp.where(b < a, b, a)


def cpp_max(a, b):
    """std::max(a, b) == (a < b) ? b : a — returns `a` on NaN comparison."""
    return jnp.where(a < b, b, a)


def _det3(u, v, w):
    """Determinant of the 3x3 matrix with COLUMNS u, v, w.

    Expansion order matches the reference's det() helper
    (raytracer.cpp:15-19) for float-faithful results.
    """
    return (
        u[..., 0] * (v[..., 1] * w[..., 2] - w[..., 1] * v[..., 2])
        - v[..., 0] * (u[..., 1] * w[..., 2] - w[..., 1] * u[..., 2])
        + w[..., 0] * (u[..., 1] * v[..., 2] - v[..., 1] * u[..., 2])
    )


def tri_intersect(origin, direction, a, b, c, bfc: bool = False):
    """Ray-triangle test (Cramer / Möller-Trumbore-equivalent).

    Args broadcast: origin/direction (..., 3), a/b/c (..., 3).
    Returns (t, exists): t is valid only where exists.
    Differentiable in all float inputs; `exists` is a discrete mask.

    ``bfc=True`` culls backfaces: det_a = det(a-b, a-c, d) equals
    ((b-a)x(c-a))·d = n·d, so a triangle whose precomputed normal points
    along the ray (det_a > 0) is skipped.  The reference code does NOT
    cull (raytracer.cpp:129-175, matching outputs_nobfc/); the flag
    exists for comparisons against the TA's culled goldens (outputs/,
    outputs_nobfc/README.txt).
    """
    ab = a - b
    ac = a - c
    ao = a - origin
    det_a = _det3(ab, ac, direction)
    beta = _det3(ao, ac, direction) / det_a
    gamma = _det3(ab, ao, direction) / det_a
    t = _det3(ab, ac, ao) / det_a
    alpha = 1.0 - beta - gamma
    exists = (alpha >= 0) & (beta >= 0) & (gamma >= 0) & (t >= 0)
    if bfc:
        exists &= det_a < 0
    return t, exists


def sphere_intersect(origin, direction, center, radius):
    """Ray-sphere quadratic.

    Returns (t, exists) with t = smaller root t1, possibly negative when the
    origin is inside (reference quirk, raytracer.cpp:82-92).
    """
    oc = origin - center
    b_coef = 2.0 * dot(direction, oc)
    a_coef = dot(direction, direction)
    c_coef = dot(oc, oc) - radius * radius
    disc = b_coef * b_coef - 4.0 * a_coef * c_coef
    # guard sqrt for NaN-free gradients; disc<0 lanes are masked out below
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b_coef - sq) / (2.0 * a_coef)
    t2 = (-b_coef + sq) / (2.0 * a_coef)
    exists = (disc >= 0) & ~((t1 < 0) & (t2 < 0))
    return t1, exists


def aabb_intersect(origin, inv_direction, box_min, box_max):
    """Slab test. Returns (tmin, exists); tmin < 0 when origin inside."""
    t1 = (box_min - origin) * inv_direction
    t2 = (box_max - origin) * inv_direction
    tmin = cpp_min(t1[..., 0], t2[..., 0])
    tmax = cpp_max(t1[..., 0], t2[..., 0])
    tmin = cpp_max(tmin, cpp_min(t1[..., 1], t2[..., 1]))
    tmax = cpp_min(tmax, cpp_max(t1[..., 1], t2[..., 1]))
    tmin = cpp_max(tmin, cpp_min(t1[..., 2], t2[..., 2]))
    tmax = cpp_min(tmax, cpp_max(t1[..., 2], t2[..., 2]))
    exists = tmax >= cpp_max(jnp.zeros_like(tmin), tmin)
    return tmin, exists
