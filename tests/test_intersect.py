"""Closed-form unit tests for the intersection kernels, including the
reference's acceptance quirks (SURVEY.md parity checklist)."""

import jax.numpy as jnp
import numpy as np

from raytracer_tpu.ops.intersect import (
    aabb_intersect,
    sphere_intersect,
    tri_intersect,
)

O = jnp.array([0.0, 0.0, 0.0])
Z = jnp.array([0.0, 0.0, -1.0])


def test_sphere_head_on():
    t, ok = sphere_intersect(O, Z, jnp.array([0.0, 0.0, -5.0]), 1.0)
    assert bool(ok) and np.isclose(float(t), 4.0)


def test_sphere_miss():
    t, ok = sphere_intersect(O, Z, jnp.array([3.0, 0.0, -5.0]), 1.0)
    assert not bool(ok)


def test_sphere_inside_reports_negative_t():
    """Reference quirk: t = t1 even when negative, if t2 >= 0
    (raytracer.cpp:82-92)."""
    t, ok = sphere_intersect(O, Z, jnp.array([0.0, 0.0, 0.0]), 1.0)
    assert bool(ok) and np.isclose(float(t), -1.0)


def test_sphere_behind_rejected():
    t, ok = sphere_intersect(O, Z, jnp.array([0.0, 0.0, 5.0]), 1.0)
    assert not bool(ok)  # both roots negative


def test_sphere_unnormalized_direction_scales_t():
    t, ok = sphere_intersect(O, 2.0 * Z, jnp.array([0.0, 0.0, -5.0]), 1.0)
    assert bool(ok) and np.isclose(float(t), 2.0)


def test_triangle_center_hit():
    a = jnp.array([-1.0, -1.0, -2.0])
    b = jnp.array([1.0, -1.0, -2.0])
    c = jnp.array([0.0, 1.0, -2.0])
    t, ok = tri_intersect(O, Z, a, b, c)
    assert bool(ok) and np.isclose(float(t), 2.0)


def test_triangle_edge_inclusive():
    """Edges are inclusive (alpha/beta/gamma >= 0, raytracer.cpp:166-169)."""
    a = jnp.array([0.0, 0.0, -2.0])
    b = jnp.array([1.0, 0.0, -2.0])
    c = jnp.array([0.0, 1.0, -2.0])
    t, ok = tri_intersect(O, Z, a, b, c)  # hits exactly vertex a
    assert bool(ok) and np.isclose(float(t), 2.0)


def test_triangle_no_backface_culling():
    a = jnp.array([-1.0, -1.0, -2.0])
    b = jnp.array([1.0, -1.0, -2.0])
    c = jnp.array([0.0, 1.0, -2.0])
    # reversed winding must still hit (raytracer.cpp:129-175 has no culling)
    t, ok = tri_intersect(O, Z, a, c, b)
    assert bool(ok) and np.isclose(float(t), 2.0)


def test_triangle_behind_rejected():
    a = jnp.array([-1.0, -1.0, 2.0])
    b = jnp.array([1.0, -1.0, 2.0])
    c = jnp.array([0.0, 1.0, 2.0])
    t, ok = tri_intersect(O, Z, a, b, c)
    assert not bool(ok)


def test_degenerate_triangle_is_miss():
    a = jnp.array([0.0, 0.0, -2.0])
    t, ok = tri_intersect(O, Z, a, a, a)
    assert not bool(ok)  # detA == 0 → nan barycentrics → comparisons false


def test_aabb_hit_and_tmin():
    inv = 1.0 / Z
    t, ok = aabb_intersect(O, inv, jnp.array([-1.0, -1.0, -3.0]),
                           jnp.array([1.0, 1.0, -2.0]))
    assert bool(ok) and np.isclose(float(t), 2.0)


def test_aabb_inside_negative_tmin():
    inv = 1.0 / Z
    t, ok = aabb_intersect(O, inv, jnp.array([-1.0, -1.0, -1.0]),
                           jnp.array([1.0, 1.0, 1.0]))
    assert bool(ok) and float(t) < 0  # origin inside → negative tmin


def test_aabb_axis_parallel_zero_component():
    """Zero direction components rely on IEEE inf semantics
    (raytracer.cpp:98-100)."""
    d = jnp.array([0.0, 0.0, -1.0])
    inv = 1.0 / d  # inf, inf, -1
    t, ok = aabb_intersect(jnp.array([0.5, 0.5, 0.0]), inv,
                           jnp.array([0.0, 0.0, -3.0]),
                           jnp.array([1.0, 1.0, -2.0]))
    assert bool(ok) and np.isclose(float(t), 2.0)
    t, ok = aabb_intersect(jnp.array([2.0, 0.5, 0.0]), inv,
                           jnp.array([0.0, 0.0, -3.0]),
                           jnp.array([1.0, 1.0, -2.0]))
    assert not bool(ok)  # outside the slab on a zero-component axis


def test_aabb_behind_rejected():
    inv = 1.0 / Z
    t, ok = aabb_intersect(O, inv, jnp.array([-1.0, -1.0, 2.0]),
                           jnp.array([1.0, 1.0, 3.0]))
    assert not bool(ok)
