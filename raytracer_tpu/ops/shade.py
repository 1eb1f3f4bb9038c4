"""Differentiable hit refinement + Blinn-Phong shading over the wavefront.

The visibility engines (ops.traverse) return only integer primitive ids.
``refine_hit`` re-derives t, the shading normal, and the material id from the
chosen primitive DIFFERENTIABLY, so gradients flow into vertices, sphere
parameters, materials, and lights while the discrete hit topology stays
fixed (piecewise-constant, zero-gradient) — the standard convention for
differentiable Whitted tracing.

Shading semantics replicate /root/reference/raytracer.cpp:385-452 exactly:

- ambient  = mat.ambient ⊙ scene.ambient_light, added at EVERY bounce (:394)
- the shadow/illumination point is offset along the (unflipped!) geometric
  normal by shadow_ray_epsilon (:397); shadow rays use the normalized
  direction from the OFFSET point, and occlusion means any hit with
  t < distance-to-light (:399-405)
- irradiance uses the distance measured from the OFFSET point (:400,408)
- cosTheta for diffuse/specular-gate uses the direction from the UNOFFSET
  point (:402,407); diffuse uses clamp(cosTheta, 0, 1) (:420-421)
- Blinn-Phong specular is gated by acos(cosTheta)*180/3.1415 <= 90.01
  (:411-418, the reference's literal constants) with half-vector
  h = normalize(shadow_dir + normalize(-ray_dir))
- mirror reflection: dir = d̂ + n̂·2(−d̂·n̂) from the offset point, tinted by
  mat.mirror (:430-439); the normal is never flipped for backfaces.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from raytracer_tpu.models.scene import SceneData, SceneMeta
from raytracer_tpu.ops.intersect import dot, normalize

SPEC_GATE_DEG = 90.01
RAD_TO_DEG = 180.0 / 3.1415  # reference's literal pi (raytracer.cpp:411)

# A light strictly behind the surface contributes nothing: diffuse clamps
# at 0 and the specular gate (theta_deg <= SPEC_GATE_DEG) closes once
# cos_theta < cos(SPEC_GATE_DEG / RAD_TO_DEG) ≈ -1.282e-4 (the literal
# 3.1415 maps 90° slightly below pi/2, so the gate reaches only ~1.28e-4
# rad past it).  DERIVED from the gate constants, minus a safety epsilon
# so float noise in cos_theta can never skip a ray the gate would accept.
import math as _math

RELEVANT_COS = float(_math.cos(SPEC_GATE_DEG / RAD_TO_DEG)) - 5e-5


class Hit(NamedTuple):
    hit: jnp.ndarray      # (R,)  bool
    t: jnp.ndarray        # (R,)  f32 — safe (1.0) on miss lanes
    normal: jnp.ndarray   # (R,3) f32 — unit, geometric, unflipped
    mat: jnp.ndarray      # (R,)  i32 — 0 on miss lanes
    point: jnp.ndarray    # (R,3) f32 — origin + t*dir
    offset: jnp.ndarray   # (R,3) f32 — point + normal*eps


def _det3(u, v, w):
    return (
        u[..., 0] * (v[..., 1] * w[..., 2] - w[..., 1] * v[..., 2])
        - v[..., 0] * (u[..., 1] * w[..., 2] - w[..., 1] * u[..., 2])
        + w[..., 0] * (u[..., 1] * v[..., 2] - v[..., 1] * u[..., 2])
    )


def refine_hit(data: SceneData, meta: SceneMeta, origin, dirs, prim) -> Hit:
    """Differentiably recompute the intersection for chosen prim ids.

    All divisions/normalizations are guarded on miss lanes so reverse-mode
    gradients stay NaN-free (the where-grad trap).
    """
    prim = jax.lax.stop_gradient(prim)
    t_pad = data.tri_v.shape[0]
    s_pad = data.sphere_cvid.shape[0]
    hit = prim >= 0
    p = jnp.where(hit, prim, 0)
    is_tri = p < t_pad

    origin = jnp.broadcast_to(origin, dirs.shape)

    # --- triangle branch
    ti = jnp.clip(p, 0, t_pad - 1)
    v = data.tri_v[ti]
    a = data.vertices[v[:, 0]]
    b = data.vertices[v[:, 1]]
    c = data.vertices[v[:, 2]]
    ab, ac, ao = a - b, a - c, a - origin
    det_a = _det3(ab, ac, dirs)
    safe_det = jnp.where(hit & is_tri, det_a, 1.0)
    t_tri = _det3(ab, ac, ao) / safe_det
    cr = jnp.cross(b - a, c - a)
    cr = jnp.where((hit & is_tri)[:, None], cr, jnp.array([0.0, 0.0, 1.0]))
    n_tri = normalize(cr)

    # --- sphere branch
    si = jnp.clip(p - t_pad, 0, s_pad - 1)
    center = data.vertices[data.sphere_cvid[si]]
    rad = data.sphere_rad[si]
    oc = origin - center
    a_q = dot(dirs, dirs)
    b_q = 2.0 * dot(dirs, oc)
    c_q = dot(oc, oc) - rad * rad
    disc = b_q * b_q - 4.0 * a_q * c_q
    disc = jnp.where(hit & ~is_tri, disc, 1.0)
    t_sph = (-b_q - jnp.sqrt(jnp.maximum(disc, 0.0))) / (2.0 * a_q)
    safe_rad = jnp.where(hit & ~is_tri, rad, 1.0)
    p_sph = origin + t_sph[:, None] * dirs
    n_sph_raw = (p_sph - center) / safe_rad[:, None]
    n_sph_raw = jnp.where(
        (hit & ~is_tri)[:, None], n_sph_raw, jnp.array([0.0, 0.0, 1.0])
    )
    n_sph = normalize(n_sph_raw)

    t = jnp.where(is_tri, t_tri, t_sph)
    t = jnp.where(hit, t, 1.0)
    normal = jnp.where(is_tri[:, None], n_tri, n_sph)
    mat = jnp.where(
        is_tri, data.tri_mat[ti], data.sphere_mat[si]
    )
    mat = jnp.where(hit, mat, 0)
    point = origin + t[:, None] * dirs
    offset = point + normal * jnp.float32(meta.shadow_eps)
    return Hit(hit=hit, t=t, normal=normal, mat=mat, point=point, offset=offset)


def _mat_lookup(mat_ids, *tables):
    """Row-lookup of per-material columns via a fused static select chain.

    Separate XLA gathers from the tiny (M, ·) material tables measured
    ~10 ms per 1M rays for the shading set; M where-selects over the
    packed (M, K) rows fuse into one elementwise pass (~2 ms) and
    reproduce the gathered values bitwise (pinned by the golden parity
    suite and test_tiling.py).  Do NOT replace with a one-hot (R,M)@(M,K)
    dot: it is equally fast on the MXU but its presence perturbs XLA's
    fusion of the surrounding shading math and broke bitwise brute==bvh
    engine equivalence.  Returns one (R, k_i) array per input table."""
    mat_ids = jax.lax.stop_gradient(mat_ids)
    cols = [t[:, None] if t.ndim == 1 else t for t in tables]
    widths = [c.shape[1] for c in cols]
    packed = jnp.concatenate([c.astype(jnp.float32) for c in cols], axis=1)
    m = packed.shape[0]
    # static select chain instead of a dot: an (R,M)@(M,K) one-hot dot is
    # equally fast on the MXU, but the dot's presence perturbs XLA's
    # fusion of the surrounding shading math enough to break bitwise
    # brute==bvh equivalence; M selects fuse stably and exactly.
    g = jnp.broadcast_to(packed[0][None, :], (mat_ids.shape[0],
                                              packed.shape[1]))
    for mi in range(1, m):
        g = jnp.where((mat_ids == mi)[:, None], packed[mi][None, :], g)
    out = []
    s = 0
    for t, w in zip(tables, widths):
        piece = g[:, s : s + w]
        if t.ndim == 1:
            piece = piece[:, 0]
        out.append(piece)
        s += w
    return out


def shade_local(
    data: SceneData,
    meta: SceneMeta,
    dirs,
    h: Hit,
    occluded_fn: Callable,
    shadow_fn: Callable | None = None,
    shadow_multi_fn: Callable | None = None,
):
    """Ambient + per-light diffuse/specular for the current wavefront.

    occluded_fn(org, sdir, t_max, mask) -> (R,) bool runs the shadow
    any-hit; `mask` marks the lanes whose result is consumed (engines may
    return garbage on unmasked lanes).
    shadow_fn(org, sdir, mask, light_index) -> (R,) bool, when given,
    replaces occluded_fn with a per-light specialized occlusion engine
    (the cluster engine's fixed-endpoint plane kernel).
    shadow_multi_fn(org, masks (R, L)) -> (R, L) bool, when given, takes
    precedence over both: ALL lights' occlusions in one kernel launch
    (cluster_shadow_multi — shares the per-call fixed cost).
    Returns (R, 3) local radiance (zero on miss lanes).
    """
    nl = meta.n_lights
    if nl == 0:
        amb = data.mat_ambient[h.mat] * data.ambient_light[None, :]
        return jnp.where(h.hit[:, None], amb, 0.0)
    ambient, diffuse, specular, phong = _mat_lookup(
        h.mat, data.mat_ambient, data.mat_diffuse, data.mat_specular,
        data.mat_phong,
    )
    amb = ambient * data.ambient_light[None, :]
    color = jnp.where(h.hit[:, None], amb, 0.0)
    r = dirs.shape[0]

    d_unit = normalize(dirs)
    n_unit = normalize(h.normal)  # already unit; matches :414's re-normalize

    # All lights at once: ONE batched shadow wavefront of nl*r rays
    # (light-major so each light's segment keeps the rays' tile coherence),
    # then shading vectorized over the light axis.  Light count is static.
    lp = data.light_pos[:nl]          # (L, 3)
    lint = data.light_int[:nl]        # (L, 3)
    to_off = lp[None, :, :] - h.offset[:, None, :]          # (R, L, 3)
    light_dist = jnp.linalg.norm(to_off, axis=-1)           # (R, L)
    sdir = to_off / light_dist[..., None]
    sdir_real = normalize(lp[None, :, :] - h.point[:, None, :])

    cos_theta = dot(sdir_real, h.normal[:, None, :])        # (R, L)

    # a light strictly behind the surface contributes NOTHING (see
    # RELEVANT_COS above) — skip its shadow ray entirely.  The reference
    # traces it anyway (raytracer.cpp:399-425) but the result cannot
    # differ.
    relevant = cos_theta >= RELEVANT_COS                     # (R, L)

    # Occlusion is tested on the UNNORMALIZED segment d = light - origin
    # with t_max = 1: mathematically identical to the reference's
    # normalized-direction t < dist test (raytracer.cpp:399-405), but the
    # tile shortlist's direction interval becomes exactly light - o_box,
    # preserving the origin<->direction correlation that normalization
    # destroys (~2x tighter shadow candidate lists).
    # (A light-side reversal of the segment was measured and REJECTED:
    # segment occlusion is symmetric, but the changed rounding flips a
    # band of grazing-occluder pixels near wall corners — cornellbox MSE
    # vs golden 4 -> 22 — so the reference's surface-side origin stays.)
    if shadow_multi_fn is not None:
        occ2 = shadow_multi_fn(h.offset, h.hit[:, None] & relevant)
    elif shadow_fn is not None:
        occ2 = jnp.stack([
            shadow_fn(h.offset, to_off[:, l], h.hit & relevant[:, l], l)
            for l in range(nl)
        ], axis=1)                                           # (R, L)
    else:
        org_flat = jnp.broadcast_to(h.offset[:, None, :], (r, nl, 3))
        occ = occluded_fn(
            org_flat.transpose(1, 0, 2).reshape(nl * r, 3),
            to_off.transpose(1, 0, 2).reshape(nl * r, 3),
            jnp.ones((nl * r,), jnp.float32),
            (h.hit[:, None] & relevant).T.reshape(nl * r),
        )
        occ2 = occ.reshape(nl, r).T
    lit = h.hit[:, None] & relevant & ~occ2                  # (R, L)
    irr = lint[None] / (light_dist * light_dist)[..., None]  # (R, L, 3)

    # specular gate: acos in degrees with the reference's 3.1415
    theta_deg = jax.lax.stop_gradient(jnp.arccos(cos_theta) * RAD_TO_DEG)
    gate = theta_deg <= SPEC_GATE_DEG  # NaN (cos>1) → False, like C acos
    cos_h = jnp.maximum(
        0.0, dot(n_unit[:, None, :], normalize(sdir - d_unit[:, None, :]))
    )
    spec = specular[:, None] * jnp.power(cos_h, phong[:, None])[..., None] * irr
    diff = diffuse[:, None] * jnp.clip(cos_theta, 0.0, 1.0)[..., None] * irr
    contrib = diff + jnp.where(gate[..., None], spec, 0.0)
    color = color + jnp.where(lit[..., None], contrib, 0.0).sum(axis=1)
    return color


def reflection_rays(data: SceneData, dirs, h: Hit):
    """Mirror bounce: new (origin, dir, tint, active) for the wavefront."""
    d_unit = normalize(dirs)
    n_unit = normalize(h.normal)
    cos_r = -dot(d_unit, n_unit)
    refl_dir = d_unit + n_unit * (2.0 * cos_r)[:, None]
    tint, is_mirror_f = _mat_lookup(
        h.mat, data.mat_mirror, data.mat_is_mirror.astype(jnp.float32)
    )
    is_mirror = (is_mirror_f > 0.5) & h.hit
    return h.offset, refl_dir, tint, is_mirror
