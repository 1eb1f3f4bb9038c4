"""Reversed-interval shadow shortlists: shadow segments per light all
converge AT THE LIGHT, so parametrizing them from the light makes the
wave shared-origin — the case where the per-tile interval mask is
near-tight and ~128x cheaper than the per-ray exact mask (8 ms/call).
Any-hit occlusion is an order-independent boolean OR over the listed
clusters, so ANY sound superset shortlist yields a bitwise-identical
image; only the visit count (kernel pair work) changes.

Measures, for horse_and_mug's sh0/sh1/sh2 waves x 2 lights:
  visits(forward exact)  vs  visits(forward interval)  vs
  visits(reversed interval)  — and the mask's own wall cost.
"""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from raytracer_tpu.utils.compile_cache import enable
enable()
from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.ops.camera import camera_vectors, eye_rays_band
from raytracer_tpu.ops.cluster_trace import (
    cluster_closest_hit, ray_cluster_mask, tile_cluster_mask, _pad_rays,
    TILE,
)
from raytracer_tpu.ops.shade import reflection_rays, Hit
from raytracer_tpu.ops.tiling import block_permutation


def reversed_interval(origin, dirs, active, cmin, cmax, lp):
    """Interval mask of the REVERSED segments (origin at the light)."""
    o_r = jnp.broadcast_to(lp[None], origin.shape)
    d_r = origin - lp[None]          # light -> offset point; t in [0, 1]
    ones = jnp.ones((origin.shape[0],), jnp.float32)
    hit, ent = tile_cluster_mask(o_r, d_r, active, cmin, cmax, ones, TILE)
    return hit, ent


def stats(name, origin, dirs, active, cmin, cmax, lp):
    r, origin, dirs, active = _pad_rays(origin, dirs, active)
    ones = jnp.ones((origin.shape[0],), jnp.float32)
    h_fe, _ = ray_cluster_mask(origin, dirs, active, cmin, cmax, ones, TILE)
    h_fi, _ = tile_cluster_mask(origin, dirs, active, cmin, cmax, ones, TILE)
    h_ri, _ = reversed_interval(origin, dirs, active, cmin, cmax, lp)
    ce = np.asarray(h_fe.sum(1))
    ci = np.asarray(h_fi.sum(1))
    cr = np.asarray(h_ri.sum(1))
    missing = int(np.asarray((h_fe & ~h_ri).sum()))  # exact-listed, reversed-missed
    print(json.dumps({
        "wave": name,
        "exact_visits": int(ce.sum()),
        "fwd_interval_visits": int(ci.sum()),
        "rev_interval_visits": int(cr.sum()),
        "rev_over_exact": round(float(cr.sum()) / max(float(ce.sum()), 1), 2),
        "exact_minus_rev": missing,
        "rev_p99": int(np.percentile(cr, 99)),
        "exact_p99": int(np.percentile(ce, 99)),
    }), flush=True)


def scan_time(fn, o, d, iters=16, blocks=3):
    @jax.jit
    def many(o, d):
        def step(acc, i):
            out = fn(o, d + i * 1e-7)
            return acc + jnp.sum(out[0].astype(jnp.float32)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0),
                              jnp.arange(1, iters + 1, dtype=jnp.float32))
        return acc
    float(many(o, d))
    best = np.inf
    for _ in range(blocks):
        t0 = time.perf_counter()
        float(many(o, d))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    data, meta = load_scene("/root/reference/inputs/horse_and_mug.xml")
    bvh = build_bvh(data, meta)
    cset = jax.device_put(build_clusters(data, meta, bvh))
    data = jax.device_put(data)
    cam = meta.cameras[0]
    origin, dirs = eye_rays_band(jnp.asarray(camera_vectors(cam)),
                                 cam.width, cam.height, jnp.float32(0),
                                 cam.height)
    perm, _ = block_permutation(cam.height, cam.width, 8, 16)
    dirs = jnp.asarray(dirs)[jnp.asarray(perm)]
    origin0 = jnp.asarray(origin, jnp.float32)
    eps = meta.shadow_eps
    lps = [data.light_pos[0], data.light_pos[1]]

    h0 = jax.jit(lambda d: cluster_closest_hit(
        cset, origin0, d, eps, shared_origin=True))(dirs)
    hh0 = Hit(hit=h0[0], t=h0[1], normal=h0[2], mat=h0[3], point=h0[4],
              offset=h0[5])
    off0 = h0[5]
    ro, rd, tint, is_m = jax.jit(
        lambda d: reflection_rays(data, d, hh0))(dirs)
    h1 = jax.jit(lambda o, d: cluster_closest_hit(cset, o, d, eps,
                                                  active=is_m))(ro, rd)
    a1 = h1[0] & is_m
    off1 = h1[5]

    cmin, cmax = cset.tri_cmin, cset.tri_cmax
    for l, lp in enumerate(lps):
        sd0 = lp[None] - off0
        stats(f"sh0_l{l}", off0, sd0, h0[0], cmin, cmax, lp)
        sd1 = lp[None] - off1
        stats(f"sh1_l{l}", off1, sd1, a1, cmin, cmax, lp)

    # wall cost of each mask form on the sh0 wave (full occupancy)
    lp = lps[0]
    r, op, dp, ap = _pad_rays(off0, lp[None] - off0, h0[0])
    ones = jnp.ones((op.shape[0],), jnp.float32)
    ms_e = scan_time(lambda o, d: ray_cluster_mask(
        o, d, ap, cmin, cmax, ones, TILE), op, dp)
    ms_r = scan_time(lambda o, d: reversed_interval(
        o, d, ap, cmin, cmax, lp), op, dp)
    print(json.dumps({"mask_ms_exact": round(ms_e, 3),
                      "mask_ms_rev_interval": round(ms_r, 3)}), flush=True)


main()
