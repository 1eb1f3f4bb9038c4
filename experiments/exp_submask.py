"""Subtile-granularity interval masks vs the exact per-ray mask.

The exact mask is pair-work bound (~19 VPU ops x R x Cpad, ~8 ms/call
full-active, ROADMAP) and runs 8x/frame.  The interval mask evaluates
ONE slab test per (group, cluster) — 128x fewer pairs at tile
granularity but 2.7-7x looser on divergent waves (exp_exact_mask).
Open question: does a FINE-grained interval (groups of 8-32 rays via
tile_cluster_mask's subsplit) approach exact tightness while paying
~subsplit/128 of the exact pair count (x ~3.7 ops/pair interval
overhead)?  If visits stay within ~1.15x exact while the mask cost
drops >2x, the shortlist stage can switch granularity.

Measures, on horse_and_mug's real waves (c1/c2 reflection bounces,
sh0/sh1 shadow segments): per-tile visit counts for exact and
subsplit in {1, 4, 8, 16}, and the wall cost of each mask form at
1.04M rays on the device.
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
    cluster_closest_hit, tile_cluster_mask, ray_cluster_mask, _pad_rays,
)
from raytracer_tpu.ops.shade import reflection_rays, Hit
from raytracer_tpu.ops.tiling import block_permutation

TILE = 128
SPLITS = (1, 4, 8, 16)


def stats(name, origin, dirs, active, cmin, cmax, t_hi=None):
    r, origin, dirs, active, t_hi = _pad_rays(origin, dirs, active, t_hi)
    th = None if t_hi is None else t_hi
    he, _ = ray_cluster_mask(origin, dirs, active, cmin, cmax, th, TILE)
    ce = np.asarray(he.sum(1))
    row = {"wave": name, "exact_visits": int(ce.sum()),
           "exact_mean": round(float(ce.mean()), 2)}
    for s in SPLITS:
        hi, _ = tile_cluster_mask(origin, dirs, active, cmin, cmax, th,
                                  TILE, subsplit=s)
        ci = np.asarray(hi.sum(1))
        # soundness: interval must be a superset of exact
        assert not np.any(np.asarray(he) & ~np.asarray(hi)), (name, s)
        row[f"s{s}_visits"] = int(ci.sum())
        row[f"s{s}_ratio"] = round(float(ci.sum()) / max(float(ce.sum()), 1), 2)
    print(json.dumps(row), flush=True)


def timeit(fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    n = 8
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    s = float(jnp.sum(out[1]))  # scalar-reduction sync (tunnel-safe)
    dt = (time.perf_counter() - t0) / n
    return dt * 1e3, s


def main():
    data, meta = load_scene("/root/reference/inputs/horse_and_mug.xml")
    bvh = build_bvh(data, meta)
    cset = jax.device_put(build_clusters(data, meta, bvh))
    data = jax.device_put(data)
    cam = meta.cameras[0]
    origin, dirs = eye_rays_band(jnp.asarray(camera_vectors(cam)),
                                 cam.width, cam.height, jnp.float32(0),
                                 cam.height)
    perm, inv = block_permutation(cam.height, cam.width, 8, 16)
    dirs = jnp.asarray(dirs)[jnp.asarray(perm)]
    origin0 = jnp.asarray(origin, jnp.float32)
    eps = meta.shadow_eps

    fhit0, t0_, n0, m0, p0, off0, prim0 = jax.jit(
        lambda d: cluster_closest_hit(cset, origin0, d, eps,
                                      shared_origin=True))(dirs)
    hh0 = Hit(hit=fhit0, t=t0_, normal=n0, mat=m0, point=p0, offset=off0)
    ro1, rd1, _, is_m1 = jax.jit(lambda d: reflection_rays(data, d, hh0))(dirs)

    fhit1, t1_, n1, m1, p1, off1, prim1 = jax.jit(
        lambda o, d: cluster_closest_hit(cset, o, d, eps, active=is_m1)
    )(ro1, rd1)
    hh1 = Hit(hit=fhit1 & is_m1, t=t1_, normal=n1, mat=m1, point=p1,
              offset=off1)
    ro2, rd2, _, is_m2raw = jax.jit(
        lambda d: reflection_rays(data, d, hh1))(rd1)
    is_m2 = is_m2raw & is_m1

    lp0 = jnp.asarray(data.light_pos[0])
    ones = jnp.ones((dirs.shape[0],), jnp.float32)

    stats("c1", ro1, rd1, is_m1, cset.tri_cmin, cset.tri_cmax)
    stats("c2", ro2, rd2, is_m2, cset.tri_cmin, cset.tri_cmax)
    stats("sh0_l0", off0, lp0[None] - off0, fhit0,
          cset.tri_cmin, cset.tri_cmax, t_hi=ones)
    stats("sh1_l0", off1, lp0[None] - off1, fhit1 & is_m1,
          cset.tri_cmin, cset.tri_cmax, t_hi=ones)

    # mask wall cost at 1.04M rays, near-full-active wave (sh0 segments)
    r, o_p, d_p, a_p, th_p = _pad_rays(off0, lp0[None] - off0, fhit0, ones)
    f_exa = jax.jit(lambda o, d, a, th: ray_cluster_mask(
        o, d, a, cset.tri_cmin, cset.tri_cmax, th, TILE))
    ms_e, _ = timeit(f_exa, o_p, d_p, a_p, th_p)
    costs = {"exact_pallas": round(ms_e, 2)}
    for s in SPLITS:
        f_int = jax.jit(lambda o, d, a, th, s=s: tile_cluster_mask(
            o, d, a, cset.tri_cmin, cset.tri_cmax, th, TILE, subsplit=s))
        ms_i, _ = timeit(f_int, o_p, d_p, a_p, th_p)
        costs[f"s{s}"] = round(ms_i, 2)
    print(json.dumps({"mask_cost_ms_full_active": costs}), flush=True)


main()
