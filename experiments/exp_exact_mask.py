"""EXACT per-ray slab shortlist vs the interval-arithmetic tile mask.

Round-2's record pins the c2 floor on interval saturation: 6% of tiles
carry ~190 candidates (95% of c2 work) while the per-ray mean is 4.8.
The interval test bounds the tile's origin/direction SETS independently,
losing the per-ray (o, d) correlation entirely.  This experiment computes
the EXACT per-ray slab test against every cluster box and ORs it over the
tile — still sound for the per-tile kernel (a ray can only hit a
primitive inside a box it crosses), strictly tighter than intervals —
and measures (a) candidate-count/visit stats per wave, (b) the wall cost
of the exact mask itself.
"""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from raytracer_tpu.utils.compile_cache import enable
enable()
from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters, CLUSTER
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.ops.camera import camera_vectors, eye_rays_band
from raytracer_tpu.ops.cluster_trace import (
    cluster_closest_hit, tile_cluster_mask, _pad_rays,
)
from raytracer_tpu.ops.shade import reflection_rays, Hit
from raytracer_tpu.ops.tiling import block_permutation

TILE = 128


def exact_tile_mask(origin, dirs, active, cmin, cmax, t_hi, tile):
    """Exact per-ray slab test vs every cluster box, OR-reduced per tile.
    Returns (hit (nt, C) bool, entry (nt, C) f32 = min ray entry)."""
    r = dirs.shape[0]
    nt = r // tile
    o = origin.reshape(nt, tile, 1, 3)
    d = dirs.reshape(nt, tile, 1, 3)
    inv = 1.0 / d
    t1 = (cmin[None, None] - o) * inv
    t2 = (cmax[None, None] - o) * inv
    near = jnp.minimum(t1, t2)
    far = jnp.maximum(t1, t2)
    near = jnp.where(jnp.isnan(near), -jnp.inf, near)
    far = jnp.where(jnp.isnan(far), jnp.inf, far)
    entry = near.max(-1)          # (nt, tile, C)
    exit_ = far.min(-1)
    hit = (entry <= exit_) & (exit_ >= 0.0)
    if t_hi is not None:
        hit &= entry <= t_hi.reshape(nt, tile, 1)
    if active is not None:
        hit &= active.reshape(nt, tile, 1)
    e = jnp.where(hit, entry, jnp.inf).min(1)
    return hit.any(1), e


def stats(name, origin, dirs, active, cmin, cmax, t_hi=None):
    r, origin, dirs, active, t_hi = _pad_rays(origin, dirs, active, t_hi)
    hit_i, _ = tile_cluster_mask(origin, dirs, active, cmin, cmax,
                                 None if t_hi is None else t_hi, TILE)
    hit_e, _ = exact_tile_mask(origin, dirs, active, cmin, cmax,
                               None if t_hi is None else t_hi, TILE)
    ci = np.asarray(hit_i.sum(1)); ce = np.asarray(hit_e.sum(1))
    print(json.dumps({
        "wave": name,
        "interval_visits": int(ci.sum()), "exact_visits": int(ce.sum()),
        "ratio": round(float(ci.sum()) / max(float(ce.sum()), 1), 2),
        "interval_mean": round(float(ci.mean()), 2),
        "exact_mean": round(float(ce.mean()), 2),
        "interval_p99": int(np.percentile(ci, 99)),
        "exact_p99": int(np.percentile(ce, 99)),
    }), flush=True)


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

    # bounce 0
    fhit0, t0_, n0, m0, p0, off0, prim0 = jax.jit(
        lambda d: cluster_closest_hit(cset, origin0, d, eps,
                                      shared_origin=True))(dirs)
    hh0 = Hit(hit=fhit0, t=t0_, normal=n0, mat=m0, point=p0, offset=off0)
    ro1, rd1, _, is_m1 = jax.jit(lambda d: reflection_rays(data, d, hh0))(dirs)

    # bounce 1
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

    # cost of the masks themselves (jit'd, 1.04M rays, 247+ clusters)
    r, o_p, d_p, a_p = _pad_rays(ro2, rd2, is_m2)
    f_int = jax.jit(lambda o, d, a: tile_cluster_mask(
        o, d, a, cset.tri_cmin, cset.tri_cmax, None, TILE))
    f_exa = jax.jit(lambda o, d, a: exact_tile_mask(
        o, d, a, cset.tri_cmin, cset.tri_cmax, None, TILE))
    ms_i, _ = timeit(f_int, o_p, d_p, a_p)
    ms_e, _ = timeit(f_exa, o_p, d_p, a_p)
    print(json.dumps({"mask_cost_ms": {"interval": round(ms_i, 2),
                                       "exact": round(ms_e, 2)}}), flush=True)


main()
