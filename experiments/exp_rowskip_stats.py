"""Upper bound for per-row lane-block skipping inside the mask kernel.

The mask kernel computes (TILE rays x Cpad clusters) pairs per subtile;
Cpad=256 for horse = 2 lane rows of 128.  An in-kernel interval
prefilter could skip a whole row when the tile's interval union misses
all 128 of its clusters.  This measures, per wave, the fraction of
(tile, row) halves with (a) zero INTERVAL candidates (what the
prefilter would actually skip) and (b) zero EXACT candidates (the
unreachable upper bound).
"""
import sys, os, json
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
    TILE,
)
from raytracer_tpu.ops.shade import reflection_rays, Hit
from raytracer_tpu.ops.tiling import block_permutation


def stats(name, origin, dirs, active, cmin, cmax, t_hi=None):
    r, origin, dirs, active, t_hi = _pad_rays(origin, dirs, active, t_hi)
    he, _ = ray_cluster_mask(origin, dirs, active, cmin, cmax, t_hi, TILE)
    hi, _ = tile_cluster_mask(origin, dirs, active, cmin, cmax, t_hi, TILE)
    he = np.asarray(he); hi = np.asarray(hi)
    nt, c = he.shape
    cpad = -(-c // 128) * 128
    he = np.pad(he, ((0, 0), (0, cpad - c)))
    hi = np.pad(hi, ((0, 0), (0, cpad - c)))
    rows = cpad // 128
    he_r = he.reshape(nt, rows, 128).any(2)
    hi_r = hi.reshape(nt, rows, 128).any(2)
    print(json.dumps({
        "wave": name, "rows": rows,
        "interval_row_skip_frac": round(float((~hi_r).mean()), 3),
        "exact_row_skip_frac": round(float((~he_r).mean()), 3),
        "tile_fully_skippable_frac": round(float((~hi_r).all(1).mean()), 3),
    }), flush=True)


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


main()
