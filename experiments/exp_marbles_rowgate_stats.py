"""How many of marbles' 6 sphere-cluster rows does a live tile actually
need?  (VERDICT round-4 item 2 — occupancy-proportional dense visits.)

The round-4 dense sphere passes visit ALL Ps slots per live tile
because the shortlist WALK machinery cost more than the spared visits.
But the per-(tile, sphere-cluster) exact-mask bitmask words are already
in SMEM (sw_ref) — gating each UNROLLED dense row on its bit is a
static scalar test (~5 cycles) vs a 128-slot row visit (~320 cycles).
The win is bounded by the mean candidate rows per live tile, measured
here per wave.
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
    cluster_closest_hit, ray_cluster_mask, _pad_rays, TILE,
)
from raytracer_tpu.ops.shade import Hit, reflection_rays
from raytracer_tpu.ops.tiling import block_permutation


def stats(name, origin, dirs, active, cmin, cmax, t_hi=None):
    r, origin, dirs, active, t_hi = _pad_rays(origin, dirs, active, t_hi)
    he, _ = ray_cluster_mask(origin, dirs, active, cmin, cmax, t_hi, TILE)
    he = np.asarray(he)
    nt, c = he.shape
    if active is None:
        live = np.ones((nt,), bool)
    else:
        live = np.asarray(active).reshape(nt, TILE).any(1)
    rows_per_live = he[live].sum(1)
    print(json.dumps({
        "wave": name, "sphere_rows": int(c),
        "live_tiles": int(live.sum()), "tiles": int(nt),
        "mean_rows_per_live_tile": round(float(rows_per_live.mean()), 3),
        "p90": int(np.percentile(rows_per_live, 90)),
        "visit_saving_vs_dense": round(
            1.0 - float(rows_per_live.mean()) / c, 3),
    }), flush=True)


data, meta = load_scene("/root/reference/inputs/marbles.xml")
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
hh1 = Hit(hit=fhit1 & is_m1, t=t1_, normal=n1, mat=m1, point=p1, offset=off1)
ro2, rd2, _, is_m2raw = jax.jit(lambda d: reflection_rays(data, d, hh1))(rd1)
is_m2 = is_m2raw & is_m1

ones = jnp.ones((dirs.shape[0],), jnp.float32)
stats("c0_eye", jnp.broadcast_to(origin0[None], dirs.shape), dirs, None,
      cset.sph_cmin, cset.sph_cmax)
stats("c1", ro1, rd1, is_m1, cset.sph_cmin, cset.sph_cmax)
stats("c2", ro2, rd2, is_m2, cset.sph_cmin, cset.sph_cmax)
for li in range(2):
    lp = jnp.asarray(data.light_pos[li])
    stats(f"sh0_l{li}", off0, lp[None] - off0, fhit0,
          cset.sph_cmin, cset.sph_cmax, t_hi=ones)
    stats(f"sh1_l{li}", off1, lp[None] - off1, fhit1 & is_m1,
          cset.sph_cmin, cset.sph_cmax, t_hi=ones)
