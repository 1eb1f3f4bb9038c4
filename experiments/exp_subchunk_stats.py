"""Sub-512-column hierarchical mask gate: measure BEFORE building.

VERDICT round-4 item 1 names a SUPER=64 (or 32) coarse gate for the
bundled scenes (all cpad <= 512, so today's hierarchy — which engages
only above _SUPER_MIN_CPAD — never fires for them; the full flat mask
runs every wave).  Round 3 measured (exp_rowskip_stats.py) that at
128-lane-ROW granularity the skip opportunity on horse is ~0.2%, so the
question is whether FINER chunks (64/32 clusters) expose real emptiness.

This measures, per wave and per chunk size g in {128, 64, 32}:
  - exact_empty_frac: fraction of (tile, g-chunk) pairs whose EXACT
    per-ray shortlist has zero candidates — the unreachable upper bound
    of ANY sound coarse gate at that granularity.
  - coarse_skip_frac: fraction a real supercluster gate would skip —
    per-tile exact slab test against the dilated union box of each
    g-chunk (the same test _ray_mask_kernel_hier's gate uses).
  - mask_saving_bound: coarse_skip_frac minus the coarse pass's own
    relative pair-work (S/cpad): the net fraction of mask pair work a
    g-granularity gate could remove, BEFORE any Mosaic lane-alignment
    tax (sub-128 chunks cannot even be stored/sliced at lane granularity,
    so the realizable saving is at most this bound).

Run on TPU:  python experiments/exp_subchunk_stats.py
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
from raytracer_tpu.ops.shade import reflection_rays, Hit
from raytracer_tpu.ops.tiling import block_permutation

GRANS = (128, 64, 32)


def chunk_stats(scene, name, origin, dirs, active, cmin, cmax, t_hi=None):
    r, origin, dirs, active, t_hi = _pad_rays(origin, dirs, active, t_hi)
    he, _ = ray_cluster_mask(origin, dirs, active, cmin, cmax, t_hi, TILE)
    he = np.asarray(he)
    nt, c = he.shape
    cpad = -(-c // 128) * 128
    hep = np.pad(he, ((0, 0), (0, cpad - c)))
    # only tiles with ANY active ray pay mask pair work today (the
    # scalar-prefetch act guard skips the rest): restrict all stats to
    # them, so the numbers are the INCREMENTAL opportunity
    if active is None:
        live = np.ones((nt,), bool)
    else:
        live = np.asarray(active).reshape(nt, TILE).any(1)
    hep = hep[live]
    nlive = int(live.sum())
    # numpy union boxes per chunk (pad with +/-inf so empty padding
    # chunks produce inverted boxes that never hit)
    cmin_np = np.asarray(cmin); cmax_np = np.asarray(cmax)
    cmin_p = np.concatenate(
        [cmin_np, np.full((cpad - c, 3), np.inf, np.float32)])
    cmax_p = np.concatenate(
        [cmax_np, np.full((cpad - c, 3), -np.inf, np.float32)])
    out = {"scene": scene, "wave": name, "cpad": int(cpad), "c": int(c),
           "ntiles": int(nt), "live_tiles": nlive}
    for g in GRANS:
        s = cpad // g
        # upper bound: exact emptiness per (live tile, chunk)
        empty = ~hep.reshape(nlive, s, g).any(2)
        smin = cmin_p.reshape(s, g, 3).min(1)
        smax = cmax_p.reshape(s, g, 3).max(1)
        eps = 1e-5
        with np.errstate(invalid="ignore"):
            smin = smin - (eps * np.abs(smin) + 1e-30)
            smax = smax + (eps * np.abs(smax) + 1e-30)
        sh, _ = ray_cluster_mask(origin, dirs, active,
                                 jnp.asarray(smin), jnp.asarray(smax),
                                 t_hi, TILE)
        sh = np.asarray(sh)[live]
        coarse_skip = float((~sh).mean())
        out[f"g{g}"] = {
            "exact_empty_frac": round(float(empty.mean()), 4),
            "coarse_skip_frac": round(coarse_skip, 4),
            "mask_saving_bound": round(coarse_skip - s / cpad, 4),
        }
    print(json.dumps(out), flush=True)


def run_scene(path):
    scene = os.path.basename(path).replace(".xml", "")
    data, meta = load_scene(path)
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

    chunk_stats(scene, "c0_eye", jnp.broadcast_to(origin0[None], dirs.shape),
                dirs, None, cset.tri_cmin, cset.tri_cmax)
    chunk_stats(scene, "c1", ro1, rd1, is_m1, cset.tri_cmin, cset.tri_cmax)
    chunk_stats(scene, "c2", ro2, rd2, is_m2, cset.tri_cmin, cset.tri_cmax)
    chunk_stats(scene, "sh0_l0", off0, lp0[None] - off0, fhit0,
                cset.tri_cmin, cset.tri_cmax, t_hi=ones)
    chunk_stats(scene, "sh1_l0", off1, lp0[None] - off1, fhit1 & is_m1,
                cset.tri_cmin, cset.tri_cmax, t_hi=ones)


for p in ("/root/reference/inputs/horse_and_mug.xml",
          "/root/reference/inputs/dragon_lowres.xml",
          "/root/reference/inputs/car.xml",
          "/root/reference/inputs/low_poly.xml"):
    run_scene(p)
