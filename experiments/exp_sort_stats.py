"""Pair-work statistics for the BOUNCE-1 wavefronts (closest + shadow)
under ray reorderings, TILE=128.  Shortlist-only (no kernel timing).

Orderings of the mirror wavefront:
  none     — pixel-tile order (production today)
  slot     — sort by bounce-0 hit SLOT (preorder position = space-filling
             surface order); inactive lanes to the back
  cluster  — sort by bounce-0 hit cluster id (coarser key)
Also: treelet cluster set x {none, slot}, and subsplit=2 on `none`.
"""
import sys, os, json
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


def stats(origin, dirs, active, cmin, cmax, t_hi=None):
    r, origin, dirs, active, t_hi = _pad_rays(origin, dirs, active, t_hi)
    hit, entry = tile_cluster_mask(origin, dirs, active, cmin, cmax,
                                   None if t_hi is None else t_hi, TILE)
    counts = np.asarray(hit.sum(1))
    return {
        "visits": int(counts.sum()),
        "mean_cand": round(float(counts.mean()), 2),
        "gpairs": round(counts.sum() * TILE * CLUSTER / 1e9, 3),
    }


def main():
    data, meta = load_scene("/root/reference/inputs/horse_and_mug.xml")
    bvh = build_bvh(data, meta)
    csets = {
        "run": jax.device_put(build_clusters(data, meta, bvh)),
        "treelet": jax.device_put(build_clusters(data, meta, bvh,
                                                 treelet=True)),
    }
    data = jax.device_put(data)
    cam = meta.cameras[0]
    origin, dirs = eye_rays_band(jnp.asarray(camera_vectors(cam)),
                                 cam.width, cam.height, jnp.float32(0),
                                 cam.height)
    perm, inv = block_permutation(cam.height, cam.width, 8, 16)
    dirs = jnp.asarray(dirs)[jnp.asarray(perm)]
    origin0 = jnp.asarray(origin, jnp.float32)
    eps = meta.shadow_eps
    cset = csets["run"]

    fhit0, t0_, n0, m0, p0, off0, prim0 = jax.jit(
        lambda d: cluster_closest_hit(cset, origin0, d, eps,
                                      shared_origin=True))(dirs)
    hh0 = Hit(hit=fhit0, t=t0_, normal=n0, mat=m0, point=p0, offset=off0)
    ro, rd, tint, is_m = jax.jit(
        lambda d: reflection_rays(data, d, hh0))(dirs)

    # need the winning SLOT for sort keys: recompute via the call that
    # returns slots — use prim0 (global id) as a proxy key: for tris it's
    # the global tri id in BVH-preorder cluster layout?  prim ids are
    # original file order — NOT spatial.  Instead reconstruct slot order
    # key from the cluster set's slot map: invert tri_slot/sph_slot.
    nslot = cset.slot_pack.shape[0]
    slot_of_prim = np.zeros((int(np.asarray(data.tri_v).shape[0])
                             + int(np.asarray(data.sphere_cvid).shape[0]),),
                            np.int64)
    ts = np.asarray(cset.tri_slot); ss = np.asarray(cset.sph_slot)
    pt = cset.tri_dat.shape[1]
    slot_of_prim[ts] = np.arange(ts.shape[0])
    slot_of_prim[ss] = pt + np.arange(ss.shape[0])
    pr = np.asarray(prim0)
    key = np.where(np.asarray(is_m), slot_of_prim[np.clip(pr, 0, None)],
                   np.iinfo(np.int64).max)

    orders = {
        "none": np.arange(key.shape[0]),
        "slot": np.argsort(key, kind="stable"),
        "cluster": np.argsort(key // CLUSTER, kind="stable"),
    }

    for cname, cs in csets.items():
        for oname, idx in orders.items():
            if cname == "treelet" and oname == "cluster":
                continue
            o = jnp.asarray(np.asarray(ro)[idx])
            d = jnp.asarray(np.asarray(rd)[idx])
            a = jnp.asarray(np.asarray(is_m)[idx])
            s = stats(o, d, a, cs.tri_cmin, cs.tri_cmax)
            print(json.dumps({"wave": "c1", "cset": cname, "order": oname,
                              **s}), flush=True)

    # bounce-1 shadow wave: hit points of the mirror wavefront
    fhit1, t1_, n1, m1, p1, off1, prim1 = jax.jit(
        lambda o, d: cluster_closest_hit(cset, o, d, eps, active=is_m)
    )(ro, rd)
    act_sh = np.asarray(fhit1) & np.asarray(is_m)
    pr1 = np.asarray(prim1)
    key1 = np.where(act_sh, slot_of_prim[np.clip(pr1, 0, None)],
                    np.iinfo(np.int64).max)
    orders1 = {
        "none": np.arange(key1.shape[0]),
        "slot": np.argsort(key1, kind="stable"),
    }
    lp0 = np.asarray(data.light_pos[0])
    for cname, cs in csets.items():
        for oname, idx in orders1.items():
            o = jnp.asarray(np.asarray(off1)[idx])
            sd = jnp.asarray(lp0[None] - np.asarray(off1)[idx])
            a = jnp.asarray(act_sh[idx])
            ones = jnp.ones((o.shape[0],), jnp.float32)
            s = stats(o, sd, a, cs.tri_cmin, cs.tri_cmax, t_hi=ones)
            print(json.dumps({"wave": "sh1_l0", "cset": cname,
                              "order": oname, **s}), flush=True)


main()
