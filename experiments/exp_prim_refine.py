"""Estimate: per (tile, shortlisted cluster), how often do ALL 128 prim
AABBs miss the tile's ray-interval cone (cluster AABB hit but no prim box
hit)?  That fraction of dense kernel visits is skippable by an in-kernel
prim-box pre-test (~60 ops on (1,128) vs 32k*45 dense).  CPU, numpy/jnp,
subset of tiles."""
import sys, os, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters, CLUSTER
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.ops.camera import eye_rays
from raytracer_tpu.ops.cluster_trace import TILE, tile_cluster_mask, _pad_rays
from raytracer_tpu.ops.tiling import block_permutation
from raytracer_tpu.ops.shade import normalize
from raytracer_tpu.ops.traverse import bvh_closest
from raytracer_tpu.ops.shade import refine_hit

SSAA = int(sys.argv[1]) if len(sys.argv) > 1 else 1
data, meta = load_scene("/root/reference/inputs/horse_and_mug.xml")
data = jax.tree.map(jnp.asarray, data)
bvh = build_bvh(data, meta)
for treelet in (False, True):
    cset = build_clusters(data, meta, bvh, treelet=treelet)
    import dataclasses
    cam = meta.cameras[0]
    if SSAA > 1:
        cam = cam.scaled(SSAA)
    # center crop rows to keep CPU cost down
    crop = dataclasses.replace(cam, height=160)
    origin, dirs = eye_rays(crop)
    perm, inv = block_permutation(crop.height, crop.width, 16, 16)
    dirs = jnp.asarray(dirs)[jnp.asarray(perm)]
    r = dirs.shape[0]

    h = refine_hit(data, meta, jnp.broadcast_to(jnp.asarray(origin), dirs.shape),
                   dirs, bvh_closest(data, jax.tree.map(jnp.asarray, bvh),
                                     jnp.broadcast_to(jnp.asarray(origin), dirs.shape), dirs))
    lp = data.light_pos[:meta.n_lights]
    # light-0 shadow segment wavefront
    org = h.offset
    sd = lp[0][None, :] - h.offset
    act = h.hit
    rr, o2, d2, a2 = _pad_rays(org, sd, act)
    hit_mask, entry = tile_cluster_mask(o2, d2, a2, jnp.asarray(cset.tri_cmin),
                                        jnp.asarray(cset.tri_cmax), None, TILE)
    hit_mask = np.asarray(hit_mask)
    nt = hit_mask.shape[0]

    # per-tile ray intervals (same math as tile_cluster_mask)
    o3 = np.asarray(o2).reshape(nt, TILE, 3); d3 = np.asarray(d2).reshape(nt, TILE, 3)
    a3 = np.asarray(a2).reshape(nt, TILE)
    big = np.inf
    o_lo = np.where(a3[...,None], o3, big).min(1); o_hi = np.where(a3[...,None], o3, -big).max(1)
    d_lo = np.where(a3[...,None], d3, big).min(1); d_hi = np.where(a3[...,None], d3, -big).max(1)
    none = ~a3.any(1)
    crosses = (d_lo <= 0) & (d_hi >= 0)
    BIG = np.float32(1e18)
    with np.errstate(divide='ignore'):
        i_lo = np.where(crosses, -BIG, 1.0/d_hi); i_hi = np.where(crosses, BIG, 1.0/d_lo)

    # prim boxes per slot
    verts = np.asarray(data.vertices); tv = np.asarray(data.tri_v)
    slot_valid = np.zeros(cset.tri_dat.shape[1], bool)
    # reconstruct boxes from tri_slot (slots map to global tri id; padding -> 0 dup)
    tslot = np.asarray(cset.tri_slot)
    corners = verts[tv[tslot]]
    pmin = corners.min(1); pmax = corners.max(1)
    # find real slots: tri_dat row 0..2 nonzero OR naa nonzero... use n vector nonzero
    nvec = np.asarray(cset.tri_dat[0:3]).T
    real = (np.abs(nvec).sum(1) > 0)
    pmin = np.where(real[:,None], pmin, np.nan); pmax = np.where(real[:,None], pmax, np.nan)

    def interval_mul(alo, ahi, blo, bhi):
        p = np.stack([alo*blo, alo*bhi, ahi*blo, ahi*bhi])
        return np.nanmin(p,0)*0+np.minimum.reduce(p), np.maximum.reduce(p)

    total_visits = 0; skippable = 0
    sample = range(0, nt, max(1, nt//400))
    for ti in sample:
        if none[ti]:
            continue
        cl = np.nonzero(hit_mask[ti])[0]
        for c in cl:
            s = c*CLUSTER
            bmn = pmin[s:s+CLUSTER]; bmx = pmax[s:s+CLUSTER]
            e_lo = np.full(CLUSTER, -np.inf); x_hi = np.full(CLUSTER, np.inf)
            ok = np.ones(CLUSTER, bool)
            for ax in range(3):
                n1l = bmn[:,ax]-o_hi[ti,ax]; n1h = bmn[:,ax]-o_lo[ti,ax]
                n2l = bmx[:,ax]-o_hi[ti,ax]; n2h = bmx[:,ax]-o_lo[ti,ax]
                il, ih = i_lo[ti,ax], i_hi[ti,ax]
                t1l, t1h = interval_mul(n1l,n1h,np.full_like(n1l,il),np.full_like(n1l,ih))
                t2l, t2h = interval_mul(n2l,n2h,np.full_like(n2l,il),np.full_like(n2l,ih))
                e_lo = np.maximum(e_lo, np.minimum(t1l,t2l))
                x_hi = np.minimum(x_hi, np.maximum(t1h,t2h))
            surv = (e_lo <= x_hi) & (x_hi >= 0) & (e_lo <= 1.0)
            surv &= ~np.isnan(bmn[:,0])
            total_visits += 1
            if not surv.any():
                skippable += 1
    print(json.dumps({"ssaa": SSAA, "treelet": treelet,
                      "sampled_visits": total_visits,
                      "skippable_frac": round(skippable/max(total_visits,1), 4)}),
          flush=True)
