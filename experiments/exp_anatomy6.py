"""Round-3 fine anatomy of the non-kernel tail (~26ms of a 115ms frame):
raw kernel (t, slot) vs full hit info (pack gather + small-sphere merge +
point/normal/offset), shade_local, reflection_rays, and the bounce-2
shadow phase.  In-graph scan timing.
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
    build_shadow_planes, cluster_closest_hit, cluster_shadow,
    _cluster_closest_call_shared, _cluster_closest_call, ray_cluster_mask,
    _pad_rays, _empty_shit, TILE,
)
from raytracer_tpu.ops.shade import reflection_rays, shade_local, Hit
from raytracer_tpu.ops.tiling import block_permutation
from raytracer_tpu.models.whitted import render_rays


def scan_wrap(fn, iters):
    @jax.jit
    def many(o, d):
        def step(acc, i):
            out = fn(o, d + i * 1e-7)
            return acc + jnp.sum(out.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(
            step, jnp.float32(0),
            jnp.arange(1, iters + 1, dtype=jnp.float32))
        return acc
    return many, iters


def timeit(pair, o, d, blocks=3):
    fn, iters = pair
    float(fn(o, d))
    best = np.inf
    for _ in range(blocks):
        t0 = time.perf_counter()
        out = fn(o, d)
        float(out)
        best = min(best, time.perf_counter() - t0)
    return best / iters


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
    lps = [data.light_pos[0], data.light_pos[1]]
    planes = [jax.jit(lambda lp=lp: build_shadow_planes(cset, lp))()
              for lp in lps]

    h0 = jax.jit(lambda d: cluster_closest_hit(
        cset, origin0, d, eps, shared_origin=True))(dirs)
    fhit0, t0_, n0, m0, p0, off0, prim0 = h0
    hh0 = Hit(hit=fhit0, t=t0_, normal=n0, mat=m0, point=p0, offset=off0)
    ro, rd, tint, is_m = jax.jit(
        lambda d: reflection_rays(data, d, hh0))(dirs)
    h1 = jax.jit(lambda o, d: cluster_closest_hit(cset, o, d, eps,
                                                  active=is_m))(ro, rd)
    hh1 = Hit(hit=h1[0] & is_m, t=h1[1], normal=h1[2], mat=h1[3],
              point=h1[4], offset=h1[5])
    off1 = jax.block_until_ready(h1[5])
    ro2, rd2, tint2, m2r = jax.jit(
        lambda d: reflection_rays(data, d, hh1))(rd)
    is_m2 = m2r & is_m
    h2 = jax.jit(lambda o, d: cluster_closest_hit(cset, o, d, eps,
                                                  active=is_m2))(ro2, rd2)
    hh2 = Hit(hit=h2[0] & is_m2, t=h2[1], normal=h2[2], mat=h2[3],
              point=h2[4], offset=h2[5])
    off2 = jax.block_until_ready(h2[5])
    a2 = h2[0] & is_m2
    ro2 = jax.block_until_ready(ro2)

    # raw kernel-only bounce-0 closest: mask + kernel, no hit info
    def c0_raw(o, d):
        r, op, dp, ap = _pad_rays(jnp.broadcast_to(origin0, d.shape), d, None)
        thit = ray_cluster_mask(op, dp, ap, cset.tri_cmin, cset.tri_cmax,
                                None, TILE)
        shit = _empty_shit(thit[0].shape[0], cset.sph_cmin.shape[0])
        t, slot = _cluster_closest_call_shared(
            thit, shit, origin0, dp, cset.tri_dat, cset.sph_dat,
            cset.n_tri, cset.n_sph, False)
        return t

    def c0_full(o, d):
        return cluster_closest_hit(cset, origin0, d, eps,
                                   shared_origin=True)[1]

    def refl(o, d):
        return reflection_rays(data, d, hh0)[1]

    def shade0(o, d):
        # shading with a free shadow answer (constant False): isolates the
        # diffuse/specular/ambient math + glue from the shadow kernels
        dd = d

        def shadow_free(org, sdir, mask, l):
            return jnp.zeros((org.shape[0],), bool)

        return shade_local(data, meta, dd, hh0, None, shadow_fn=shadow_free)

    def sh2(o, d):
        tot = jnp.zeros((), jnp.float32)
        for l in range(2):
            sd = lps[l][None] - (o + 0 * d[:, :1])
            occ = cluster_shadow(cset, planes[l], o + 0 * d[:, :1], sd,
                                 lps[l], active=a2)
            tot += jnp.sum(occ.astype(jnp.float32))
        return tot

    def frame(o, d):
        return render_rays(data, meta, origin0, d, bvh=cset,
                           engine="cluster")

    variants = {
        "frame": (scan_wrap(frame, 6), dirs, dirs * 0),
        "c0_raw": (scan_wrap(c0_raw, 16), dirs, dirs * 0),
        "c0_full": (scan_wrap(c0_full, 16), dirs, dirs * 0),
        "refl0": (scan_wrap(refl, 16), dirs, dirs * 0),
        "shade0": (scan_wrap(shade0, 16), dirs, dirs * 0),
        "sh2": (scan_wrap(sh2, 16), rd2, off2),
    }
    for name, (pair, dd, oo) in variants.items():
        ms = timeit(pair, oo, dd) * 1e3
        print(json.dumps({"phase": name, "ms": round(ms, 2)}), flush=True)


main()
