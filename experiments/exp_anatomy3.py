"""Frame anatomy at TILE=128/TPB=8 with in-graph scan timing (the only
methodology that cancels the tunnel's ~40ms per-dispatch floor).

horse_and_mug full wavefront (1.04M rays, 2 lights, maxdepth 2):
  frame     — full render_rays (cluster engine), one jit
  c0        — bounce-0 closest (shared-origin kernel)
  sh0       — bounce-0 shadow, BOTH lights (planes kernel x2)
  c1        — bounce-1 closest (general kernel, mirror wavefront)
  sh1       — bounce-1 shadow, both lights, active-masked
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
)
from raytracer_tpu.ops.shade import reflection_rays, Hit
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

    # bounce-0 state
    h0 = jax.jit(lambda d: cluster_closest_hit(
        cset, origin0, d, eps, shared_origin=True))(dirs)
    fhit0, t0_, n0, m0, p0, off0, prim0 = h0
    hh0 = Hit(hit=fhit0, t=t0_, normal=n0, mat=m0, point=p0, offset=off0)
    ro, rd, tint, is_m = jax.jit(
        lambda d: reflection_rays(data, d, hh0))(dirs)
    act1 = np.asarray(is_m)
    print(json.dumps({"note": "bounce1 active frac",
                      "frac": float(act1.mean())}), flush=True)
    ro = jax.block_until_ready(ro)
    off0 = jax.block_until_ready(off0)

    def frame(o, d):
        return render_rays(data, meta, origin0, d, bvh=cset,
                           engine="cluster")

    def c0(o, d):
        return cluster_closest_hit(cset, origin0, d, eps,
                                   shared_origin=True)[1]

    def sh0(o, d):
        tot = jnp.zeros((), jnp.float32)
        for l in range(2):
            op = o + 0 * d[:, :1]
            sd = lps[l][None] - op
            occ = cluster_shadow(cset, planes[l], op, sd,
                                 lps[l], active=fhit0)
            tot += jnp.sum(occ.astype(jnp.float32))
        return tot

    def c1(o, d):
        return cluster_closest_hit(cset, o + 0 * d[:, :1], d, eps,
                                   active=is_m)[1]

    # bounce-1 hits -> bounce-1 shadow wave and bounce-2 closest wave
    h1 = jax.jit(lambda o, d: cluster_closest_hit(cset, o, d, eps,
                                                  active=is_m))(ro, rd)
    hh1 = Hit(hit=h1[0], t=h1[1], normal=h1[2], mat=h1[3], point=h1[4],
              offset=h1[5])
    off1 = jax.block_until_ready(h1[5])
    a1 = h1[0] & is_m
    ro2, rd2, tint2, is_m2 = jax.jit(
        lambda d: reflection_rays(data, d, hh1))(rd)
    is_m2 = is_m2 & is_m
    print(json.dumps({"note": "bounce2 active frac",
                      "frac": float(np.asarray(is_m2).mean())}), flush=True)
    ro2 = jax.block_until_ready(ro2)

    def sh1(o, d):
        tot = jnp.zeros((), jnp.float32)
        for l in range(2):
            sd = lps[l][None] - (o + 0 * d[:, :1])
            occ = cluster_shadow(cset, planes[l], o + 0 * d[:, :1], sd,
                                 lps[l], active=a1)
            tot += jnp.sum(occ.astype(jnp.float32))
        return tot

    def c2(o, d):
        return cluster_closest_hit(cset, o + 0 * d[:, :1], d, eps,
                                   active=is_m2)[1]

    variants = {
        "frame": (scan_wrap(frame, 6), dirs),
        "c0": (scan_wrap(c0, 16), dirs),
        "sh0": (scan_wrap(sh0, 16), dirs),
        "c1": (scan_wrap(c1, 16), rd),
        "sh1": (scan_wrap(sh1, 16), rd),
        "c2": (scan_wrap(c2, 16), rd2),
    }
    # origins for shadow/c1 variants
    origins = {"frame": dirs * 0, "c0": dirs * 0, "sh0": off0, "c1": ro,
               "sh1": off1, "c2": ro2}
    for name, (pair, dd) in variants.items():
        ms = timeit(pair, origins[name], dd) * 1e3
        print(json.dumps({"phase": name, "ms": round(ms, 2)}), flush=True)


main()
