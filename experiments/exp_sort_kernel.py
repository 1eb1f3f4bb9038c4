"""Does the sorted wavefront's -17% pair work translate into kernel ms?
Time the bounce-1 closest call (production path) on the SAME mirror
wavefront in pixel order vs slot-sorted order, in-graph scan timing.
Also the bounce-1 light-0 shadow call both ways."""
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
    build_shadow_planes, cluster_closest_hit, cluster_shadow,
)
from raytracer_tpu.ops.shade import reflection_rays, Hit
from raytracer_tpu.ops.tiling import block_permutation

ITERS = 16


def scan_wrap(fn):
    @jax.jit
    def many(o, d, a):
        def step(acc, i):
            out = fn(o + 0 * i, d + i * 1e-7, a)
            return acc + jnp.sum(out.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0),
                              jnp.arange(1, ITERS + 1, dtype=jnp.float32))
        return acc
    return many


def timeit(fn, o, d, a, blocks=3):
    float(fn(o, d, a))
    best = np.inf
    for _ in range(blocks):
        t0 = time.perf_counter()
        out = fn(o, d, a)
        float(out)
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


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
    fhit0, t0_, n0, m0, p0, off0, prim0, slot0 = jax.jit(
        lambda d: cluster_closest_hit(cset, origin0, d, eps,
                                      shared_origin=True, with_slot=True)
    )(dirs)
    hh0 = Hit(hit=fhit0, t=t0_, normal=n0, mat=m0, point=p0, offset=off0)
    ro, rd, tint, is_m = jax.jit(lambda d: reflection_rays(data, d, hh0))(dirs)

    key = np.where(np.asarray(is_m), np.asarray(slot0), 2**30)
    idx = np.argsort(key, kind="stable")
    waves = {
        "pixel": (ro, rd, is_m),
        "sorted": (jnp.asarray(np.asarray(ro)[idx]),
                   jnp.asarray(np.asarray(rd)[idx]),
                   jnp.asarray(np.asarray(is_m)[idx])),
    }

    def c1(o, d, a):
        return cluster_closest_hit(cset, o, d, eps, active=a)[1]

    lp0 = data.light_pos[0]
    planes = jax.block_until_ready(
        jax.jit(lambda: build_shadow_planes(cset, lp0))())

    # bounce-1 shadow origins: offsets of the bounce-1 hits
    h1 = jax.jit(lambda o, d, a: cluster_closest_hit(cset, o, d, eps,
                                                     active=a))(ro, rd, is_m)
    off1 = jax.block_until_ready(h1[5])
    a_sh = jax.block_until_ready(h1[0] & is_m)
    sh_waves = {
        "pixel": (off1, off1, a_sh),
        "sorted": (jnp.asarray(np.asarray(off1)[idx]),
                   jnp.asarray(np.asarray(off1)[idx]),
                   jnp.asarray(np.asarray(a_sh)[idx])),
    }

    def sh1(o, d, a):
        sd = lp0[None] - o
        return cluster_shadow(cset, planes, o, sd, lp0, active=a)

    for name, (o, d, a) in waves.items():
        ms = timeit(scan_wrap(c1), o, d, a) * 1e3
        print(json.dumps({"phase": "c1", "order": name,
                          "ms": round(ms, 2)}), flush=True)
    for name, (o, d, a) in sh_waves.items():
        ms = timeit(scan_wrap(sh1), o, d, a) * 1e3
        print(json.dumps({"phase": "sh1_l0", "order": name,
                          "ms": round(ms, 2)}), flush=True)


main()
