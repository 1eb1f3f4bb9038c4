"""Does compacting the 10%-active bounce-2 wavefront pay?  Time the
production c2 closest call on the same wave in pixel order vs sorted by
bounce-1 hit slot (actives first), and the in-graph cost of one
15-operand payload sort for comparison."""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from raytracer_tpu.utils.compile_cache import enable
enable()
from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.ops.camera import camera_vectors, eye_rays_band
from raytracer_tpu.ops.cluster_trace import cluster_closest_hit, cluster_shadow, build_shadow_planes
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

    h0 = jax.jit(lambda d: cluster_closest_hit(
        cset, origin0, d, eps, shared_origin=True))(dirs)
    hh0 = Hit(hit=h0[0], t=h0[1], normal=h0[2], mat=h0[3], point=h0[4],
              offset=h0[5])
    ro, rd, _, is_m = jax.jit(lambda d: reflection_rays(data, d, hh0))(dirs)
    h1 = jax.jit(lambda o, d, a: cluster_closest_hit(
        cset, o, d, eps, active=a, with_slot=True))(ro, rd, is_m)
    hh1 = Hit(hit=h1[0], t=h1[1], normal=h1[2], mat=h1[3], point=h1[4],
              offset=h1[5])
    slot1 = h1[7]
    ro2, rd2, _, is_m2 = jax.jit(
        lambda d: reflection_rays(data, d, hh1))(rd)
    is_m2 = is_m2 & is_m

    key = np.where(np.asarray(is_m2), np.asarray(slot1), 2**30)
    idx = np.argsort(key, kind="stable")
    waves = {
        "pixel": (ro2, rd2, is_m2),
        "sorted": (jnp.asarray(np.asarray(ro2)[idx]),
                   jnp.asarray(np.asarray(rd2)[idx]),
                   jnp.asarray(np.asarray(is_m2)[idx])),
    }

    def c2(o, d, a):
        return cluster_closest_hit(cset, o, d, eps, active=a)[1]

    for name, (o, d, a) in waves.items():
        ms = timeit(scan_wrap(c2), o, d, a) * 1e3
        print(json.dumps({"phase": "c2", "order": name,
                          "ms": round(ms, 2)}), flush=True)

    # in-graph 15-operand payload sort cost on this wave (what the
    # integrator would pay inside the bounce loop)
    def sort15(o, d, a):
        keyd = jnp.where(a, (d[:, 0] * 0).astype(jnp.int32), 2**30)
        ops = (keyd, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
               o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
               a.astype(jnp.int32),
               jnp.arange(o.shape[0], dtype=jnp.int32))
        s = jax.lax.sort(ops, num_keys=1, is_stable=True)
        return s[1]

    ms = timeit(scan_wrap(sort15), ro2, rd2, is_m2) * 1e3
    print(json.dumps({"phase": "sort15_ingraph", "ms": round(ms, 2)}),
          flush=True)


main()
