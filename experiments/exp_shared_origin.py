"""Measure the shared-origin closest-hit kernel vs the generic one, and
the combined full-frame effect of round-2 kernel work (plane shadows +
shared-origin bounce 0).  Real TPU, slope timing."""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from raytracer_tpu.utils.compile_cache import enable
enable()
from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.ops.camera import camera_vectors, eye_rays_band
from raytracer_tpu.ops.cluster_trace import cluster_closest_hit
from raytracer_tpu.ops.tiling import block_permutation
from raytracer_tpu.models.whitted import _render_rays_jit


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timeit(fn, n=6):
    outs = [fn() for _ in range(2)]
    sync(outs[-1])
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    s = 0.0
    for o in outs:
        s += sync(o)
    return (time.perf_counter() - t0) / n


def run(tag, scene, ssaa, rows):
    data, meta = load_scene(scene)
    bvh = build_bvh(data, meta)
    cset = jax.device_put(build_clusters(data, meta, bvh))
    data = jax.device_put(data)
    cam = meta.cameras[0].scaled(ssaa) if ssaa > 1 else meta.cameras[0]
    origin, dirs = eye_rays_band(jnp.asarray(camera_vectors(cam)),
                                 cam.width, cam.height,
                                 jnp.float32((cam.height // 2) // 16 * 16),
                                 rows)
    perm, inv = block_permutation(rows, cam.width, 16, 16)
    dirs = jnp.asarray(dirs)[jnp.asarray(perm)]
    r = dirs.shape[0]

    @jax.jit
    def closest_generic(dirs):
        return cluster_closest_hit(cset, jnp.broadcast_to(origin, dirs.shape),
                                   dirs, meta.shadow_eps)[1]

    @jax.jit
    def closest_shared(dirs):
        return cluster_closest_hit(cset, jnp.asarray(origin), dirs,
                                   meta.shadow_eps, shared_origin=True)[1]

    t_a = np.asarray(jax.block_until_ready(closest_generic(dirs)))
    t_b = np.asarray(jax.block_until_ready(closest_shared(dirs)))
    bitwise = bool((t_a == t_b).all())
    tg = timeit(lambda: closest_generic(dirs))
    ts = timeit(lambda: closest_shared(dirs))
    t_frame = timeit(lambda: _render_rays_jit(
        data, meta, jnp.asarray(origin), dirs, cset, "cluster"))
    print(json.dumps({
        "tag": tag, "rays": int(r), "bitwise_equal": bitwise,
        "closest_generic_ms": round(tg * 1e3, 2),
        "closest_shared_ms": round(ts * 1e3, 2),
        "speedup": round(tg / ts, 3),
        "full_frame_ms": round(t_frame * 1e3, 1),
    }), flush=True)


run("horse_noaa", "/root/reference/inputs/horse_and_mug.xml", 1, 720)
run("horse_ssaa16_band", "/root/reference/inputs/horse_and_mug.xml", 16, 80)
run("low_poly_ssaa2", "/root/reference/inputs/low_poly.xml", 2, 1024)
