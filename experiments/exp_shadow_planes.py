"""A/B the fixed-light plane shadow kernel vs the generic Wald any-hit on
the real TPU: horse_and_mug no-AA wavefront and an SSAA-16 band, plus the
full-frame effect.  Slope timing with scalar-readback syncs (axon)."""
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
    cluster_any, cluster_closest_hit, cluster_shadow, build_shadow_planes,
)
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
    nl = meta.n_lights

    @jax.jit
    def shadow_wave(dirs):
        hit, t, normal, mat, point, offset, prim = cluster_closest_hit(
            cset, jnp.asarray(origin), dirs, meta.shadow_eps)
        return offset, hit
    offset, hit = jax.block_until_ready(shadow_wave(dirs))
    lp0 = data.light_pos[0]
    sd0 = lp0[None] - offset
    tmax = jnp.ones((r,), jnp.float32)

    @jax.jit
    def old_any(offset, sd0, hit):
        return cluster_any(data, cset, offset, sd0, tmax, hit)

    @jax.jit
    def new_shadow(offset, sd0, hit):
        planes = build_shadow_planes(cset, lp0)
        return cluster_shadow(cset, planes, offset, sd0, lp0, active=hit)

    occ_a = np.asarray(jax.block_until_ready(old_any(offset, sd0, hit)))
    occ_b = np.asarray(jax.block_until_ready(new_shadow(offset, sd0, hit)))
    m = np.asarray(hit)
    agree = float((occ_a[m] == occ_b[m]).mean()) if m.any() else 1.0
    t_old = timeit(lambda: old_any(offset, sd0, hit))
    t_new = timeit(lambda: new_shadow(offset, sd0, hit))
    t_frame = timeit(lambda: _render_rays_jit(
        data, meta, jnp.asarray(origin), dirs, cset, "cluster"))
    print(json.dumps({
        "tag": tag, "rays": int(r), "agree_frac": round(agree, 6),
        "anyhit_old_ms": round(t_old * 1e3, 2),
        "anyhit_new_ms": round(t_new * 1e3, 2),
        "speedup": round(t_old / t_new, 3),
        "full_frame_ms": round(t_frame * 1e3, 1),
    }), flush=True)


run("horse_noaa_band", "/root/reference/inputs/horse_and_mug.xml", 1, 720)
run("horse_ssaa16_band", "/root/reference/inputs/horse_and_mug.xml", 16, 80)
