"""Measure the accumulator-form shadow kernel (chained-FMA dots, min-fold,
per-visit 1-op max accumulate) vs the generic Wald any-hit.  Interleaved
A/B blocks with min-of-block-means to fight the tunnel's timing drift."""
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
    build_shadow_planes, cluster_any, cluster_closest_hit, cluster_shadow,
)
from raytracer_tpu.ops.tiling import block_permutation
from raytracer_tpu.models.whitted import _render_rays_jit


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def block_mean(fn, n=5):
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    s = 0.0
    for o in outs:
        s += sync(o)
    return (time.perf_counter() - t0) / n


def ab(fa, fb, blocks=3):
    sync(fa()); sync(fb())  # warm/compile
    a, b = [], []
    for _ in range(blocks):
        a.append(block_mean(fa))
        b.append(block_mean(fb))
    return min(a), min(b)


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
    hit, t, normal, mat, point, offset, prim = jax.jit(
        lambda d: cluster_closest_hit(cset, jnp.asarray(origin), d,
                                      meta.shadow_eps, shared_origin=True)
    )(dirs)
    lp0 = data.light_pos[0]
    sd0 = lp0[None] - offset
    tmax = jnp.ones((r,), jnp.float32)

    @jax.jit
    def wald(offset, sd0, hit):
        return cluster_any(data, cset, offset, sd0, tmax, hit)

    @jax.jit
    def planes_acc(offset, sd0, hit):
        planes = build_shadow_planes(cset, lp0)
        return cluster_shadow(cset, planes, offset, sd0, lp0, active=hit)

    o_a = np.asarray(jax.block_until_ready(wald(offset, sd0, hit)))
    o_b = np.asarray(jax.block_until_ready(planes_acc(offset, sd0, hit)))
    m = np.asarray(hit)
    agree = float((o_a[m] == o_b[m]).mean()) if m.any() else 1.0
    ms_w, ms_p = ab(lambda: wald(offset, sd0, hit),
                    lambda: planes_acc(offset, sd0, hit))
    t_frame = block_mean(lambda: _render_rays_jit(
        data, meta, jnp.asarray(origin), dirs, cset, "cluster"))
    print(json.dumps({
        "tag": tag, "rays": int(r), "agree": round(agree, 6),
        "wald_ms": round(ms_w * 1e3, 2),
        "planes_acc_ms": round(ms_p * 1e3, 2),
        "speedup": round(ms_w / ms_p, 3),
        "full_frame_ms": round(t_frame * 1e3, 1),
    }), flush=True)


run("horse_noaa", "/root/reference/inputs/horse_and_mug.xml", 1, 720)
run("horse_ssaa16_band", "/root/reference/inputs/horse_and_mug.xml", 16, 80)
run("low_poly_ssaa2", "/root/reference/inputs/low_poly.xml", 2, 1024)
