"""Phase anatomy of the SSAA-256 band and low_poly workloads (real TPU,
slope timing).  Where does time go: closest kernel / shadow any-hit /
full bounce loop / streamed band?"""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np, dataclasses
from raytracer_tpu.utils.compile_cache import enable
enable()
from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.ops.camera import camera_vectors, eye_rays_band
from raytracer_tpu.ops.cluster_trace import cluster_any, cluster_closest_hit
from raytracer_tpu.ops.tiling import block_permutation
from raytracer_tpu.ops.shade import normalize
from raytracer_tpu.models.whitted import render_rays, _render_rays_jit

def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))

def timeit(fn, n=4):
    outs = [fn() for _ in range(2)]
    sync(outs[-1][0] if isinstance(outs[-1], tuple) else outs[-1])
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    s = 0.0
    for o in outs:
        s += sync(o[0] if isinstance(o, tuple) else o)
    return (time.perf_counter() - t0) / n

def anatomy(tag, scene, ssaa, rows):
    data, meta = load_scene(scene)
    bvh = build_bvh(data, meta)
    cset = jax.device_put(build_clusters(data, meta, bvh))
    data = jax.device_put(data)
    cam = meta.cameras[0].scaled(ssaa) if ssaa > 1 else meta.cameras[0]
    # central row band at the TRUE scaled resolution (correct frustum)
    origin, dirs = eye_rays_band(jnp.asarray(camera_vectors(cam)),
                                 cam.width, cam.height,
                                 jnp.float32(cam.height // 2), rows)
    perm, inv = block_permutation(rows, cam.width, 16, 16)
    dirs = jnp.asarray(dirs)[jnp.asarray(perm)]
    r = dirs.shape[0]
    nl = meta.n_lights

    @jax.jit
    def closest(dirs):
        return cluster_closest_hit(cset, jnp.asarray(origin), dirs,
                                   meta.shadow_eps)[1]
    t_closest = timeit(lambda: closest(dirs))

    @jax.jit
    def shadow_wave(dirs):
        hit, t, normal, mat, point, offset, prim = cluster_closest_hit(
            cset, jnp.asarray(origin), dirs, meta.shadow_eps)
        lp = data.light_pos[:nl]
        to_off = lp[None] - offset[:, None]
        org = jnp.broadcast_to(offset[:, None], (r, nl, 3))
        return (org.transpose(1,0,2).reshape(nl*r,3),
                to_off.transpose(1,0,2).reshape(nl*r,3),
                jnp.broadcast_to(hit[:,None], (r,nl)).T.reshape(nl*r))
    org, sd, mask = jax.block_until_ready(shadow_wave(dirs))
    tmax = jnp.ones((nl*r,), jnp.float32)

    @jax.jit
    def anyhit(org, sd, mask):
        return cluster_any(data, cset, org, sd, tmax, mask)
    t_any = timeit(lambda: anyhit(org, sd, mask))

    t_frame = timeit(lambda: _render_rays_jit(
        data, meta, jnp.asarray(origin), dirs, cset, "cluster"))
    print(json.dumps({"tag": tag, "rays": r, "shadow_rays": int(nl*r),
                      "closest_ms": round(t_closest*1e3,1),
                      "anyhit_ms": round(t_any*1e3,1),
                      "full_frame_ms": round(t_frame*1e3,1)}), flush=True)

anatomy("ssaa16_band", "/root/reference/inputs/horse_and_mug.xml", 16, 80)
anatomy("low_poly_ssaa2", "/root/reference/inputs/low_poly.xml", 2, 1024)
