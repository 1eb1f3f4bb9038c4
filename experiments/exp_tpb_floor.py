"""Grid/segmentation tuning (round 3): TPB (tiles per program), MAX_NT
(tiles per pallas_call segment), MAX_TRI_LIST (SMEM shortlist capacity).

With exact masks the visit kernels run far fewer visits, so the fixed
floor (programs x per-program cost + per-segment dispatch) now rivals the
pair work: zero-visit shadow call = 6.4ms at TPB=8/MAX_NT=1536 (6
segments for an 8192-tile wave).  Usage: exp_tpb_floor.py TPB MAX_NT
MAX_LIST — fresh process per config (jit caches key on shapes only).
"""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from raytracer_tpu.utils.compile_cache import enable
enable()
import raytracer_tpu.ops.cluster_trace as ct
TPB, MAX_NT, MAX_LIST = (int(a) for a in sys.argv[1:4])
ct.TPB = TPB
ct.MAX_NT = MAX_NT
ct.MAX_TRI_LIST = MAX_LIST

from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.ops.camera import camera_vectors, eye_rays_band
from raytracer_tpu.ops.cluster_trace import (
    build_shadow_planes, cluster_shadow, _pad_rays, TILE,
)
from raytracer_tpu.ops.tiling import block_permutation
from raytracer_tpu.models.whitted import render_rays


def scan_time(fn, x, iters=16, blocks=3):
    @jax.jit
    def many(x):
        def step(acc, i):
            out = fn(x + i * 1e-7)
            return acc + jnp.sum(out.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0),
                              jnp.arange(1, iters + 1, dtype=jnp.float32))
        return acc
    float(many(x))
    best = np.inf
    for _ in range(blocks):
        t0 = time.perf_counter()
        v = many(x)
        float(v)
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    data, meta = load_scene("/root/reference/inputs/horse_and_mug.xml")
    bvh = build_bvh(data, meta)
    cset = jax.device_put(build_clusters(data, meta, bvh))
    data = jax.device_put(data)
    cam = meta.cameras[0]
    origin, dirs = eye_rays_band(jnp.asarray(camera_vectors(cam)),
                                 cam.width, cam.height, jnp.float32(0),
                                 cam.height)
    perm, _ = block_permutation(cam.height, cam.width, 8, 16)
    dirs = jnp.asarray(dirs)[jnp.asarray(perm)]
    origin0 = jnp.asarray(origin, jnp.float32)
    originb = jnp.broadcast_to(origin0, dirs.shape)
    lp = jnp.asarray(data.light_pos[0])
    planes = jax.jit(lambda: build_shadow_planes(cset, lp))()
    none = jnp.zeros((dirs.shape[0],), bool)
    full = jnp.ones((dirs.shape[0],), bool)

    cfg = {"tpb": TPB, "max_nt": MAX_NT, "max_list": MAX_LIST}
    ms = scan_time(lambda o: cluster_shadow(
        cset, planes, o, lp[None] - o, lp, active=none), originb)
    print(json.dumps({**cfg, "phase": "shadow_all_inactive",
                      "ms": round(ms, 2)}), flush=True)
    ms = scan_time(lambda o: cluster_shadow(
        cset, planes, o, lp[None] - o, lp, active=full), originb)
    print(json.dumps({**cfg, "phase": "shadow_eye_fullactive",
                      "ms": round(ms, 2)}), flush=True)

    def frame(d):
        return render_rays(data, meta, origin0, d, bvh=cset,
                           engine="cluster")
    ms = scan_time(frame, dirs, iters=6)
    print(json.dumps({**cfg, "phase": "frame", "ms": round(ms, 2)}),
          flush=True)


main()
