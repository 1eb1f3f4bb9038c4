"""Fixed-overhead floors of one cluster_shadow / closest call (round 3).

With exact masks + tile skipping, sparse waves (sh1 at 16% tile
occupancy, sh2 at 8%) still cost ~19-20ms — so the floor is NOT pair
work.  Decompose: all-inactive shadow call (pure overhead), mask kernel
alone all-inactive, _compact (top_k) alone, dense small-sphere test,
and the shadow visit kernel on empty shortlists.
"""
import sys, os, json, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from raytracer_tpu.utils.compile_cache import enable
enable()
from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.ops.camera import camera_vectors, eye_rays_band
from raytracer_tpu.ops.cluster_trace import (
    build_shadow_planes, cluster_shadow, ray_cluster_mask, _compact,
    _pad_rays, _small_sphere_test, TILE,
)
from raytracer_tpu.ops.tiling import block_permutation


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
    origin = jnp.broadcast_to(jnp.asarray(origin, jnp.float32), dirs.shape)
    lp = jnp.asarray(data.light_pos[0])
    planes = jax.jit(lambda: build_shadow_planes(cset, lp))()
    r0 = dirs.shape[0]
    none = jnp.zeros((r0,), bool)
    r, op, dp, ap = _pad_rays(origin, dirs, none)
    ones = jnp.ones((op.shape[0],), jnp.float32)

    ms = scan_time(lambda o: cluster_shadow(
        cset, planes, o, lp[None] - o, lp, active=none), origin)
    print(json.dumps({"phase": "shadow_call_all_inactive", "ms": round(ms, 2)}),
          flush=True)

    ms = scan_time(lambda o: ray_cluster_mask(
        o, lp[None] - o, ap, cset.tri_cmin, cset.tri_cmax, ones, TILE)[1],
        op)
    print(json.dumps({"phase": "mask_all_inactive", "ms": round(ms, 2)}),
          flush=True)

    hit0, ent0 = ray_cluster_mask(op, lp[None] - op, None,
                                  cset.tri_cmin, cset.tri_cmax, ones, TILE)

    def compact_only(e):
        w, l, el, c = _compact(hit0, e, 48)
        return c.astype(jnp.float32).sum() + w.astype(jnp.float32).sum()
    ms = scan_time(compact_only, ent0)
    print(json.dumps({"phase": "compact_topk48", "ms": round(ms, 2)}),
          flush=True)

    ms = scan_time(lambda o: _small_sphere_test(cset, o, lp[None] - o)[0],
                   op)
    print(json.dumps({"phase": "small_sphere_dense", "ms": round(ms, 2)}),
          flush=True)

    # the visit kernel's pure grid cost: all-inactive => every tile's
    # shortlist is empty => zero visits, grid still walks nt/TPB programs
    from raytracer_tpu.ops.cluster_trace import _cluster_shadow_call
    nt = op.shape[0] // TILE
    empty_t = (jnp.zeros((nt, cset.tri_cmin.shape[0]), bool),
               jnp.full((nt, cset.tri_cmin.shape[0]), jnp.inf))
    empty_s = (jnp.zeros((nt, cset.sph_cmin.shape[0]), bool),
               jnp.full((nt, cset.sph_cmin.shape[0]), jnp.inf))
    ms = scan_time(lambda o: _cluster_shadow_call(
        empty_t, empty_s, o, planes, lp, cset.sph_dat, cset.n_sph), op)
    print(json.dumps({"phase": "shadow_kernel_zero_visits",
                      "ms": round(ms, 2)}), flush=True)


main()
