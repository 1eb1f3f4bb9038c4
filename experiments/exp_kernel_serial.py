"""Is the visit loop's vector->scalar feedback (early-exit / t-prune in
the while_loop CONDITION) the binding constraint?  A/B each kernel with
the scalar-sync paths disabled (plain fori over the shortlist)."""
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
from raytracer_tpu.ops.tiling import block_permutation


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

    def closest(shared, prune):
        from raytracer_tpu.ops import cluster_trace as ct
        thit_o = jnp.asarray(origin) if shared else jnp.broadcast_to(
            jnp.asarray(origin), dirs.shape)

        @jax.jit
        def f(dirs):
            # NOTE (round-2): the `prune` parameter was removed with the
            # lanewise accumulators (ROADMAP); this script predates that
            # and now ignores the flag — kept runnable for the archive.
            org_b = jnp.broadcast_to(jnp.asarray(origin), dirs.shape)
            rr, org_p, dirs_p, act = ct._pad_rays(org_b, dirs, None)
            thit = ct.tile_cluster_mask(
                org_p, dirs_p, None, cset.tri_cmin, cset.tri_cmax, None,
                ct.TILE)
            shit = ct._empty_shit(thit[0].shape[0], cset.sph_cmin.shape[0])
            if shared:
                t, slot = ct._cluster_closest_call_shared(
                    thit, shit, jnp.asarray(origin), dirs_p,
                    cset.tri_dat, cset.sph_dat, cset.n_tri, cset.n_sph,
                    False)
            else:
                t, slot = ct._cluster_closest_call(
                    thit, shit, org_p, dirs_p,
                    cset.tri_dat, cset.sph_dat, cset.n_tri, cset.n_sph,
                    False)
            return t[:rr], slot[:rr]
        return f

    f_pr = closest(True, True)
    f_np = closest(True, False)
    t_a, s_a = jax.block_until_ready(f_pr(dirs))
    t_b, s_b = jax.block_until_ready(f_np(dirs))
    same = bool((np.asarray(s_a) == np.asarray(s_b)).all())
    ms_pr = timeit(lambda: f_pr(dirs)[0])
    ms_np = timeit(lambda: f_np(dirs)[0])
    print(json.dumps({
        "tag": tag, "what": "closest_shared", "rays": int(r),
        "slots_equal": same,
        "prune_ms": round(ms_pr * 1e3, 2),
        "noprune_ms": round(ms_np * 1e3, 2),
        "speedup": round(ms_pr / ms_np, 3)}), flush=True)

    # shadow wavefront for light 0
    hit, t, normal, mat, point, offset, prim = jax.jit(
        lambda d: cluster_closest_hit(cset, jnp.asarray(origin), d,
                                      meta.shadow_eps, shared_origin=True)
    )(dirs)
    lp0 = data.light_pos[0]
    sd0 = lp0[None] - offset

    def shadow(early):
        @jax.jit
        def f(offset, sd0, hit):
            planes = build_shadow_planes(cset, lp0)
            return cluster_shadow(cset, planes, offset, sd0, lp0,
                                  active=hit, early_exit=early)
        return f

    f_ee = shadow(True)
    f_ne = shadow(False)
    o_a = np.asarray(jax.block_until_ready(f_ee(offset, sd0, hit)))
    o_b = np.asarray(jax.block_until_ready(f_ne(offset, sd0, hit)))
    m = np.asarray(hit)
    same = bool((o_a[m] == o_b[m]).all())
    ms_ee = timeit(lambda: f_ee(offset, sd0, hit))
    ms_ne = timeit(lambda: f_ne(offset, sd0, hit))
    print(json.dumps({
        "tag": tag, "what": "shadow", "rays": int(r), "occ_equal": same,
        "earlyexit_ms": round(ms_ee * 1e3, 2),
        "noexit_ms": round(ms_ne * 1e3, 2),
        "speedup": round(ms_ee / ms_ne, 3)}), flush=True)


run("horse_noaa", "/root/reference/inputs/horse_and_mug.xml", 1, 720)
run("horse_ssaa16_band", "/root/reference/inputs/horse_and_mug.xml", 16, 80)
