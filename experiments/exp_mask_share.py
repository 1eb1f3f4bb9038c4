"""How much of the round-3 frame is exact-mask pair work?

In-graph scan timing of ray_cluster_mask alone on each real wave
(full-active sh0 segments, sparse c2) vs the full frame, to decide
whether a mask-side optimization (per-row lane-block skipping) is worth
building.
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
    cluster_closest_hit, ray_cluster_mask, _pad_rays, TILE,
)
from raytracer_tpu.ops.shade import reflection_rays, Hit
from raytracer_tpu.ops.tiling import block_permutation
from raytracer_tpu.models.whitted import render_rays


def scan_time(fn, args, iters=20, blocks=3):
    @jax.jit
    def many(*a):
        def step(acc, i):
            out = fn(*a)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return acc + s + i * 0.0, None
        acc, _ = jax.lax.scan(
            step, jnp.float32(0),
            jnp.arange(1, iters + 1, dtype=jnp.float32))
        return acc
    float(many(*args))
    best = np.inf
    for _ in range(blocks):
        t0 = time.perf_counter()
        float(many(*args))
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
    perm, inv = block_permutation(cam.height, cam.width, 8, 16)
    dirs = jnp.asarray(dirs)[jnp.asarray(perm)]
    origin0 = jnp.asarray(origin, jnp.float32)
    eps = meta.shadow_eps

    fhit0, t0_, n0, m0, p0, off0, prim0 = jax.jit(
        lambda d: cluster_closest_hit(cset, origin0, d, eps,
                                      shared_origin=True))(dirs)
    hh0 = Hit(hit=fhit0, t=t0_, normal=n0, mat=m0, point=p0, offset=off0)
    ro1, rd1, _, is_m1 = jax.jit(lambda d: reflection_rays(data, d, hh0))(dirs)
    fhit1, t1_, n1, m1, p1, off1, prim1 = jax.jit(
        lambda o, d: cluster_closest_hit(cset, o, d, eps, active=is_m1)
    )(ro1, rd1)
    hh1 = Hit(hit=fhit1 & is_m1, t=t1_, normal=n1, mat=m1, point=p1,
              offset=off1)
    ro2, rd2, _, is_m2raw = jax.jit(
        lambda d: reflection_rays(data, d, hh1))(rd1)
    is_m2 = is_m2raw & is_m1

    lp0 = jnp.asarray(data.light_pos[0])
    ones = jnp.ones((dirs.shape[0],), jnp.float32)

    waves = {
        "mask_sh0_full": _pad_rays(off0, lp0[None] - off0, fhit0, ones),
        "mask_c1": _pad_rays(ro1, rd1, is_m1, None),
        "mask_c2_sparse": _pad_rays(ro2, rd2, is_m2, None),
    }
    out = {}
    for name, (r, o_p, d_p, a_p, th_p) in waves.items():
        f = lambda o, d, a, th: ray_cluster_mask(
            o, d, a, cset.tri_cmin, cset.tri_cmax, th, TILE)
        args = (o_p, d_p, a_p,
                th_p if th_p is not None else jnp.full_like(o_p[:, 0], 1e18))
        out[name] = round(scan_time(f, args), 2)

    # full frame for scale
    frame = lambda d: render_rays(data, meta, origin0, d, bvh=cset,
                                  engine="cluster")
    out["full_frame"] = round(scan_time(frame, (dirs,), iters=5), 1)
    print(json.dumps(out), flush=True)


main()
