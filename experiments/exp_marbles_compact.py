"""Does active-lane compaction pay on marbles' deep scattered waves?

Round-2 closed sorted wavefronts on horse_and_mug (3 bounces; pixel
order already clusters mirror paths).  Marbles is different: activity
decays to 23% by bounce 6 but survivors stay scattered, so every wave
pays near-full tile prices (ROADMAP round-3 marbles anatomy).  This
measures ONE wave — the 2-light merged shadow call at bounce 3 (~33%
active) — three ways, in-graph scan timing:

  1. as-is (scattered active lanes),
  2. compacted: rays stably sorted by activity so live lanes form a
     dense prefix and the trailing tiles hit the existing
     fully-inactive skip paths (sort cost measured separately),
  3. the sort itself (key + payloads), to price the transform.

Occlusion bits are permutation-covariant (verified: sorted-output
unsorted equals as-is), so compaction is semantics-free for any-hit.
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
    cluster_closest_hit, cluster_shadow_multi, build_shadow_planes,
)
from raytracer_tpu.ops.shade import reflection_rays, Hit
from raytracer_tpu.ops.tiling import block_permutation


def scan_time(fn, args, iters=10, blocks=3):
    @jax.jit
    def many(*a):
        def step(acc, i):
            out = fn(*a)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return acc + s + i * 0.0, None
        acc, _ = jax.lax.scan(step, jnp.float32(0),
                              jnp.arange(1, iters + 1, dtype=jnp.float32))
        return acc
    float(many(*args))
    best = np.inf
    for _ in range(blocks):
        t0 = time.perf_counter()
        float(many(*args))
        best = min(best, time.perf_counter() - t0)
    return round(best / iters * 1e3, 2)


def main():
    data, meta = load_scene("/root/reference/inputs/marbles.xml")
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

    # walk to bounce 3
    f0 = jax.jit(lambda d: cluster_closest_hit(cset, origin0, d, eps,
                                               shared_origin=True))
    fhit, t_, n_, m_, p_, off, prim = f0(dirs)
    hh = Hit(hit=fhit, t=t_, normal=n_, mat=m_, point=p_, offset=off)
    dcur, act = dirs, None
    for b in range(3):
        o2, d2, _, is_m = jax.jit(
            lambda dd, h: reflection_rays(data, dd, h))(dcur, hh)
        act = is_m if act is None else (act & is_m)
        fh, tt, nn, mm, pp, oo, pr = jax.jit(
            lambda o_, d_, a: cluster_closest_hit(cset, o_, d_, eps,
                                                  active=a))(o2, d2, act)
        hh = Hit(hit=fh & act, t=tt, normal=nn, mat=mm, point=pp, offset=oo)
        dcur = d2
    hitmask = hh.hit
    off3 = hh.offset
    lp_all = data.light_pos
    planes = [build_shadow_planes(cset, lp_all[l])
              for l in range(meta.n_lights)]
    masks = jnp.stack([hitmask] * meta.n_lights, 1)
    frac = float(jnp.mean(hitmask.astype(jnp.float32)))
    nt_live = float(jnp.mean(
        hitmask.reshape(-1, 128).any(1).astype(jnp.float32)))

    shadow = lambda o, m: cluster_shadow_multi(
        cset, planes, o, lp_all[: meta.n_lights], m)

    def compact(o, m):
        key = (~m[:, 0]).astype(jnp.int32)
        _, os0, os1, os2, m0, m1 = jax.lax.sort(
            (key, o[:, 0], o[:, 1], o[:, 2],
             m[:, 0].astype(jnp.int32), m[:, 1].astype(jnp.int32)),
            is_stable=True, num_keys=1)
        return (jnp.stack([os0, os1, os2], 1),
                jnp.stack([m0, m1], 1).astype(bool))

    oc, mc = jax.jit(compact)(off3, masks)
    nt_live_c = float(jnp.mean(
        mc[:, 0].reshape(-1, 128).any(1).astype(jnp.float32)))

    # covariance check: occlusion of compacted inputs, unsorted back,
    # equals the as-is result on live lanes
    occ_ref = np.asarray(jax.jit(shadow)(off3, masks))
    occ_c = np.asarray(jax.jit(shadow)(oc, mc))
    key = np.asarray((~masks[:, 0]).astype(jnp.int32))
    order = np.argsort(key, kind="stable")
    back = np.empty_like(order)
    back[order] = np.arange(order.size)
    assert (occ_c[back] == occ_ref)[np.asarray(masks)].all()

    out = {
        "active_frac": round(frac, 3),
        "live_tile_frac_as_is": round(nt_live, 3),
        "live_tile_frac_compacted": round(nt_live_c, 3),
        "shadow_ms_as_is": scan_time(shadow, (off3, masks)),
        "shadow_ms_compacted": scan_time(shadow, (oc, mc)),
        "sort_ms": scan_time(compact, (off3, masks)),
    }
    print(json.dumps(out), flush=True)


main()
