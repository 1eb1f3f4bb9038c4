"""Where do marbles' multi-light shadow milliseconds go, post-compaction?

Round-4 established the waves are NOT pair-math bound (removing the
per-pair sqrt+2div moved 10.8 of ~200 shadow ms).  This decomposes ONE
wave (bounce-0, full occupancy, the most expensive) by in-graph scan
timing of controlled variants:

  full     : production cluster_shadow_multi on the real wave
  novisit  : same call with ALL-INACTIVE lanes (masks False) — the
             pure per-call + skipped-subtile floor
  one_line : single-light cluster_shadow on the same wave x1 (is the
             2-light merge amortizing or duplicating?)
  nosph    : masks as-is but sphere shortlists emptied (tri tables only
             — marbles has no triangles, so this is relayout + acc init
             + the per-light fold, i.e. the non-walk subtile body)

The gap full - nosph = the sphere WALK (visit bodies + while_loop +
early-exit checks); nosph - novisit = the always-executed subtile body.
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
    build_shadow_planes, cluster_closest_hit, cluster_shadow,
    cluster_shadow_multi,
)
from raytracer_tpu.ops.shade import Hit
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
    cset = jax.device_put(build_clusters(data, meta, build_bvh(data, meta)))
    data = jax.device_put(data)
    cam = meta.cameras[0]
    origin, dirs = eye_rays_band(jnp.asarray(camera_vectors(cam)),
                                 cam.width, cam.height, jnp.float32(0),
                                 cam.height)
    perm, _ = block_permutation(cam.height, cam.width, 8, 16)
    dirs = jnp.asarray(dirs)[jnp.asarray(perm)]
    origin0 = jnp.asarray(origin, jnp.float32)
    eps = meta.shadow_eps

    fhit, t_, n_, m_, p_, off, prim = jax.jit(
        lambda d: cluster_closest_hit(cset, origin0, d, eps,
                                      shared_origin=True))(dirs)
    lp_all = data.light_pos
    planes = [build_shadow_planes(cset, lp_all[l])
              for l in range(meta.n_lights)]
    masks = jnp.stack([fhit] * meta.n_lights, 1)
    out = {"active_frac": round(float(jnp.mean(
        fhit.astype(jnp.float32))), 3)}

    shadow = lambda o, m: cluster_shadow_multi(
        cset, planes, o, lp_all[: meta.n_lights], m)
    out["full_ms"] = scan_time(shadow, (off, masks))
    out["novisit_ms"] = scan_time(shadow, (off, jnp.zeros_like(masks)))
    one = lambda o, m: cluster_shadow(
        cset, planes[0], o, lp_all[0][None] - o, lp_all[0], active=m)
    out["one_light_ms"] = scan_time(one, (off, fhit))
    # sphere shortlists emptied: monkeypatch cluster boxes to NaN so the
    # masks produce zero sphere candidates (tri side already empty)
    import dataclasses as dc
    cset_nosph = dc.replace(
        cset, sph_cmin=jnp.full_like(cset.sph_cmin, jnp.nan),
        sph_cmax=jnp.full_like(cset.sph_cmax, jnp.nan))
    nosph = lambda o, m: cluster_shadow_multi(
        cset_nosph, planes, o, lp_all[: meta.n_lights], m)
    out["nosph_ms"] = scan_time(nosph, (off, masks))
    print(json.dumps(out), flush=True)


main()
