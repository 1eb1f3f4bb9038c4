"""Is marbles' CLOSEST sphere work walk-bound like its shadow waves?

Decomposes the bounce-0 closest call (shared-origin eye wave) by
in-graph scan timing: full / sphere-shortlists-emptied (NaN boxes) /
all-inactive.  The closest walk has no early-exit reduce (plain fori
over the compacted list), so its per-visit overhead should be smaller
than the shadow walk's — this measures whether a dense unconditional
visit pass (ascending cluster order, cs <= 8) is worth its exact-t
cross-cluster tie-order change.
"""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np, dataclasses as dc
from raytracer_tpu.utils.compile_cache import enable
enable()
from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.ops.camera import camera_vectors, eye_rays_band
from raytracer_tpu.ops.cluster_trace import cluster_closest_hit
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
    cam = meta.cameras[0]
    origin, dirs = eye_rays_band(jnp.asarray(camera_vectors(cam)),
                                 cam.width, cam.height, jnp.float32(0),
                                 cam.height)
    perm, _ = block_permutation(cam.height, cam.width, 8, 16)
    dirs = jnp.asarray(dirs)[jnp.asarray(perm)]
    origin0 = jnp.asarray(origin, jnp.float32)
    eps = meta.shadow_eps

    f = lambda d: cluster_closest_hit(cset, origin0, d, eps,
                                      shared_origin=True)
    out = {"full_ms": scan_time(f, (dirs,))}
    cset_nosph = dc.replace(
        cset, sph_cmin=jnp.full_like(cset.sph_cmin, jnp.nan),
        sph_cmax=jnp.full_like(cset.sph_cmax, jnp.nan))
    g = lambda d: cluster_closest_hit(cset_nosph, origin0, d, eps,
                                      shared_origin=True)
    out["nosph_ms"] = scan_time(g, (dirs,))
    print(json.dumps(out), flush=True)


main()
