"""Where do c0's 27ms go?  kernel (t,slot) vs +hit-info assembly vs the
slot_pack gather alone, on the 1.04M primary wavefront (in-graph scan)."""
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
    TILE, cluster_closest_hit, tile_cluster_mask,
    _cluster_closest_call_shared, _compact, _pad_rays, _empty_shit,
    MAX_TRI_LIST, MAX_SPH_LIST, SMALL_SPH,
)
from raytracer_tpu.ops.tiling import block_permutation

ITERS = 16


def scan_wrap(fn):
    @jax.jit
    def many(o, d):
        def step(acc, i):
            out = fn(o, d + i * 1e-7)
            return acc + jnp.sum(out.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0),
                              jnp.arange(1, ITERS + 1, dtype=jnp.float32))
        return acc
    return many


def timeit(fn, o, d, blocks=3):
    float(fn(o, d))
    best = np.inf
    for _ in range(blocks):
        t0 = time.perf_counter()
        out = fn(o, d)
        float(out)
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


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
    org1 = jnp.asarray(origin, jnp.float32).reshape(3)
    eps = meta.shadow_eps

    def raw_call(o, d):
        r, ob, d, _ = _pad_rays(jnp.broadcast_to(org1, d.shape), d, None)
        thit = tile_cluster_mask(ob, d, None, cset.tri_cmin, cset.tri_cmax,
                                 None, TILE)
        shit = _empty_shit(thit[0].shape[0], cset.sph_cmin.shape[0])
        t, slot = _cluster_closest_call_shared(
            thit, shit, org1, d, cset.tri_dat, cset.sph_dat,
            cset.n_tri, cset.n_sph, False)
        return t[:r] + slot[:r]

    def full(o, d):
        return cluster_closest_hit(cset, org1, d, eps,
                                   shared_origin=True)[1]

    # slot_pack gather alone on a realistic slot distribution
    _, _, _, _, _, _, prim = jax.jit(
        lambda d: cluster_closest_hit(cset, org1, d, eps,
                                      shared_origin=True))(dirs)
    rng = np.random.default_rng(0)
    slots = jnp.asarray(
        rng.integers(0, cset.slot_pack.shape[0],
                     size=(dirs.shape[0],)), jnp.int32)

    def gather_only(o, d):
        s = (slots + (d[:, 0] * 0).astype(jnp.int32))
        return cset.slot_pack[s].sum(axis=1)

    from raytracer_tpu.ops.cluster_trace import _merge_small_spheres

    def raw_merge(o, d):
        r, ob, dd, _ = _pad_rays(jnp.broadcast_to(org1, d.shape), d, None)
        thit = tile_cluster_mask(ob, dd, None, cset.tri_cmin, cset.tri_cmax,
                                 None, TILE)
        shit = _empty_shit(thit[0].shape[0], cset.sph_cmin.shape[0])
        t, slot = _cluster_closest_call_shared(
            thit, shit, org1, dd, cset.tri_dat, cset.sph_dat,
            cset.n_tri, cset.n_sph, False)
        t, slot = _merge_small_spheres(cset, ob, dd, t, slot)
        return t[:r]

    def full_offset(o, d):
        return cluster_closest_hit(cset, org1, d, eps,
                                   shared_origin=True)[5].sum(axis=1)

    for name, fn in [("raw_t_slot", raw_call), ("raw_merge", raw_merge),
                     ("full_hitinfo", full), ("full_offset", full_offset),
                     ("pack_gather", gather_only)]:
        ms = timeit(scan_wrap(fn), dirs * 0, dirs) * 1e3
        print(json.dumps({"phase": name, "ms": round(ms, 2)}), flush=True)


main()
