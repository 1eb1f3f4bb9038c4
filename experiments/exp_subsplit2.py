"""subsplit=2 shortlists at TILE=128: visits/pair-work stats for the
three big phases (c0 primary, sh0 light-0, c1 mirror), plus in-graph
kernel timing of sh0 with and without subsplit (mask cost doubles, visit
count drops — which side wins at TILE=128?)."""
import sys, os, json, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from raytracer_tpu.utils.compile_cache import enable
enable()
from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters, CLUSTER
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.ops.camera import camera_vectors, eye_rays_band
from raytracer_tpu.ops.cluster_trace import (
    MAX_TRI_LIST, TILE, TPB, _compact, build_shadow_planes,
    cluster_closest_hit, tile_cluster_mask, _pad_rays,
)
from raytracer_tpu.ops.shade import reflection_rays, Hit
from raytracer_tpu.ops.tiling import block_permutation

ITERS = 16


def stats(tag, origin, dirs, active, cmin, cmax, t_hi, sub):
    r, origin, dirs, active, t_hi = _pad_rays(origin, dirs, active, t_hi)
    hit, entry = tile_cluster_mask(origin, dirs, active, cmin, cmax,
                                   t_hi, TILE, subsplit=sub)
    counts = np.asarray(hit.sum(1))
    print(json.dumps({
        "tag": tag, "sub": sub, "visits": int(counts.sum()),
        "mean_cand": round(float(counts.mean()), 2),
        "gpairs": round(counts.sum() * TILE * CLUSTER / 1e9, 3),
    }), flush=True)


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
    ro, rd, tint, is_m = jax.jit(lambda d: reflection_rays(data, d, hh0))(dirs)
    lp0 = data.light_pos[0]
    sd0 = lp0[None] - off0
    ones = jnp.ones((dirs.shape[0],), jnp.float32)
    obc = jnp.broadcast_to(origin0, dirs.shape)

    for sub in (1, 2):
        stats("c0", obc, dirs, None, cset.tri_cmin, cset.tri_cmax, None, sub)
        stats("sh0_l0", off0, sd0, fhit0, cset.tri_cmin, cset.tri_cmax,
              ones, sub)
        stats("c1", ro, rd, is_m, cset.tri_cmin, cset.tri_cmax, None, sub)


main()
