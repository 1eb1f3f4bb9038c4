"""How much dense pair-work would smaller SHADOW tiles save?

For the real horse_and_mug shadow wavefront (light 0), compute the
conservative tile->cluster shortlist at tile sizes 64/128/256 and report
total (tile, cluster) visits and the implied dense pair-work
visits * tile * 128.  Pure jnp (runs on the TPU for speed, but no kernel
changes needed) — decides whether parametrizing the kernel TILE pays."""
import sys, os, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from raytracer_tpu.utils.compile_cache import enable
enable()
from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.ops.camera import camera_vectors, eye_rays_band
from raytracer_tpu.ops.cluster_trace import cluster_closest_hit, tile_cluster_mask
from raytracer_tpu.ops.tiling import block_permutation


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
    hit, t, normal, mat, point, offset, prim = jax.jit(
        lambda d: cluster_closest_hit(cset, jnp.asarray(origin), d,
                                      meta.shadow_eps, shared_origin=True)
    )(dirs)
    lp0 = data.light_pos[0]
    sd = lp0[None] - offset
    ones = jnp.ones((r,), jnp.float32)
    # tile-size sweep at CLUSTER=128, plus cluster-size sweep at TILE=256
    # (merged adjacent cluster boxes emulate CLUSTER=256/512: the
    # preorder cluster sequence is spatial, so adjacent merges are the
    # boxes a wider build would produce)
    for tile in (64, 128, 256):
        m, _ = tile_cluster_mask(offset, sd, hit, cset.tri_cmin,
                                 cset.tri_cmax, ones, tile)
        visits = int(np.asarray(m.sum()))
        nt = r // tile
        print(json.dumps({
            "tag": tag, "tile": tile, "cluster": 128, "tiles": nt,
            "visits": visits, "mean_cand": round(visits / nt, 2),
            "pair_work_G": round(visits * tile * 128 / 1e9, 3),
        }), flush=True)
    cmin, cmax = cset.tri_cmin, cset.tri_cmax
    for merge in (2, 4):
        c = cmin.shape[0]
        pad = (-c) % merge
        if pad:
            cmin_p = jnp.concatenate([cmin, jnp.full((pad, 3), jnp.inf)], 0)
            cmax_p = jnp.concatenate([cmax, jnp.full((pad, 3), -jnp.inf)], 0)
        else:
            cmin_p, cmax_p = cmin, cmax
        cm = cmin_p.reshape(-1, merge, 3).min(1)
        cx = cmax_p.reshape(-1, merge, 3).max(1)
        m, _ = tile_cluster_mask(offset, sd, hit, cm, cx, ones, 256)
        visits = int(np.asarray(m.sum()))
        nt = r // 256
        print(json.dumps({
            "tag": tag, "tile": 256, "cluster": 128 * merge, "tiles": nt,
            "visits": visits, "mean_cand": round(visits / nt, 2),
            "pair_work_G": round(visits * 256 * 128 * merge / 1e9, 3),
        }), flush=True)


run("horse_noaa", "/root/reference/inputs/horse_and_mug.xml", 1, 720)
run("horse_ssaa16_band", "/root/reference/inputs/horse_and_mug.xml", 16, 80)
