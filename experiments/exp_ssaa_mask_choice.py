"""Mask choice vs wave coherence (round 3): on SUPERSAMPLED frames each
8x16-ray tile covers a tiny pixel footprint, so the interval tile mask
is near-tight while the exact per-ray mask still pays full R x C pair
work.  Render one ~1M-ray band of horse_and_mug at SSAA scale s with
each mask form and compare.  Usage: exp_ssaa_mask_choice.py SSAA
[interval|exact]."""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from raytracer_tpu.utils.compile_cache import enable
enable()
import raytracer_tpu.ops.cluster_trace as ct

SSAA = int(sys.argv[1]) if len(sys.argv) > 1 else 4
MODE = sys.argv[2] if len(sys.argv) > 2 else "exact"
if MODE == "interval":
    ct.ray_cluster_mask = ct.tile_cluster_mask

from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.ops.camera import camera_vectors, eye_rays_band
from raytracer_tpu.ops.tiling import block_permutation
from raytracer_tpu.models.whitted import render_rays


def main():
    data, meta = load_scene("/root/reference/inputs/horse_and_mug.xml")
    bvh = build_bvh(data, meta)
    cset = jax.device_put(build_clusters(data, meta, bvh))
    data = jax.device_put(data)
    cam = meta.cameras[0].scaled(SSAA)
    band_h = max(8, (1 << 20) // cam.width // 8 * 8)
    origin, dirs = eye_rays_band(jnp.asarray(camera_vectors(cam)),
                                 cam.width, cam.height,
                                 jnp.float32(cam.height // 2), band_h)
    perm, _ = block_permutation(band_h, cam.width, 8, 16)
    dirs = jnp.asarray(dirs)[jnp.asarray(perm)]
    origin0 = jnp.asarray(origin, jnp.float32)

    def frame(d):
        return render_rays(data, meta, origin0, d, bvh=cset,
                           engine="cluster")

    @jax.jit
    def many(d):
        def step(acc, i):
            return acc + jnp.sum(frame(d + i * 1e-7)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0),
                              jnp.arange(1, 7, dtype=jnp.float32))
        return acc

    float(many(dirs))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(dirs))
        best = min(best, time.perf_counter() - t0)
    r = dirs.shape[0]
    ms = best / 6 * 1e3
    print(json.dumps({"ssaa": SSAA, "mask": MODE, "rays": r,
                      "band_ms": round(ms, 2),
                      "mrays_s": round(r / ms / 1e3, 2)}), flush=True)


main()
