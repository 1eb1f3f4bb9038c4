"""CLUSTER=256 (vs production 128): the exact mask's pair work is
R x Cpad, so doubling cluster size halves mask cost; kernels pay wider
(TILE, 256) visits with fewer candidates.  Usage: exp_cluster256.py
[CLUSTER] — fresh process per size (module constants patched pre-trace).
Prints frame time + a checksum of the rendered radiance for equality
checking across sizes.
"""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from raytracer_tpu.utils.compile_cache import enable
enable()
import raytracer_tpu.models.clusters as mc
import raytracer_tpu.ops.cluster_trace as ct
C = int(sys.argv[1]) if len(sys.argv) > 1 else 128
mc.CLUSTER = C
ct.CLUSTER = C

from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.ops.camera import camera_vectors, eye_rays_band
from raytracer_tpu.ops.tiling import block_permutation
from raytracer_tpu.models.whitted import render_rays


def scan_time(fn, x, iters=8, blocks=3):
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
    cset = jax.device_put(mc.build_clusters(data, meta, bvh))
    data = jax.device_put(data)
    cam = meta.cameras[0]
    origin, dirs = eye_rays_band(jnp.asarray(camera_vectors(cam)),
                                 cam.width, cam.height, jnp.float32(0),
                                 cam.height)
    perm, _ = block_permutation(cam.height, cam.width, 8, 16)
    dirs = jnp.asarray(dirs)[jnp.asarray(perm)]
    origin0 = jnp.asarray(origin, jnp.float32)

    def frame(d):
        return render_rays(data, meta, origin0, d, bvh=cset,
                           engine="cluster")

    color = jax.jit(frame)(dirs)
    csum = float(jnp.sum(color)) / color.size
    ms = scan_time(frame, dirs)
    print(json.dumps({"cluster": C, "frame_ms": round(ms, 2),
                      "mean_radiance": round(csum, 6)}), flush=True)


main()
