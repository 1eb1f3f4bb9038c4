"""Tune the wavefront-compaction gate on real TPU.

Sweeps _COMPACT_FROM (first eligible bounce) and _COMPACT_SCATTER (the
live-tile-minus-active threshold) on the win scene (marbles) and the
overhead-sensitive scenes (mirror_spheres: coherent mirrors;
dragon_lowres + simple_shading: deep max_depth but few/no mirrors, so
they only ever pay the gate's fixed costs).  Also validates the
round-4 identity-permutation unsort skip: no-mirror scenes should now
read at their compaction-off baseline.
"""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from raytracer_tpu.utils.compile_cache import enable
enable()
from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.models import whitted

SCENES = ["marbles", "mirror_spheres", "dragon_lowres", "simple_shading"]
CONFIGS = [("off", 99, 0.15), ("f2_s15", 3, 0.15), ("f1_s15", 3, 0.15),
           ("f2_s10", 3, 0.10), ("f1_s10", 3, 0.10)]
FROM_OF = {"off": 2, "f2_s15": 2, "f1_s15": 1, "f2_s10": 2, "f1_s10": 1}


def frame_ms(data, meta, cam, accel, n=4):
    def once():
        return whitted.render_camera(data, meta, cam, bvh=accel,
                                     engine="cluster", chunk=1 << 21)
    float(jnp.sum(once())); float(jnp.sum(once()))
    t0 = time.perf_counter()
    s = float(sum(jnp.sum(once()) for _ in range(n)))
    assert s == s
    return (time.perf_counter() - t0) / n * 1e3


def main():
    wd, wm = load_scene("/root/reference/inputs/simple.xml")
    wa = jax.device_put(build_clusters(wd, wm, build_bvh(wd, wm)))
    wd = jax.device_put(wd)
    for _ in range(3):
        float(jnp.sum(whitted.render_camera(wd, wm, wm.cameras[0], bvh=wa,
                                            engine="cluster", chunk=1 << 21)))

    for scene in SCENES:
        data, meta = load_scene(f"/root/reference/inputs/{scene}.xml")
        accel = jax.device_put(build_clusters(data, meta,
                                              build_bvh(data, meta)))
        data = jax.device_put(data)
        cam = meta.cameras[0]
        row = {"scene": scene}
        for label, min_depth, thresh in CONFIGS:
            whitted._COMPACT_MIN_DEPTH = min_depth
            whitted._COMPACT_SCATTER = thresh
            whitted._COMPACT_FROM = FROM_OF[label]
            whitted._render_camera_jit.clear_cache()
            row[label] = round(frame_ms(data, meta, cam, accel), 1)
        whitted._COMPACT_MIN_DEPTH = 3
        whitted._COMPACT_SCATTER = 0.15
        whitted._COMPACT_FROM = 2
        whitted._render_camera_jit.clear_cache()
        print(json.dumps(row), flush=True)


main()
