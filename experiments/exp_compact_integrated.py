"""Measure the integrated per-bounce active-lane compaction on real TPU.

Round-3 validated compaction on ONE wave (marbles bounce-3 shadow: 50.6
-> 28.4 ms for a 5.2 ms sort, exp_marbles_compact.py).  This measures the
PRODUCTIZED form (models/whitted.py: whole-carry stable sort at bounces
>= _COMPACT_FROM, gated to scenes with max_depth >= _COMPACT_MIN_DEPTH)
end-to-end on every deep-recursion scene, compaction on vs off, fresh jit
caches per config, steady-state frame times (4 pipelined frames, scalar
sync — bench.py methodology), first-scene warmup burned on a throwaway.
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

SCENES = ["marbles", "mirror_spheres", "car", "monkey", "berserker",
          "low_poly", "dragon_lowres", "horse_and_mug"]


def frame_ms(data, meta, cam, accel, n=4):
    def once():
        img = whitted.render_camera(data, meta, cam, bvh=accel,
                                    engine="cluster", chunk=1 << 21)
        return img
    float(jnp.sum(once())); float(jnp.sum(once()))
    t0 = time.perf_counter()
    imgs = [once() for _ in range(n)]
    s = float(sum(jnp.sum(im) for im in imgs))
    assert s == s
    return (time.perf_counter() - t0) / n * 1e3


def main():
    # burn the fresh-process first-scene artifact
    wd, wm = load_scene("/root/reference/inputs/simple.xml")
    wa = jax.device_put(build_clusters(wd, wm, build_bvh(wd, wm)))
    wd = jax.device_put(wd)
    for _ in range(3):
        float(jnp.sum(whitted.render_camera(wd, wm, wm.cameras[0], bvh=wa,
                                            engine="cluster", chunk=1 << 21)))

    for scene in SCENES:
        data, meta = load_scene(f"/root/reference/inputs/{scene}.xml")
        accel = jax.device_put(build_clusters(data, meta, build_bvh(data, meta)))
        data = jax.device_put(data)
        row = {"scene": scene, "max_depth": meta.max_depth}
        for label, min_depth in (("off", 99), ("on", 3)):
            whitted._COMPACT_MIN_DEPTH = min_depth
            whitted._render_camera_jit.clear_cache()
            whitted._render_rays_jit.clear_cache()
            total = 0.0
            for cam in meta.cameras:
                total += frame_ms(data, meta, cam, accel)
            row[f"ms_{label}"] = round(total, 1)
        whitted._COMPACT_MIN_DEPTH = 3
        row["speedup"] = round(row["ms_off"] / row["ms_on"], 3)
        print(json.dumps(row), flush=True)


main()
