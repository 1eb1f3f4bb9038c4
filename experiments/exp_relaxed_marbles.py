"""Measure --relaxed-parity (sqrt/div-free sphere occlusion) on the
sphere-heavy scenes, real TPU (VERDICT round-3 item 8).

marbles' shadow waves visit 650-sphere clusters; the root-form body pays
a sqrt + 2 divisions per (ray, sphere) pair.  The sign-test form saves
those at the cost of grazing-pair rounding flips (default-off;
tests/test_relaxed.py pins the class).  Steady-state frames, fresh jit
caches per config, plus the pixel-diff between the two images.
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
from raytracer_tpu.ops.image import quantize

SCENES = ["marbles", "mirror_spheres"]


def frame_ms(data, meta, cam, accel, relaxed, n=4):
    def once():
        return whitted.render_camera(data, meta, cam, bvh=accel,
                                     engine="cluster", chunk=1 << 21,
                                     relaxed=relaxed)
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
        row["ms_default"] = round(frame_ms(data, meta, cam, accel, False), 1)
        row["ms_relaxed"] = round(frame_ms(data, meta, cam, accel, True), 1)
        row["speedup"] = round(row["ms_default"] / row["ms_relaxed"], 3)
        img0 = np.asarray(quantize(whitted.render_camera(
            data, meta, cam, bvh=accel, engine="cluster", chunk=1 << 21)))
        img1 = np.asarray(quantize(whitted.render_camera(
            data, meta, cam, bvh=accel, engine="cluster", chunk=1 << 21,
            relaxed=True)))
        d = np.abs(img0.astype(int) - img1.astype(int)).max(-1)
        row["pixels_changed_frac"] = round(float((d > 0).mean()), 6)
        row["max_delta"] = int(d.max())
        print(json.dumps(row), flush=True)


main()
