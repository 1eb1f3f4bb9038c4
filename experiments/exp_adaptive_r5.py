"""Round-5 adaptive re-measurement (VERDICT round-4 item 5): route the
refinement wavefronts through the round-4 runtime activity compaction
(compact_mode="deep" — depth gate off, scatter gate still runtime) and
re-measure MSE/s vs uniform at matched budgets, r3 protocol.

Scenes: horse_and_mug (max_depth 2 — compaction was depth-gated OFF for
it until now) and low_poly (max_depth 6 — compaction could already
engage; "deep" only matters for its refinement waves' early bounces).

Done criterion (VERDICT): adaptive MSE-per-second >= ~1.3x uniform on
horse_and_mug/low_poly, else a final measured close-out in BASELINE.md.
"""
import json
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.models.whitted import render_camera_streamed
from raytracer_tpu.ops.adaptive import render_camera_adaptive
from raytracer_tpu.ops.image import quantize
from raytracer_tpu.utils.compile_cache import enable

enable()


def _sync(x):
    return float(jnp.sum(jnp.asarray(x).astype(jnp.float32)))


def timed(fn):
    out = fn()
    _sync(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn()
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return np.asarray(out), best


def run_scene(path):
    scene = os.path.basename(path).replace(".xml", "")
    data, meta = load_scene(path)
    accel = jax.device_put(build_clusters(data, meta, build_bvh(data, meta)))
    data = jax.device_put(data)
    cam = meta.cameras[0]

    truth, _ = timed(lambda: render_camera_streamed(
        data, meta, cam, bvh=accel, engine="cluster", ssaa=8,
        ssaa_mode="jitter", chunk=1 << 21))
    tq = np.asarray(quantize(jnp.asarray(truth))).astype(np.int64)

    results = {}

    def report(name, img, dt, spp):
        q = np.asarray(quantize(jnp.asarray(img))).astype(np.int64)
        err = np.abs(q - tq)
        mse = float((err.astype(np.float64) ** 2).mean())
        results[name] = (mse, dt)
        print(json.dumps({
            "scene": scene, "config": name, "mean_spp": round(spp, 2),
            "time_s": round(dt, 3), "mse": round(mse, 3),
            "p999": int(np.percentile(err, 99.9)),
        }), flush=True)

    img, dt = timed(lambda: render_camera_streamed(
        data, meta, cam, bvh=accel, engine="cluster", ssaa=2,
        ssaa_mode="jitter", chunk=1 << 21))
    report("uniform 4spp", img, dt, 4)

    out = timed(lambda: render_camera_adaptive(
        data, meta, cam, bvh=accel, engine="cluster", base_spp=4,
        extra_spp=12, refine_frac=0.125, rounds=1)[0])
    _, stats = render_camera_adaptive(
        data, meta, cam, bvh=accel, engine="cluster", base_spp=4,
        extra_spp=12, refine_frac=0.125, rounds=1)
    report("adaptive 4+12@12.5% deep-compact", out[0], out[1],
           stats["mean_spp"])

    # MSE/s comparison at these budgets: quality-per-second ratio
    (mu, tu), (ma, ta) = results["uniform 4spp"], \
        results["adaptive 4+12@12.5% deep-compact"]
    # (1/mse)/time, adaptive relative to uniform
    ratio = (1.0 / ma / ta) / (1.0 / mu / tu)
    print(json.dumps({"scene": scene,
                      "adaptive_mse_per_second_vs_uniform": round(ratio, 3)}),
          flush=True)


for p in ("/root/reference/inputs/horse_and_mug.xml",
          "/root/reference/inputs/low_poly.xml"):
    run_scene(p)
