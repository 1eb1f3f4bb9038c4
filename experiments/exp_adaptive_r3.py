"""Round-3 adaptive re-measurement on real TPU: uniform vs single-round
vs MULTI-ROUND refinement at matched sample budgets (horse_and_mug,
cluster engine, round-3 kernels).

The multi-round claim under test: re-scoring block variance from
accumulated statistics between passes drops false-positive blocks and
re-concentrates the budget, buying lower MSE at the SAME mean spp.
"""

import json
import time

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

SCENE = "/root/reference/inputs/horse_and_mug.xml"
data, meta = load_scene(SCENE)
bvh = build_bvh(data, meta)
accel = jax.device_put(build_clusters(data, meta, bvh))
data = jax.device_put(data)
cam = meta.cameras[0]


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


truth, _ = timed(lambda: render_camera_streamed(
    data, meta, cam, bvh=accel, engine="cluster", ssaa=8,
    ssaa_mode="jitter", chunk=1 << 21))
tq = np.asarray(quantize(jnp.asarray(truth))).astype(np.int64)


def report(name, img, dt, spp):
    q = np.asarray(quantize(jnp.asarray(img))).astype(np.int64)
    err = np.abs(q - tq)
    print(json.dumps({
        "config": name, "mean_spp": round(spp, 2), "time_s": round(dt, 3),
        "mse": round(float((err.astype(np.float64) ** 2).mean()), 3),
        "p999": int(np.percentile(err, 99.9)),
    }), flush=True)


img, dt = timed(lambda: render_camera_streamed(
    data, meta, cam, bvh=accel, engine="cluster", ssaa=2,
    ssaa_mode="jitter", chunk=1 << 21))
report("uniform 4spp", img, dt, 4)

img, dt = timed(lambda: render_camera_streamed(
    data, meta, cam, bvh=accel, engine="cluster", ssaa=4,
    ssaa_mode="jitter", chunk=1 << 21))
report("uniform 16spp", img, dt, 16)

for rounds in (1, 2, 3):
    out = timed(lambda: render_camera_adaptive(
        data, meta, cam, bvh=accel, engine="cluster", base_spp=4,
        extra_spp=12, refine_frac=0.125, rounds=rounds)[0])
    _, stats = render_camera_adaptive(
        data, meta, cam, bvh=accel, engine="cluster", base_spp=4,
        extra_spp=12, refine_frac=0.125, rounds=rounds)
    report(f"adaptive 4+12@12.5% rounds={rounds}", out[0], out[1],
           stats["mean_spp"])
