"""Measure adaptive sampling on real TPU: quality-per-sample vs uniform.

horse_and_mug, cluster engine.  Truth = 64-spp jittered render.  Compare
uniform 16-spp (SSAA 4x jitter) against adaptive base-4 + 12-extra on the
noisiest 12.5% of blocks (mean 5.5 spp) — the claim under test is that
adaptive reaches uniform-16spp edge quality at ~1/3 the samples.
Also spot-checks the EXR HDR path on device output.
"""

import time

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
import jax

SCENE = "/root/reference/inputs/horse_and_mug.xml"
data, meta = load_scene(SCENE)
bvh = build_bvh(data, meta)
accel = jax.device_put(build_clusters(data, meta, bvh))
data = jax.device_put(data)
cam = meta.cameras[0]

def _sync(x):
    # NOTE: jax.block_until_ready does NOT reliably drain the device
    # queue through the axon tunnel (a 66M-ray render "completed" in
    # 11 ms and its work leaked into later timings).  A 4-byte scalar
    # reduction fetch is the only trustworthy sync here — same device
    # sync bench.py uses.
    return float(jnp.sum(jnp.asarray(x).astype(jnp.float32)))


def timed(label, fn):
    out = fn()
    _sync(out)  # compile + drain
    t0 = time.perf_counter()
    out = fn()
    _sync(out)
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.3f} s")
    return np.asarray(out), dt

truth, _ = timed("truth 64spp jitter", lambda: render_camera_streamed(
    data, meta, cam, bvh=accel, engine="cluster", ssaa=8,
    ssaa_mode="jitter", chunk=1 << 21))
uni16, t_uni = timed("uniform 16spp jitter", lambda: render_camera_streamed(
    data, meta, cam, bvh=accel, engine="cluster", ssaa=4,
    ssaa_mode="jitter", chunk=1 << 21))
adap, t_ad = timed("adaptive 4+12@12.5%", lambda: render_camera_adaptive(
    data, meta, cam, bvh=accel, engine="cluster", base_spp=4,
    extra_spp=12, refine_frac=0.125)[0])
adap8, _ = np.asarray(quantize(jnp.asarray(adap))), None
base4, t_b4 = timed("uniform 4spp (adaptive base only)",
                    lambda: render_camera_adaptive(
                        data, meta, cam, bvh=accel, engine="cluster",
                        base_spp=4, extra_spp=0)[0])
base8 = np.asarray(quantize(jnp.asarray(base4)))

t64 = truth.astype(np.float64)
for label, img, dt in (("uniform16", uni16.astype(np.float64), t_uni),
                       ("adaptive5.5", adap8.astype(np.float64), t_ad),
                       ("uniform4", base8.astype(np.float64), t_b4)):
    d = img - t64
    print(f"{label}: MSE vs truth {np.mean(d * d):.4f}  "
          f"p99.9|d| {np.percentile(np.abs(d), 99.9):.1f}  time {dt:.3f} s")

# EXR HDR spot-check: device radiance -> half EXR -> read back -> quantize
from raytracer_tpu.utils.exr import read_exr, write_exr  # noqa: E402

write_exr("/tmp/horse.exr", adap)
back = read_exr("/tmp/horse.exr")
q1, q2 = np.asarray(quantize(jnp.asarray(back))), adap8
print(f"exr roundtrip: max|dq| {np.abs(q1.astype(int) - q2.astype(int)).max()}"
      f"  frac_diff {(q1 != q2).mean():.2e}")
