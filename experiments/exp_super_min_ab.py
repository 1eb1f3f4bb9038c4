"""A/B: row-granularity hierarchical mask gate at cpad=256 (horse).

VERDICT round-4 item 1: extend the hierarchical gate below
_SUPER_MIN_CPAD (today it engages only above 512 columns, so horse's
cpad=256 exact-mask waves pay the flat kernel).  This is the one gate
granularity the existing Mosaic-compatible kernel supports (chunk = one
full 128-cluster lane row); sub-row granularities need a transposed
kernel whose arithmetic is bounded in exp_subchunk_stats.py + ROADMAP.

Runs horse_and_mug steady-state (8 pipelined frames, scalar sync — the
bench.py protocol) in a FRESH SUBPROCESS per config (the hier decision
is trace-time, and jit caches key on shapes only):

  RAYTRACER_SUPER_MIN_CPAD=512  -> flat mask (production default)
  RAYTRACER_SUPER_MIN_CPAD=128  -> hier gate engages (n_chunks=2)

and asserts the two renders are bitwise identical.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, %r)
import jax, jax.numpy as jnp, numpy as np
from raytracer_tpu.utils.compile_cache import enable
enable()
from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.models.whitted import render_camera
import raytracer_tpu.ops.cluster_trace as ct

data, meta = load_scene("/root/reference/inputs/horse_and_mug.xml")
accel = jax.device_put(build_clusters(data, meta, build_bvh(data, meta)))
data = jax.device_put(data)
cam = meta.cameras[0]

def run():
    img = render_camera(data, meta, cam, bvh=accel, engine="cluster",
                        chunk=1 << 21)
    return img

float(jnp.sum(run())); float(jnp.sum(run()))   # compile + warm
n = 8
t0 = time.perf_counter()
imgs = [run() for _ in range(n)]
s = float(sum(jnp.sum(im) for im in imgs))
dt = (time.perf_counter() - t0) / n
img = np.asarray(run())
print(json.dumps({
    "super_min_cpad": ct._SUPER_MIN_CPAD,
    "frame_ms": round(dt * 1e3, 2),
    "mrays_per_s": round(cam.width * cam.height / dt / 1e6, 3),
    "checksum": float(s),
    "sha": __import__("hashlib").sha256(img.tobytes()).hexdigest()[:16],
}), flush=True)
""" % (REPO,)


def run_cfg(v):
    env = dict(os.environ, RAYTRACER_SUPER_MIN_CPAD=str(v))
    out = subprocess.run([sys.executable, "-c", CHILD], env=env,
                         capture_output=True, text=True, timeout=900)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not line:
        print(out.stdout[-2000:], out.stderr[-2000:])
        raise SystemExit(f"config {v} failed")
    return json.loads(line[-1])


flat = run_cfg(512)
print(json.dumps(flat), flush=True)
hier = run_cfg(128)
print(json.dumps(hier), flush=True)
assert flat["sha"] == hier["sha"], "hier gate changed the image!"
print(json.dumps({
    "ab": "horse cpad=256 row-gate",
    "flat_ms": flat["frame_ms"], "hier_ms": hier["frame_ms"],
    "speedup": round(flat["frame_ms"] / hier["frame_ms"], 4),
    "bitwise_equal": True,
}), flush=True)
