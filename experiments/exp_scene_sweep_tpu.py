"""Per-scene sustained throughput certification on the real TPU chip.

Renders every bundled scene (every camera) with the flagship Pallas
cluster engine and measures steady-state device throughput (mean over 4
pipelined frames, one scalar-reduction sync — bench.py methodology).
Results append to experiments/r3_scene_sweep.jsonl so partial progress
survives a tunnel wedge; re-running skips scenes already recorded.
"""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from raytracer_tpu.utils.compile_cache import enable
enable()
from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.models.whitted import render_camera

OUT = (sys.argv[1] if len(sys.argv) > 1 else
       os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "r3_scene_sweep.jsonl"))
SCENES = ["simple", "simple_shading", "simple_reflectance", "mirror_spheres",
          "cornellbox", "bunny", "monkey", "low_poly", "berserker",
          "dragon_lowres", "marbles", "car", "horse_and_mug"]

done = set()
if os.path.exists(OUT):
    with open(OUT) as f:
        for line in f:
            done.add(json.loads(line)["image"])

# The FIRST scene rendered in a fresh process reads ~9x slow even after two
# synced warmup frames (BASELINE.md measurement note) — burn that artifact on
# a throwaway render so the first recorded row is trustworthy without a
# manual re-measure.
_wdata, _wmeta = load_scene("/root/reference/inputs/simple.xml")
_wbvh = build_bvh(_wdata, _wmeta)
_waccel = jax.device_put(build_clusters(_wdata, _wmeta, _wbvh))
_wdata = jax.device_put(_wdata)
for _ in range(3):
    float(jnp.sum(render_camera(_wdata, _wmeta, _wmeta.cameras[0],
                                bvh=_waccel, engine="cluster",
                                chunk=1 << 21)))

for scene in SCENES:
    path = f"/root/reference/inputs/{scene}.xml"
    data, meta = load_scene(path)
    bvh = build_bvh(data, meta)
    accel = jax.device_put(build_clusters(data, meta, bvh))
    data = jax.device_put(data)
    for ci, cam in enumerate(meta.cameras):
        img_name = f"{scene}[{ci}]"
        if img_name in done:
            continue
        def run():
            img = render_camera(data, meta, cam, bvh=accel,
                                engine="cluster", chunk=1 << 21)
            return float(jnp.sum(img))
        run(); run()
        n = 4
        t0 = time.perf_counter()
        imgs = [render_camera(data, meta, cam, bvh=accel, engine="cluster",
                              chunk=1 << 21) for _ in range(n)]
        s = float(sum(jnp.sum(im) for im in imgs))
        assert s == s, img_name
        dt = (time.perf_counter() - t0) / n
        rays = cam.width * cam.height
        row = {"image": img_name, "w": cam.width, "h": cam.height,
               "ms_per_frame": round(dt * 1e3, 1),
               "mrays_per_s": round(rays / dt / 1e6, 2)}
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)
