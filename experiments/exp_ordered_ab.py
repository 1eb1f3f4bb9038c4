"""Ordered-descent A/B on the real bvh engine (VERDICT round-4 item 6).

Times render_camera(engine='bvh') with and without the octant threads on
bunny and dragon_lowres, on the current default device (run once under
JAX_PLATFORMS=cpu — the engine's CPU-sweep role — and once on TPU), and
checks result parity between the two walks (identical up to the
documented exact-t tie class; asserted bitwise here, pinned on these
scenes).
"""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
if os.environ.get("ORDERED_AB_CPU"):
    # JAX_PLATFORMS alone is not honored under the axon sitecustomize;
    # the config update after import is (see .claude/skills/verify)
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.models.whitted import render_camera

for path in ("/root/reference/inputs/bunny.xml",
             "/root/reference/inputs/dragon_lowres.xml"):
    scene = os.path.basename(path).replace(".xml", "")
    data, meta = load_scene(path)
    data = jax.device_put(data)
    out = {"scene": scene, "device": jax.devices()[0].platform}
    imgs = {}
    for name, ordered in (("plain", False), ("ordered", True)):
        bvh = jax.device_put(build_bvh(data, meta, ordered=ordered))
        cam = meta.cameras[0]

        def run():
            img = render_camera(data, meta, cam, bvh=bvh, engine="bvh")
            return img

        float(jnp.sum(run()))
        t0 = time.perf_counter()
        reps = 2
        s = float(sum(jnp.sum(run()) for _ in range(reps)))
        assert s == s
        dt = (time.perf_counter() - t0) / reps
        out[name + "_s"] = round(dt, 3)
        imgs[name] = np.asarray(run())
    out["speedup"] = round(out["plain_s"] / out["ordered_s"], 3)
    out["bitwise_equal"] = bool((imgs["plain"] == imgs["ordered"]).all())
    print(json.dumps(out), flush=True)
