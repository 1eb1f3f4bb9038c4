"""Headline inverse-rendering evidence (VERDICT round-4 item 7).

Two recoveries on a MESH scene (bunny), both through the cluster
engine's differentiable path (ops.shade.refine_hit re-derives smooth
quantities from kernel hit ids; fixed-hit-topology convention):

  A. light: perturb light_pos by a ~10% offset and light_int by 1.4x,
     optimize ONLY (light_pos, light_int) against a float radiance
     target rendered at the true parameters.
  B. geometry: jitter every vertex with N(0, sigma) at small amplitude
     (sigma = 0.2% of the scene diagonal), optimize `vertices`.
     The accel (BVH/clusters) is built from the PERTURBED geometry and
     held fixed — sound at this amplitude up to silhouette-class pixels.

Prints JSON convergence rows (loss + recovered-vs-true errors) for the
BASELINE.md table, using the PRODUCT train step (parallel.train.
make_train_step on a 1-device mesh — the same code path the CLI runs).
"""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import optax
from jax.sharding import Mesh

from raytracer_tpu.utils.compile_cache import enable
enable()
from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.models.whitted import render_camera
from raytracer_tpu.ops.camera import eye_rays
from raytracer_tpu.parallel.train import (
    TrainState, apply_params, extract_params, init_state, make_train_step,
)
from raytracer_tpu.parallel.mesh import RAY_AXIS
import dataclasses

SCENE = "/root/reference/inputs/bunny.xml"
RES = 128
STEPS = 300
LOG_EVERY = 50


def setup(data_true, meta):
    cam = dataclasses.replace(meta.cameras[0], width=RES, height=RES)
    accel = build_clusters(data_true, meta, build_bvh(data_true, meta))
    target = render_camera(data_true, meta, cam, bvh=accel,
                           engine="cluster")  # float radiance target
    origin, dirs = eye_rays(cam)
    return cam, jnp.asarray(target).reshape(-1, 3), \
        jnp.asarray(origin, jnp.float32), jnp.asarray(dirs, jnp.float32)


def run(task, data_true, data_pert, meta, fields, opt, err_fns):
    cam, target, origin, dirs = setup(data_true, meta)
    # accel from the AVAILABLE (perturbed) scene — what a user has
    accel = jax.device_put(
        build_clusters(data_pert, meta, build_bvh(data_pert, meta)))
    data_pert = jax.device_put(data_pert)
    mesh = Mesh(np.array(jax.devices()[:1]), (RAY_AXIS,))
    state = init_state(data_pert, opt, fields=fields)
    step_fn = make_train_step(meta, mesh, opt, engine="cluster", ldr=False)
    t0 = time.perf_counter()
    for i in range(STEPS + 1):
        if i % LOG_EVERY == 0:
            row = {"task": task, "step": i}
            for name, fn in err_fns.items():
                row[name] = round(float(fn(state.params)), 5)
            if i > 0:
                row["loss"] = round(float(loss), 5)
                row["s_per_step"] = round(
                    (time.perf_counter() - t0) / i, 3)
            print(json.dumps(row), flush=True)
        if i == STEPS:
            break
        state, loss = step_fn(state, data_pert, origin, dirs, target,
                              bvh=accel)
    return state


def main():
    data_true, meta = load_scene(SCENE)
    rng = np.random.default_rng(7)

    # ---- A: light position + intensity ----------------------------------
    lp_true = np.asarray(data_true.light_pos)
    li_true = np.asarray(data_true.light_int)
    scale = float(np.abs(lp_true).max())
    lp0 = lp_true + rng.normal(0, 0.1 * scale, lp_true.shape).astype(np.float32)
    li0 = li_true * 1.4
    data_a = dataclasses.replace(
        data_true, light_pos=jnp.asarray(lp0, jnp.float32),
        light_int=jnp.asarray(li0, jnp.float32))
    print(json.dumps({"task": "light", "scene": "bunny",
                      "init_lp_err": round(float(
                          np.linalg.norm(lp0 - lp_true)), 4),
                      "init_li_relerr": 0.4}), flush=True)
    # per-field learning rates: adam's unit step cannot traverse an
    # O(1e3) intensity error at lr 0.05 (measured: li frozen at 1.4x
    # over 150 steps), while a CONSTANT magnitude-scaled step thrashes
    # the image and drags the position off (measured: lp_err 0.08 ->
    # 0.50 divergence).  Cosine-decayed per-field schedules fix both.
    li_scale = float(np.abs(li_true).mean())
    opt_light = optax.multi_transform(
        {"pos": optax.adam(optax.cosine_decay_schedule(0.03, STEPS)),
         "int": optax.adam(optax.cosine_decay_schedule(
             0.01 * li_scale, STEPS))},
        {"light_pos": "pos", "light_int": "int"})
    run("light", data_true, data_a, meta, ("light_pos", "light_int"),
        opt=opt_light,
        err_fns={
            "lp_err": lambda p: jnp.linalg.norm(
                p["light_pos"] - lp_true),
            "li_relerr": lambda p: jnp.linalg.norm(
                p["light_int"] - li_true) / np.linalg.norm(li_true),
        })

    # ---- B: vertex jitter ----------------------------------------------
    v_true = np.asarray(data_true.vertices)
    diag = float(np.linalg.norm(v_true.max(0) - v_true.min(0)))
    sigma = 0.002 * diag
    v0 = v_true + rng.normal(0, sigma, v_true.shape).astype(np.float32)
    data_b = dataclasses.replace(data_true,
                                 vertices=jnp.asarray(v0, jnp.float32))
    print(json.dumps({"task": "vertices", "scene": "bunny",
                      "sigma": round(sigma, 5), "diag": round(diag, 3),
                      "init_vrmse": round(float(np.sqrt(
                          ((v0 - v_true) ** 2).mean())), 6)}), flush=True)
    # vertex steps must stay well below sigma (adam moves ~lr/step per
    # coordinate; lr 2e-4 walked 80x sigma in 200 steps and the loss
    # sat in a noise ball)
    run("vertices", data_true, data_b, meta, ("vertices",),
        opt=optax.adam(optax.cosine_decay_schedule(2e-5, STEPS)),
        err_fns={
            "v_rmse": lambda p: jnp.sqrt(
                jnp.mean((p["vertices"] - v_true) ** 2)),
        })


main()
