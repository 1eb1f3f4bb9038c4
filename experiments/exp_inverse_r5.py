"""Headline inverse-rendering evidence (VERDICT round-4 item 7).

Recoveries on a MESH scene (bunny, 128^2), all through the cluster
engine's differentiable path (ops.shade.refine_hit re-derives smooth
quantities — including shading normals — from kernel hit ids) and the
PRODUCT train step (parallel.train.make_train_step on a 1-device mesh,
the same code path the CLI runs):

  light_pos   : position-only recovery (intensity known).
  light_int   : intensity-only recovery (position known).
  light_joint : both free, per-field cosine-decayed learning rates.
                Measured identifiability limit: a diffuse-dominated
                scene has a shallow I/d^2 sliding valley — runs land at
                loss ~0.3 (vs 1e-10 at truth, 78 at a 0.28 offset)
                with pos/int errors trading off; recorded honestly.
  vertices    : N(0, sigma) jitter at sigma = 0.2% of the scene
                diagonal, with the accel REBUILT from current params
                every 25 steps — measured: a stale accel SHIFTS the
                optimum (loss 108 at v_true under the perturbed-geometry
                accel vs 1e-10 under the matching accel), so fixed-accel
                optimization converges to the wrong point by design,
                not by gradient failure.

Prints JSON convergence rows (loss + recovered-vs-true errors) for the
BASELINE.md table.
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
    apply_params, init_state, make_train_step,
)
from raytracer_tpu.parallel.mesh import RAY_AXIS
import dataclasses

SCENE = "/root/reference/inputs/bunny.xml"
RES = 128
LOG_EVERY = 50


def setup(data_true, meta):
    cam = dataclasses.replace(meta.cameras[0], width=RES, height=RES)
    accel = build_clusters(data_true, meta, build_bvh(data_true, meta))
    target = render_camera(data_true, meta, cam, bvh=accel,
                           engine="cluster")  # float radiance target
    origin, dirs = eye_rays(cam)
    return cam, jnp.asarray(target).reshape(-1, 3), \
        jnp.asarray(origin, jnp.float32), jnp.asarray(dirs, jnp.float32)


def run(task, data_true, data_pert, meta, fields, opt, err_fns, steps,
        rebuild_every=0):
    cam, target, origin, dirs = setup(data_true, meta)
    accel = jax.device_put(
        build_clusters(data_pert, meta, build_bvh(data_pert, meta)))
    data_dev = jax.device_put(data_pert)
    mesh = Mesh(np.array(jax.devices()[:1]), (RAY_AXIS,))
    state = init_state(data_pert, opt, fields=fields)
    step_fn = make_train_step(meta, mesh, opt, engine="cluster", ldr=False)
    t0 = time.perf_counter()
    loss = float("nan")
    for i in range(steps + 1):
        if i % LOG_EVERY == 0:
            row = {"task": task, "step": i}
            for name, fn in err_fns.items():
                row[name] = round(float(fn(state.params)), 5)
            if i > 0:
                row["loss"] = round(float(loss), 5)
                row["s_per_step"] = round((time.perf_counter() - t0) / i, 3)
            print(json.dumps(row), flush=True)
        if i == steps:
            break
        if rebuild_every and i > 0 and i % rebuild_every == 0:
            cur = apply_params(jax.device_get(data_pert),
                               jax.device_get(state.params))
            accel = jax.device_put(
                build_clusters(cur, meta, build_bvh(cur, meta)))
        state, loss = step_fn(state, data_dev, origin, dirs, target,
                              bvh=accel)
    return state


def main():
    data_true, meta = load_scene(SCENE)
    rng = np.random.default_rng(7)

    lp_true = np.asarray(data_true.light_pos)
    li_true = np.asarray(data_true.light_int)
    li_scale = float(np.abs(li_true).mean())
    scale = float(np.abs(lp_true).max())
    lp0 = lp_true + rng.normal(0, 0.1 * scale,
                               lp_true.shape).astype(np.float32)
    li0 = (li_true * 1.4).astype(np.float32)
    lp_err = lambda p: jnp.linalg.norm(p["light_pos"] - lp_true)
    li_rel = lambda p: jnp.linalg.norm(
        p["light_int"] - li_true) / np.linalg.norm(li_true)
    print(json.dumps({"setup": "light", "scene": "bunny",
                      "init_lp_err": round(float(np.linalg.norm(
                          lp0 - lp_true)), 4),
                      "init_li_relerr": 0.4, "li_scale": li_scale}),
          flush=True)

    data_a = dataclasses.replace(data_true,
                                 light_pos=jnp.asarray(lp0))
    run("light_pos", data_true, data_a, meta, ("light_pos",),
        opt=optax.adam(optax.cosine_decay_schedule(0.02, 200)),
        err_fns={"lp_err": lp_err}, steps=200)

    data_b = dataclasses.replace(data_true,
                                 light_int=jnp.asarray(li0))
    run("light_int", data_true, data_b, meta, ("light_int",),
        opt=optax.adam(optax.cosine_decay_schedule(0.005 * li_scale, 150)),
        err_fns={"li_relerr": li_rel}, steps=150)

    data_c = dataclasses.replace(data_true, light_pos=jnp.asarray(lp0),
                                 light_int=jnp.asarray(li0))
    opt_joint = optax.multi_transform(
        {"pos": optax.adam(optax.cosine_decay_schedule(0.02, 300)),
         "int": optax.adam(optax.cosine_decay_schedule(
             0.005 * li_scale, 300))},
        {"light_pos": "pos", "light_int": "int"})
    run("light_joint", data_true, data_c, meta, ("light_pos", "light_int"),
        opt=opt_joint, err_fns={"lp_err": lp_err, "li_relerr": li_rel},
        steps=300)

    # ---- vertices with periodic accel rebuild -------------------------
    v_true = np.asarray(data_true.vertices)
    diag = float(np.linalg.norm(v_true.max(0) - v_true.min(0)))
    sigma = 0.002 * diag
    v0 = v_true + rng.normal(0, sigma, v_true.shape).astype(np.float32)
    data_d = dataclasses.replace(data_true,
                                 vertices=jnp.asarray(v0, jnp.float32))
    print(json.dumps({"setup": "vertices", "scene": "bunny",
                      "sigma": round(sigma, 6), "diag": round(diag, 3),
                      "init_vrmse": round(float(np.sqrt(
                          ((v0 - v_true) ** 2).mean())), 6)}), flush=True)
    run("vertices", data_true, data_d, meta, ("vertices",),
        opt=optax.adam(optax.cosine_decay_schedule(3e-5, 300)),
        err_fns={"v_rmse": lambda p: jnp.sqrt(
            jnp.mean((p["vertices"] - v_true) ** 2))},
        steps=300, rebuild_every=25)


main()
