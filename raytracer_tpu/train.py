"""Inverse-rendering CLI: ``python -m raytracer_tpu.train scene.xml
--target img.ppm [--fields mat_diffuse,light_int] [--steps N]``.

The product surface for the framework's flagship NEW capability (the
reference, /root/reference/raytracer.cpp, has no learning loop): given a
scene whose parameters are wrong and a target image of the true scene,
recover the parameters by Adam on an L2 image loss through the
differentiable wavefront renderer (parallel/train.py).  Rays and target
pixels are sharded over all local devices (the same 1-D ``rays`` mesh as
the render CLI); gradients are pmean'ed so parameter replicas stay
identical.

Targets: PPM/PNG (uint8 — radiance in the scene's 0-255 scale, the
quantization is absorbed by the L2 loss) or EXR (linear float, exact).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def _load_target(path: str) -> np.ndarray:
    ext = path.rsplit(".", 1)[-1].lower()
    if ext == "ppm":
        from raytracer_tpu.utils.ppm import read_ppm

        return read_ppm(path).astype(np.float32)
    if ext == "png":
        from raytracer_tpu.utils.png import read_png

        return read_png(path).astype(np.float32)
    if ext == "exr":
        from raytracer_tpu.utils.exr import read_exr

        return read_exr(path).astype(np.float32)
    raise SystemExit(f"unsupported target format: {path}")


def main(argv=None) -> None:
    from raytracer_tpu.parallel.train import PARAM_FIELDS

    ap = argparse.ArgumentParser(
        description="recover scene parameters from a target image "
                    "(differentiable inverse rendering)")
    ap.add_argument("scene", help="scene XML with the INITIAL (wrong) "
                                  "parameters")
    ap.add_argument("--target", required=True,
                    help="target image (ppm/png uint8 or exr linear float) "
                         "at the training resolution")
    ap.add_argument("--fields", default="mat_diffuse",
                    help="comma-separated SceneData fields to optimize "
                         f"(subset of {','.join(PARAM_FIELDS)})")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--lr", type=float, default=3e-2)
    ap.add_argument("--batch", type=int, default=0,
                    help="rays per step (0 = the whole frame each step; "
                         "otherwise a fresh random pixel subset per step)")
    ap.add_argument("--camera", type=int, default=0,
                    help="camera index in the scene XML")
    ap.add_argument("--downscale", type=int, default=1,
                    help="divide the camera resolution by this factor "
                         "(target must match the reduced resolution)")
    ap.add_argument("--engine", choices=["brute", "bvh", "cluster"],
                    default="cluster")
    ap.add_argument("--checkpoint", default=None,
                    help="train-state npz: resumed from if it exists, "
                         "saved to every --checkpoint-every steps")
    ap.add_argument("--checkpoint-every", type=int, default=50)
    ap.add_argument("--mesh", default="auto", metavar="auto|N",
                    help="device mesh size (auto = all local devices)")
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--out", default=None,
                    help="write the final recovered render here (ppm)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import optax

    from raytracer_tpu.models.bvh import build_bvh
    from raytracer_tpu.models.scene import load_scene
    from raytracer_tpu.ops.camera import eye_rays
    from raytracer_tpu.parallel.mesh import make_mesh, ray_sharding, replicated
    from raytracer_tpu.parallel.train import (
        apply_params, init_state, make_train_step,
    )
    from raytracer_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()
    fields = tuple(f.strip() for f in args.fields.split(",") if f.strip())
    bad = [f for f in fields if f not in PARAM_FIELDS]
    if bad:
        raise SystemExit(f"unknown fields {bad}; choose from {PARAM_FIELDS}")

    from raytracer_tpu.parallel.distributed import initialize
    from raytracer_tpu.parallel.mesh import mesh_from_arg

    initialize()  # env-gated no-op off-pod
    mesh = mesh_from_arg(args.mesh) or make_mesh(n=1)
    print(f"Training on {mesh.size} device(s), fields={list(fields)}")

    data, meta = load_scene(args.scene)
    accel = None
    if args.engine != "brute":
        bvh = build_bvh(data, meta)
        if args.engine == "cluster":
            from raytracer_tpu.models.clusters import build_clusters

            accel = build_clusters(data, meta, bvh)
        else:
            accel = bvh
    cam = meta.cameras[args.camera]
    if args.downscale > 1:
        cam = dataclasses.replace(
            cam, width=cam.width // args.downscale,
            height=cam.height // args.downscale)
    target = _load_target(args.target)
    if target.shape != (cam.height, cam.width, 3):
        raise SystemExit(
            f"target shape {target.shape} != camera resolution "
            f"({cam.height}, {cam.width}, 3); use --downscale to match")

    origin, dirs = eye_rays(cam)
    dirs_all = np.asarray(dirs, np.float32)
    target_all = target.reshape(-1, 3)
    r_total = dirs_all.shape[0]

    if args.batch > 0:
        batch = max(args.batch - args.batch % mesh.size, mesh.size)
    else:
        batch = r_total
    if batch >= r_total:
        # whole-frame mode (explicit batch clamped down to it too): trim
        # the non-divisible tail ONCE (a fixed subset, uploaded once)
        # instead of silently degrading to a fresh random near-full
        # minibatch with a per-step host->device upload
        drop = r_total % mesh.size
        if drop:
            print(f"note: dropping {drop} of {r_total} rays so the "
                  f"frame divides the {mesh.size}-device mesh")
            dirs_all = dirs_all[: r_total - drop]
            target_all = target_all[: r_total - drop]
            r_total -= drop
        batch = r_total

    data = jax.device_put(data, replicated(mesh))
    if accel is not None:
        accel = jax.device_put(accel, replicated(mesh))
    origin = jnp.asarray(origin, jnp.float32)

    optimizer = optax.adam(args.lr)
    state = init_state(data, optimizer, fields=fields)
    if args.checkpoint and os.path.exists(args.checkpoint):
        from raytracer_tpu.utils.checkpoint import load_train_state

        state = load_train_state(args.checkpoint, state)
        print(f"Resumed train state from {args.checkpoint}")
    state = jax.device_put(state, replicated(mesh))
    ldr = not args.target.lower().endswith(".exr")
    step_fn = make_train_step(meta, mesh, optimizer, engine=args.engine,
                              ldr=ldr)

    shard = ray_sharding(mesh)
    rng = np.random.default_rng(args.seed)
    if batch >= r_total:
        d_dev = jax.device_put(jnp.asarray(dirs_all), shard)
        t_dev = jax.device_put(jnp.asarray(target_all), shard)

    t0 = time.perf_counter()
    loss = float("nan")
    for i in range(args.steps):
        if batch < r_total:
            idx = rng.choice(r_total, size=batch, replace=False)
            d_dev = jax.device_put(jnp.asarray(dirs_all[idx]), shard)
            t_dev = jax.device_put(jnp.asarray(target_all[idx]), shard)
        state, loss = step_fn(state, data, origin, d_dev, t_dev, bvh=accel)
        if (i + 1) % args.log_every == 0 or i == 0:
            print(f"step {i + 1:5d}  loss {float(loss):.6f}  "
                  f"({(time.perf_counter() - t0) / (i + 1):.3f} s/step)",
                  flush=True)
        if (args.checkpoint and (i + 1) % args.checkpoint_every == 0):
            from raytracer_tpu.utils.checkpoint import save_train_state

            save_train_state(args.checkpoint, jax.device_get(state))
    print(f"Final loss: {float(loss):.6f} after {args.steps} steps "
          f"({time.perf_counter() - t0:.1f} s)")
    if args.checkpoint:
        from raytracer_tpu.utils.checkpoint import save_train_state

        save_train_state(args.checkpoint, jax.device_get(state))
        print(f"Saved train state to {args.checkpoint}")

    if args.out:
        from raytracer_tpu.models.whitted import render_camera
        from raytracer_tpu.ops.image import quantize
        from raytracer_tpu.utils.ppm import write_ppm

        recovered = apply_params(jax.device_get(data), state.params)
        img = quantize(render_camera(recovered, meta, cam, bvh=accel,
                                     engine=args.engine))
        write_ppm(args.out, np.asarray(img))
        print(f"Wrote recovered render to {args.out}")


if __name__ == "__main__":
    main()
