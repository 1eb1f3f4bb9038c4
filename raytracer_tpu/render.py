"""CLI driver: ``python -m raytracer_tpu.render scene.xml [options]``.

Mirrors the reference's main (/root/reference/raytracer.cpp:487-525): loads
the scene, builds the BVH ("plants trees"), renders every camera in the
file, and writes one PPM per camera to the working directory, printing
per-phase timings and ray throughput.  SSAA defaults to the reference's
committed configuration (2x per dimension, raytracer.cpp:26-28); pass
``--ssaa 1`` for golden-parity renders (the bundled goldens are no-AA).
"""

from __future__ import annotations

import argparse
import time

import jax
import numpy as np

from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.models.whitted import render_camera


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="TPU-native Whitted ray tracer")
    ap.add_argument("scene", help="scene XML (CENG477 format)")
    ap.add_argument("--ssaa", type=int, default=2,
                    help="supersampling factor per dimension (1 = off)")
    ap.add_argument("--ssaa-mode",
                    choices=["parity", "mean", "jitter", "adaptive"],
                    default="parity",
                    help="parity: uint8 truncating box filter like the "
                         "reference; mean: float mean before quantization; "
                         "jitter: stochastic sub-pixel sample offsets + "
                         "float mean (quality extension, non-parity); "
                         "adaptive: variance-driven refinement — every "
                         "pixel gets ssaa^2 jittered samples, the noisiest "
                         "--adaptive-frac of pixel blocks get "
                         "--adaptive-extra more (ops/adaptive.py)")
    ap.add_argument("--adaptive-frac", type=float, default=0.125,
                    help="adaptive mode: fraction of pixel blocks refined")
    ap.add_argument("--adaptive-extra", type=int, default=None,
                    help="adaptive mode: extra samples for refined blocks "
                         "(default 3x the base ssaa^2; split across "
                         "--adaptive-rounds)")
    ap.add_argument("--adaptive-rounds", type=int, default=1,
                    help="adaptive mode: refinement passes; each pass "
                         "re-scores block variance from the accumulated "
                         "samples and gives the currently-noisiest blocks "
                         "extra/rounds more samples")
    ap.add_argument("--seed", type=int, default=0,
                    help="PRNG seed for the stochastic sampling modes "
                         "(jitter/adaptive); same seed = same image")
    ap.add_argument("--engine", choices=["auto", "brute", "bvh", "cluster"],
                    default="auto")
    ap.add_argument("--mesh", default="auto", metavar="auto|N",
                    help="device mesh size: 'auto' (default) shards the "
                         "ray axis over ALL local devices — the "
                         "zero-config analog of the reference's "
                         "hardware_concurrency() thread fan-out "
                         "(raytracer.cpp:367-377); an integer uses the "
                         "first N devices (1 = single-device)")
    ap.add_argument("--relaxed-parity", action="store_true",
                    help="sqrt/div-free sphere occlusion sign tests in the "
                         "cluster engine's shadow kernels (algebraically "
                         "identical acceptance; grazing-sphere pairs may "
                         "flip isolated shadow bits under f32 rounding). "
                         "Default off = bitwise reference parity")
    ap.add_argument("--bfc", action="store_true",
                    help="cull backfacing triangles (the TA outputs/ golden "
                         "semantics; the reference code never culls, "
                         "matching outputs_nobfc/)")
    ap.add_argument("--chunk", type=int, default=1 << 22,
                    help="rays per device dispatch")
    ap.add_argument("--accel-cache", metavar="PATH", default=None,
                    help="load acceleration structures from PATH if it "
                         "exists, else build and save them there (the npz "
                         "is self-describing; utils/checkpoint.py)")
    ap.add_argument("--out-dir", default=".", help="output directory")
    ap.add_argument("--format", choices=["ppm", "png", "exr"], default="ppm",
                    help="output image format: ppm (reference-parity ASCII "
                         "P3, the scene XML's declared name), png "
                         "(8-bit RGB, ~50x smaller; extension swapped), or "
                         "exr (HDR: linear float radiance before "
                         "quantization, half-float scanline OpenEXR; SSAA "
                         "reduces as a float mean — parity's uint8 "
                         "truncating filter is meaningless pre-quantization)")
    ap.add_argument("--tone", choices=["none", "gamma", "reinhard", "aces"],
                    default="none",
                    help="tone-map linear radiance before 8-bit output "
                         "(ppm/png; exr stays linear) — quality extension, "
                         "non-parity (ops.image.tone_map)")
    ap.add_argument("--repeat", type=int, default=1,
                    help="render repetitions for benchmarking")
    ap.add_argument("--json-metrics", action="store_true",
                    help="print one structured JSON metrics line per camera")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture a jax.profiler trace of the renders into DIR")
    ap.add_argument("--debug-nans", action="store_true",
                    help="enable jax_debug_nans (aborts on the first NaN)")
    args = ap.parse_args(argv)

    import contextlib
    import os

    from raytracer_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()  # verified to engage through the axon tunnel
    os.makedirs(args.out_dir, exist_ok=True)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    profile_cm = (
        jax.profiler.trace(args.profile) if args.profile
        else contextlib.nullcontext()
    )
    # multi-host bring-up first (env-gated no-op on single machines —
    # without it a pod run would see only local devices and every
    # process would write its own output)
    from raytracer_tpu.parallel.distributed import initialize

    initialize()
    # device mesh: every local chip by default, like the reference's
    # automatic hardware_concurrency() fan-out
    from raytracer_tpu.parallel.mesh import mesh_from_arg

    mesh = mesh_from_arg(args.mesh)
    if mesh is not None:
        print(f"Rendering with {mesh.size} devices "
              f"({mesh.devices.flat[0].platform}).")

    data, meta = load_scene(args.scene)
    if mesh is not None:
        from raytracer_tpu.parallel.mesh import replicated

        data = jax.device_put(data, replicated(mesh))
    else:
        data = jax.device_put(data)

    t0 = time.perf_counter()
    accel = None
    if args.engine != "brute":
        cached = None
        if args.accel_cache and os.path.exists(args.accel_cache):
            from raytracer_tpu.utils.checkpoint import load_accel

            cached = load_accel(args.accel_cache)
        if cached is not None:
            bvh, clusters = cached
        else:
            bvh = build_bvh(data, meta)
            clusters = None
        if args.engine == "bvh":
            accel = bvh
        else:  # cluster (and auto's preferred accelerator)
            if clusters is None:
                from raytracer_tpu.models.clusters import build_clusters

                clusters = build_clusters(data, meta, bvh)
                if args.accel_cache:
                    from raytracer_tpu.utils.checkpoint import save_accel

                    save_accel(args.accel_cache, bvh, clusters)
            accel = clusters
        if mesh is not None:
            from raytracer_tpu.parallel.mesh import replicated

            accel = jax.device_put(accel, replicated(mesh))
        else:
            accel = jax.device_put(accel)
    t1 = time.perf_counter()
    print(f"Planted trees in {t1 - t0:.3f} seconds.")
    if args.ssaa > 1:
        print(f"Super Sampling Anti aliasing is enabled. ({args.ssaa}*{args.ssaa}x)")
    elif args.ssaa_mode in ("mean", "jitter"):
        print(f"note: --ssaa-mode {args.ssaa_mode} has no effect at "
              "--ssaa 1 (supersampling is off)")

    t_render = 0.0
    with profile_cm:
        for _ in range(args.repeat):
            for cam in meta.cameras:
                from raytracer_tpu.pipeline import (
                    render_one_camera, write_image,
                )

                rcam = cam.scaled(args.ssaa) if args.ssaa > 1 else cam
                if args.ssaa_mode == "adaptive":
                    rcam = cam  # adaptive samples at final resolution
                print(f"Rendering {cam.image_name} "
                      f"({rcam.width}x{rcam.height}, engine={args.engine})...")
                t2 = time.perf_counter()
                img, adaptive_stats = render_one_camera(
                    data, meta, cam, accel, engine=args.engine,
                    ssaa=args.ssaa, ssaa_mode=args.ssaa_mode, bfc=args.bfc,
                    chunk=args.chunk, tone=args.tone,
                    hdr=args.format == "exr", seed=args.seed,
                    adaptive_frac=args.adaptive_frac,
                    adaptive_extra=args.adaptive_extra,
                    adaptive_rounds=args.adaptive_rounds,
                    mesh=mesh,
                    relaxed=args.relaxed_parity,
                )
                t3 = time.perf_counter()
                t_render += t3 - t2
                rays = rcam.width * rcam.height
                print(f"  {t3 - t2:.3f} s, {rays / (t3 - t2) / 1e6:.2f} Mrays/s (primary)")
                if args.json_metrics:
                    import json

                    line = {
                        "camera": cam.image_name,
                        "width": rcam.width, "height": rcam.height,
                        "primary_rays": rays,
                        "render_s": round(t3 - t2, 4),
                        "mrays_per_s": round(rays / (t3 - t2) / 1e6, 3),
                        "engine": args.engine, "ssaa": args.ssaa,
                        "n_tris": meta.n_tris, "n_spheres": meta.n_spheres,
                        "max_depth": meta.max_depth, "lights": meta.n_lights,
                    }
                    if adaptive_stats is not None:
                        line["adaptive"] = adaptive_stats
                    print(json.dumps(line))
                if jax.process_index() == 0:
                    # single writer, like the reference (ppm.cpp:4-39);
                    # every process holds the full image after the
                    # mesh gather
                    write_image(args.out_dir, cam.image_name, img,
                                args.format)
    print(f"Rendered in {t_render / args.repeat:.3f} seconds.")
    print(f"Total: {t_render / args.repeat + (t1 - t0):.3f} seconds.")


if __name__ == "__main__":
    main()
