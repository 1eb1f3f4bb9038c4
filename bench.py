"""Benchmark: horse_and_mug throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the reference C++ tracer's course-record run: 1440*720 rays in
0.452 s end-to-end (author's machine, /root/reference/README.md:1,8), i.e.
~2.29 M primary rays/s.  vs_baseline > 1 means faster than that machine.

METHODOLOGY (see BASELINE.md for the full discussion): the primary metric
is STEADY-STATE DEVICE THROUGHPUT — mean over 8 pipelined frames with one
scalar-reduction sync; compile, BVH build and image fetch are excluded.
The reference's 0.452 s is one cold end-to-end frame including its PPM
write, so this is not a like-for-like end-to-end comparison; the metric
name says "sustained" for that reason.  (A host colocated with real TPU
hardware fetches the 1 MB uint8 frame in ~1 ms; through this container's
~8 MB/s tunnel the fetch costs 0.13 s of pure tunnel artifact, so the
end-to-end figure is only measured in --full mode and recorded separately.)

--full additionally measures the reference README's big-workload
configurations (256x SSAA, low_poly 4x, 8K 4x — README.md:11,14,17)
through the row-band streamed renderer, plus single-frame end-to-end
latency including the uint8 image fetch.  Results are printed as extra
'#'-prefixed JSON lines (the driver contract stays one bare JSON line).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import numpy as np

SCENE = "/root/reference/inputs/horse_and_mug.xml"
LOW_POLY = "/root/reference/inputs/low_poly.xml"
FALLBACK = os.path.join(os.path.dirname(__file__), "tests", "data", "entry_scene.xml")
BASELINE_RAYS_PER_S = 1440 * 720 / 0.452
# author's machine, reference README.md:11,14,17
AUTHOR_S = {"horse_ssaa256": 40.0, "low_poly_ssaa4": 1.0, "horse_8k_ssaa4": 44.7}


def _load(scene_path):
    from raytracer_tpu.models.bvh import build_bvh
    from raytracer_tpu.models.clusters import build_clusters
    from raytracer_tpu.models.scene import load_scene

    data, meta = load_scene(scene_path)
    bvh = build_bvh(data, meta)
    accel = jax.device_put(build_clusters(data, meta, bvh))
    data = jax.device_put(data)
    return data, meta, accel


def main() -> None:
    import jax.numpy as jnp

    from raytracer_tpu.models.whitted import render_camera, render_camera_streamed
    from raytracer_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()

    full = "--full" in sys.argv
    scene = SCENE if os.path.exists(SCENE) else FALLBACK
    data, meta, accel = _load(scene)
    cam = meta.cameras[0]

    def run():
        img = render_camera(
            data, meta, cam, bvh=accel, engine="cluster", chunk=1 << 21
        )
        # sync via a 4-byte reduction: the tunneled dev box transfers at
        # ~8 MB/s, which would otherwise swamp the timing with an artifact
        # a colocated host never sees (the image itself stays on device)
        return float(jnp.sum(img))

    # The tunneled dev TPU occasionally wedges and recovers; retry the
    # whole warm+measure cycle rather than losing the round's metric.
    last_err = None
    for attempt in range(3):
        try:
            run()  # compile + warm caches
            run()
            # sustained throughput: dispatch a batch of independent frames
            # and sync once — frames pipeline on-device without host
            # round-trip bubbles (the deployment-relevant serving shape)
            n_frames = 8
            t0 = time.perf_counter()
            imgs = [
                render_camera(data, meta, cam, bvh=accel, engine="cluster",
                              chunk=1 << 21)
                for _ in range(n_frames)
            ]
            s = float(sum(jnp.sum(im) for im in imgs))
            assert s == s, "NaN in rendered frames"
            dt = (time.perf_counter() - t0) / n_frames
            break
        except Exception as e:  # noqa: BLE001 - report, wait, retry
            last_err = e
            print(f"# bench attempt {attempt + 1} failed: {e}", flush=True)
            time.sleep(90)
    else:
        raise SystemExit(f"bench failed after retries: {last_err}")

    rays = cam.width * cam.height
    rays_per_s = rays / dt

    if full:
        from raytracer_tpu.ops.image import quantize

        # single cold-cache frame, end to end including uint8 image fetch
        t0 = time.perf_counter()
        img8 = np.asarray(quantize(render_camera(
            data, meta, cam, bvh=accel, engine="cluster", chunk=1 << 21)))
        e2e = time.perf_counter() - t0
        print(json.dumps({"#metric": "horse_single_frame_e2e_s",
                          "value": round(e2e, 3),
                          "note": "includes ~0.13s tunnel-artifact fetch",
                          "vs_author_0.452s": round(0.452 / e2e, 3)}),
              flush=True)

        def big(name, sdata, smeta, saccel, scam, ssaa):
            def one():
                out = render_camera_streamed(
                    sdata, smeta, scam, bvh=saccel, engine="cluster",
                    chunk=1 << 21, ssaa=ssaa,
                )
                s = float(jnp.sum(out.astype(jnp.float32)))
                assert s == s

            one()  # band-kernel compile (persistent-cached across runs)
            t0 = time.perf_counter()
            one()
            dt = time.perf_counter() - t0
            r = scam.width * scam.height * ssaa * ssaa
            print(json.dumps({
                "#metric": name, "seconds": round(dt, 2),
                "primary_rays": r,
                "mrays_per_s": round(r / dt / 1e6, 2),
                "author_seconds": AUTHOR_S[name],
                "vs_author": round(AUTHOR_S[name] / dt, 2),
            }), flush=True)

        big("horse_ssaa256", data, meta, accel, cam, 16)
        import dataclasses

        cam8k = dataclasses.replace(cam, width=7680, height=3840)
        big("horse_8k_ssaa4", data, meta, accel, cam8k, 2)
        if os.path.exists(LOW_POLY):
            ldata, lmeta, laccel = _load(LOW_POLY)
            big("low_poly_ssaa4", ldata, lmeta, laccel, lmeta.cameras[0], 2)

    print(json.dumps({
        "metric": "horse_and_mug_sustained_primary_rays_per_s",
        "value": round(rays_per_s / 1e6, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
