"""The one camera -> image decision tree shared by the CLI
(render.py) and the render server (serve.py).

Routes a render request through the right execution path —
adaptive sampling, row-band streaming (large frames / jittered
sampling / HDR+tone float paths), or the whole-frame dispatch — and
applies the SSAA reduction, tone curve, and quantization with the same
semantics everywhere.  Keeping this in one place is load-bearing: the
CLI and the server MUST agree on parity behavior (an earlier
duplicated copy in serve.py silently lacked adaptive mode and accepted
misspelled ssaa modes as plain mean SSAA).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

SSAA_MODES = ("parity", "mean", "jitter", "adaptive")
TONE_MODES = ("none", "gamma", "reinhard", "aces")
FORMATS = ("ppm", "png", "exr")


def render_one_camera(
    data,
    meta,
    cam,
    accel=None,
    *,
    engine: str = "auto",
    ssaa: int = 1,
    ssaa_mode: str = "parity",
    bfc: bool = False,
    chunk: int = 1 << 22,
    tone: str = "none",
    hdr: bool = False,
    seed: int = 0,
    adaptive_frac: float = 0.125,
    adaptive_extra: Optional[int] = None,
    adaptive_rounds: int = 1,
    mesh=None,
    relaxed: bool = False,
) -> Tuple[np.ndarray, Optional[dict]]:
    """Render one camera to its final-resolution image.

    Returns ``(img, adaptive_stats)``: ``img`` is (H, W, 3) uint8, or
    float32 linear radiance when ``hdr`` (the EXR path; ``tone`` is then
    ignored — EXR stays linear).  ``adaptive_stats`` is non-None only in
    adaptive mode.  Raises ValueError on unknown mode strings — a server
    must reject typos rather than silently render something else.

    ``mesh``: optional 1-D jax.sharding.Mesh; the trace is sharded over
    its devices with IDENTICAL reduction/quantization semantics (the
    sharded band renderer reuses this pipeline's code paths — see
    models.whitted._render_band_jit).  Deterministic modes (parity/mean)
    are bitwise-identical to single-device; jitter mode keeps the same
    estimator but draws per-band sample offsets, and band heights depend
    on the mesh/chunk configuration — a jittered render is reproducible
    for a FIXED (seed, chunk, mesh) configuration, not across different
    ones (true single-device as well: chunk size already sets banding).
    Adaptive mode stays single-device
    (its per-round refinement wavefronts are data-dependent and small;
    sharding them buys nothing — use jitter mode for multi-chip
    stochastic sampling).
    """
    from raytracer_tpu.models.whitted import (
        render_camera, render_camera_streamed,
    )
    from raytracer_tpu.ops.image import (
        downsample_mean, downsample_parity, quantize, tone_map,
    )

    if ssaa_mode not in SSAA_MODES:
        raise ValueError(f"unknown ssaa_mode {ssaa_mode!r}; "
                         f"one of {SSAA_MODES}")
    if tone not in TONE_MODES:
        raise ValueError(f"unknown tone {tone!r}; one of {TONE_MODES}")
    want_float = hdr or tone != "none"
    rcam = cam.scaled(ssaa) if ssaa > 1 else cam
    stats = None
    if mesh is not None:
        block_w = 1
        if engine not in ("brute", "bvh"):  # cluster (or auto -> cluster)
            from raytracer_tpu.models.whitted import _tile_block_shape

            block_w = _tile_block_shape()[1]
        if (mesh.size == 1 or ssaa_mode == "adaptive"
                or (cam.width * ssaa) % block_w):
            # adaptive stays single-device (docstring); a scaled width
            # that isn't a multiple of the pixel-tile block would split
            # the cluster engine's tile blocks across shards (no bundled
            # scene; brute/bvh have no block constraint)
            mesh = None

    if ssaa_mode == "adaptive":
        from raytracer_tpu.ops.adaptive import render_camera_adaptive

        # variance needs >= 2 samples; at ssaa 1 adaptive still
        # supersamples (2 base + refined extras)
        base = max(2, ssaa * ssaa)
        color, stats = render_camera_adaptive(
            data, meta, cam, bvh=accel, engine=engine, base_spp=base,
            extra_spp=(adaptive_extra if adaptive_extra is not None
                       else 3 * base),
            refine_frac=adaptive_frac, bfc=bfc, seed=seed,
            rounds=adaptive_rounds, relaxed=relaxed,
        )
        img = (color if hdr
               else tone_map(color, tone) if want_float
               else quantize(color))
    elif (mesh is not None
          or rcam.width * rcam.height > chunk
          or (ssaa_mode == "jitter" and ssaa > 1)):
        # row-band streaming: ray state stays ~chunk-sized and the SSAA
        # reduction runs on device per band (a 256x-SSAA horse frame is
        # 265M rays); jittered sampling perturbs the eye rays themselves,
        # which only the band renderer supports.  A mesh always routes
        # here — the band renderer is the sharding-aware path.
        img = render_camera_streamed(
            data, meta, cam, bvh=accel, engine=engine, chunk=chunk,
            bfc=bfc, ssaa=ssaa, ssaa_mode=ssaa_mode, hdr=want_float,
            seed=seed, mesh=mesh, relaxed=relaxed,
        )
        if want_float and not hdr:
            img = tone_map(img, tone)
    else:
        color = render_camera(data, meta, rcam, bvh=accel, engine=engine,
                              chunk=chunk, bfc=bfc, relaxed=relaxed)
        if want_float:
            img = (downsample_mean(color, ssaa) if ssaa > 1 else color)
            if not hdr:
                img = tone_map(img, tone)
        elif ssaa > 1:
            img = (downsample_parity(quantize(color), ssaa)
                   if ssaa_mode == "parity"
                   else quantize(downsample_mean(color, ssaa)))
        else:
            img = quantize(color)
    if mesh is not None:
        # multi-process safe fetch: non-addressable shards (true
        # multi-host meshes) gather via ONE process_allgather; a plain
        # np.asarray would raise.  Single-process this IS np.asarray.
        from raytracer_tpu.parallel.distributed import assemble_image

        return assemble_image(img), stats
    return np.asarray(img), stats


def write_image(out_dir: str, image_name: str, img: np.ndarray,
                fmt: str = "ppm") -> str:
    """Write ``img`` under ``out_dir`` in ``fmt``; returns the path.
    ``image_name`` is the scene XML's declared name (its extension is
    swapped for png/exr)."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; one of {FORMATS}")
    stem = image_name.rsplit(".", 1)[0]
    if fmt == "png":
        from raytracer_tpu.utils.png import write_png

        path = os.path.join(out_dir, f"{stem}.png")
        write_png(path, img)
    elif fmt == "exr":
        from raytracer_tpu.utils.exr import write_exr

        path = os.path.join(out_dir, f"{stem}.exr")
        write_exr(path, img)
    else:
        from raytracer_tpu.utils.ppm import write_ppm

        path = os.path.join(out_dir, image_name)
        write_ppm(path, img)
    return path
