"""Tone quantization and SSAA resampling.

- ``quantize`` reproduces Vec3f::toPixel (/root/reference/parser.h:88-93):
  clamp to [0, 255] then C `round` (half away from zero; equal to
  floor(x + 0.5) for the non-negative post-clamp values).
- ``downsample_parity`` reproduces ImageProcessor::downSample
  (raytracer.cpp:459-484): box filter over ALREADY-QUANTIZED uint8 pixels
  with truncating integer division — required for bit parity with the
  committed reference binary's SSAA output.
- ``downsample_mean`` is the quality-first TPU-native variant: mean in float
  BEFORE quantization (a plain spp reduction on the sample axis).
"""

from __future__ import annotations

import jax.numpy as jnp


def quantize(color):
    """(..., 3) float color → (..., 3) uint8, reference rounding semantics."""
    clamped = jnp.clip(color, 0.0, 255.0)
    return jnp.floor(clamped + 0.5).astype(jnp.uint8)


def tone_map(color, mode: str = "none"):
    """(..., 3) LINEAR float radiance (reference 0-255 scale) → uint8.

    Quality extension beyond the reference (whose only transfer is the
    clamp+round of quantize): a filmic/global tone curve applied in
    normalized [0, 1] space (x/255), then re-scaled and quantized with
    the reference's rounding.  Modes:

      none      straight quantize (parity path)
      gamma     sRGB-ish power 1/2.2 on the normalized value
      reinhard  x / (1 + x): soft global rolloff, never clips highlights
      aces      Narkowicz's ACES filmic fit (the industry-standard look):
                (x(2.51x + .03)) / (x(2.43x + .59) + .14)

    All curves are monotone and map 0 → 0; highlights above the
    reference's 255 clip retain gradation instead of flattening.
    """
    if mode == "none":
        return quantize(color)
    x = jnp.maximum(color, 0.0) / 255.0
    if mode == "gamma":
        y = x ** (1.0 / 2.2)
    elif mode == "reinhard":
        y = x / (1.0 + x)
    elif mode == "aces":
        y = (x * (2.51 * x + 0.03)) / (x * (2.43 * x + 0.59) + 0.14)
    else:
        raise ValueError(f"unknown tone mode: {mode!r}")
    return quantize(y * 255.0)


def downsample_parity(img, factor: int):
    """(H, W, 3) uint8 → (H//f, W//f, 3) uint8 via truncating integer mean."""
    h, w, _ = img.shape
    nh, nw = h // factor, w // factor
    blocks = img[: nh * factor, : nw * factor].reshape(nh, factor, nw, factor, 3)
    sums = jnp.sum(blocks.astype(jnp.int32), axis=(1, 3))
    return (sums // (factor * factor)).astype(jnp.uint8)


def downsample_mean(color, factor: int):
    """(H, W, 3) float → (H//f, W//f, 3) float via float box mean."""
    h, w, _ = color.shape
    nh, nw = h // factor, w // factor
    blocks = color[: nh * factor, : nw * factor].reshape(nh, factor, nw, factor, 3)
    return jnp.mean(blocks, axis=(1, 3))
