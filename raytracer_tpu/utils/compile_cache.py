"""Persistent XLA compilation cache.

The reference's whole cold run is 0.45 s; our first frame pays a 40-90 s
jit compile through the tunneled axon TPU (ROADMAP round 1).  Verified
round 2: JAX's persistent compilation cache DOES engage through the axon
remote-compile path (cache entries are written and 'Persistent
compilation cache hit' fires in a fresh process — a cached matmul
dispatches in 0.27 s vs 1.28 s recompiling), so every entry point enables
it by default.  A second cold process rendering a previously-seen
(scene-shape, resolution) pair then skips all big-kernel compiles.
"""

from __future__ import annotations

import os

import jax

_enabled = False


def enable(cache_dir: str | None = None) -> str:
    """Idempotently point JAX's persistent compile cache at ``cache_dir``
    (default: $RAYTRACER_TPU_CACHE_DIR or ~/.cache/raytracer_tpu/xla).
    Must run before the first compilation to cover it; safe afterwards.
    Returns the directory in use."""
    global _enabled
    cache_dir = cache_dir or os.environ.get(
        "RAYTRACER_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "raytracer_tpu", "xla"),
    )
    if jax.default_backend() == "cpu":
        # CPU compiles are seconds, and XLA:CPU AOT entries are pinned to
        # the compiling machine's ISA features (loading them elsewhere
        # warns about possible SIGILL) — not worth caching
        return cache_dir
    if not _enabled:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # the render pipeline's few big kernels are the 40-90 s cost;
        # caching sub-second helpers too costs little and saves dispatches
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        _enabled = True
    return cache_dir
