"""Per-bounce active-lane compaction is semantics-free.

The wavefront loop stably sorts its carry by activity at deep bounces
(models/whitted.py: _compact_carry, gated to max_depth >=
_COMPACT_MIN_DEPTH) so trailing all-inactive tiles hit the kernels' skip
paths.  Occlusion and closest-hit shortlists are conservative supersets
under any ray permutation, so the rendered image must be BITWISE
identical with compaction on vs off — pinned here on the two
deep-recursion sphere scenes (the compaction targets).
"""

import dataclasses

import numpy as np
import pytest

from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.models import whitted


@pytest.mark.parametrize("scene", ["marbles", "mirror_spheres"])
def test_compaction_bitwise(reference_inputs, scene):
    """Force the sort to fire at EVERY eligible bounce (scatter threshold
    -1) and compare against compaction disabled entirely — the render
    must be bitwise identical regardless of how often the runtime gate
    fires in production."""
    data, meta = load_scene(f"{reference_inputs}/{scene}.xml")
    assert meta.max_depth >= whitted._COMPACT_MIN_DEPTH  # policy applies
    cset = build_clusters(data, meta, build_bvh(data, meta))
    cam = dataclasses.replace(meta.cameras[0], width=64, height=64)
    saved = (whitted._COMPACT_MIN_DEPTH, whitted._COMPACT_SCATTER)
    try:
        whitted._COMPACT_MIN_DEPTH = 3
        whitted._COMPACT_SCATTER = -1.0  # always-sort once depth >= 2
        whitted._render_camera_jit.clear_cache()
        on = np.asarray(
            whitted.render_camera(data, meta, cam, bvh=cset, engine="cluster"))
        whitted._COMPACT_MIN_DEPTH = 99
        whitted._render_camera_jit.clear_cache()
        off = np.asarray(
            whitted.render_camera(data, meta, cam, bvh=cset, engine="cluster"))
    finally:
        whitted._COMPACT_MIN_DEPTH, whitted._COMPACT_SCATTER = saved
        whitted._render_camera_jit.clear_cache()
    assert np.array_equal(on, off)


def test_uncompact_restores_order():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    r = 512
    color = jnp.asarray(rng.standard_normal((r, 3)), jnp.float32)
    perm = jnp.asarray(rng.permutation(r), jnp.int32)
    restored = whitted._uncompact_color(color[perm], perm)
    assert np.array_equal(np.asarray(restored), np.asarray(color))
