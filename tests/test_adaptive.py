"""Adaptive (variance-driven) sampling — ops/adaptive.py.

No reference analog (the reference only has uniform SSAA,
raytracer.cpp:506-512).  Properties pinned here: exact refinement budget
at tile granularity, unrefined blocks bitwise-identical to the base-only
render, noise reduction at equal seeds, determinism, and the CLI mode.
"""

import numpy as np
import pytest

from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.ops.adaptive import render_camera_adaptive

SCENE = "tests/data/entry_scene.xml"


@pytest.fixture(scope="module")
def scene():
    return load_scene(SCENE)


def test_budget_shapes_and_stats(scene):
    data, meta = scene
    img, stats = render_camera_adaptive(
        data, meta, meta.cameras[0], engine="brute", base_spp=4,
        extra_spp=12, refine_frac=0.25)
    cam = meta.cameras[0]
    assert img.shape == (cam.height, cam.width, 3)
    assert np.isfinite(np.asarray(img)).all()
    assert stats["blocks"] == cam.height * cam.width // 128
    assert stats["refine_unit_px"] == 128  # whole blocks (see adaptive.py)
    assert stats["refine_units"] == stats["blocks"]
    assert stats["refined_blocks"] == round(0.25 * stats["refine_units"])
    assert stats["mean_spp"] == pytest.approx(4 + 0.25 * 12)


def test_exactly_k_units_refined(scene):
    """Unrefined units must be bitwise equal to the base-only render —
    refinement only ever ADDS samples to the chosen sub-blocks."""
    from raytracer_tpu.models.whitted import _tile_block_shape
    from raytracer_tpu.ops.tiling import to_blocks

    data, meta = scene
    cam = meta.cameras[0]
    base_only, _ = render_camera_adaptive(
        data, meta, cam, engine="brute", base_spp=4, extra_spp=0)
    # frac must stay below the scene's noisy-unit fraction: a refined
    # unit with zero sample variance (constant radiance) is bitwise
    # unchanged by extra samples, so it would not count as "changed"
    refined, stats = render_camera_adaptive(
        data, meta, cam, engine="brute", base_spp=4, extra_spp=12,
        refine_frac=0.125)
    # a refinement unit = p_sel consecutive tile-order lanes = a
    # (p_sel/bw) x bw image strip; count changed strips
    bh, bw = _tile_block_shape()
    sh = stats["refine_unit_px"] // bw
    d = np.asarray(to_blocks(
        (np.asarray(base_only) != np.asarray(refined)).any(axis=-1)
        .reshape(-1, 1), cam.height, cam.width, sh, bw))
    changed = d.reshape(stats["refine_units"],
                        stats["refine_unit_px"]).any(axis=1)
    assert changed.sum() == stats["refined_blocks"]


def test_refinement_reduces_error(scene):
    """With the same base seed, spending extra samples on the noisiest
    blocks must move the image toward an independent high-spp truth."""
    data, meta = scene
    cam = meta.cameras[0]
    truth, _ = render_camera_adaptive(
        data, meta, cam, engine="brute", base_spp=48, extra_spp=0, seed=7)
    base_only, _ = render_camera_adaptive(
        data, meta, cam, engine="brute", base_spp=4, extra_spp=0, seed=0)
    refined, _ = render_camera_adaptive(
        data, meta, cam, engine="brute", base_spp=4, extra_spp=12,
        refine_frac=0.25, seed=0)
    t = np.asarray(truth)
    mse_base = float(np.mean((np.asarray(base_only) - t) ** 2))
    mse_ref = float(np.mean((np.asarray(refined) - t) ** 2))
    assert mse_ref < mse_base


def test_deterministic(scene):
    data, meta = scene
    cam = meta.cameras[0]
    a, _ = render_camera_adaptive(data, meta, cam, engine="brute",
                                  base_spp=3, extra_spp=6, seed=3)
    b, _ = render_camera_adaptive(data, meta, cam, engine="brute",
                                  base_spp=3, extra_spp=6, seed=3)
    assert (np.asarray(a) == np.asarray(b)).all()


def test_base_spp_guard(scene):
    data, meta = scene
    with pytest.raises(ValueError):
        render_camera_adaptive(data, meta, meta.cameras[0], engine="brute",
                               base_spp=1)


def test_cluster_engine_agrees_with_brute(scene):
    """The engine only changes visibility lookup, not sampling: both
    engines must refine the same blocks and render ~identical radiance."""
    from raytracer_tpu.models.bvh import build_bvh
    from raytracer_tpu.models.clusters import build_clusters

    data, meta = scene
    cam = meta.cameras[0]
    accel = build_clusters(data, meta, build_bvh(data, meta))
    a, _ = render_camera_adaptive(data, meta, cam, engine="brute",
                                  base_spp=2, extra_spp=4, seed=1)
    b, _ = render_camera_adaptive(data, meta, cam, bvh=accel,
                                  engine="cluster", base_spp=2,
                                  extra_spp=4, seed=1)
    assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-2)


def test_non_dividing_frame(scene):
    """A frame that does NOT tile evenly into 8x16 blocks exercises the
    pad + inverse-permutation path of _tile_pixel_coords; the result must
    equal a straight re-computation of the same sample stream without any
    tiling (pixel means are layout-invariant)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from raytracer_tpu.models.whitted import _render_rays_jit
    from raytracer_tpu.ops.adaptive import _tile_pixel_coords
    from raytracer_tpu.ops.camera import camera_vectors, eye_rays_pixels

    data, meta = scene
    cam = dataclasses.replace(meta.cameras[0], width=50, height=50)
    img, stats = render_camera_adaptive(
        data, meta, cam, engine="brute", base_spp=3, extra_spp=0, seed=5)
    assert img.shape == (50, 50, 3)

    # reference computation: same PRNG stream, same tile-ordered layout,
    # but per-pixel means assembled by plain numpy indexing
    rows, cols, inv, pad = _tile_pixel_coords(50, 50, 8, 16)
    assert pad > 0 and inv is not None
    nblk, tile, spp = len(rows) // 128, 128, 3
    kb, _ = jax.random.split(jax.random.PRNGKey(5))
    jit_ = jax.random.uniform(kb, (nblk, spp, tile, 2), jnp.float32,
                              minval=-0.5, maxval=0.5).at[:, 0].set(0.0)
    rr = np.broadcast_to(rows.reshape(nblk, 1, tile), (nblk, spp, tile))
    cc = np.broadcast_to(cols.reshape(nblk, 1, tile), (nblk, spp, tile))
    e, dirs = eye_rays_pixels(jnp.asarray(camera_vectors(cam)), 50, 50,
                              rr.reshape(-1), cc.reshape(-1),
                              jitter=jit_.reshape(-1, 2))
    color = np.asarray(_render_rays_jit(data, meta, e, dirs, None, "brute"))
    mean = color.reshape(nblk, spp, tile, 3).mean(axis=1).reshape(-1, 3)
    expect = mean[inv].reshape(50, 50, 3)
    assert np.allclose(np.asarray(img), expect, atol=1e-5)


def test_cli_adaptive(tmp_path, capsys):
    from raytracer_tpu.render import main
    from raytracer_tpu.utils.ppm import read_ppm

    main([SCENE, "--ssaa", "2", "--ssaa-mode", "adaptive", "--engine",
          "brute", "--out-dir", str(tmp_path), "--json-metrics"])
    out = capsys.readouterr().out
    assert '"adaptive"' in out and '"refined_blocks"' in out
    img = read_ppm(str(tmp_path / "entry_scene.ppm"))
    assert img.shape == (64, 64, 3)


def test_multi_round_budget_and_determinism(scene):
    data, meta = scene
    cam = meta.cameras[0]
    a, stats = render_camera_adaptive(
        data, meta, cam, engine="brute", base_spp=4, extra_spp=12,
        refine_frac=0.25, rounds=3, seed=5)
    assert stats["rounds"] == 3
    assert stats["extra_spp_per_round"] == (4, 4, 4)
    assert stats["total_samples"] == (
        stats["refine_units"] * 128 * 4
        + stats["refined_blocks"] * 128 * 4 * 3)
    b, _ = render_camera_adaptive(
        data, meta, cam, engine="brute", base_spp=4, extra_spp=12,
        refine_frac=0.25, rounds=3, seed=5)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_multi_round_improves_over_base(scene):
    data, meta = scene
    cam = meta.cameras[0]
    truth, _ = render_camera_adaptive(
        data, meta, cam, engine="brute", base_spp=48, extra_spp=0, seed=7)
    base_only, _ = render_camera_adaptive(
        data, meta, cam, engine="brute", base_spp=4, extra_spp=0, seed=0)
    multi, _ = render_camera_adaptive(
        data, meta, cam, engine="brute", base_spp=4, extra_spp=12,
        refine_frac=0.5, rounds=2, seed=0)
    t = np.asarray(truth)
    mse_base = float(np.mean((np.asarray(base_only) - t) ** 2))
    mse_multi = float(np.mean((np.asarray(multi) - t) ** 2))
    assert mse_multi < mse_base


def test_rounds_exceeding_budget_raises(scene):
    data, meta = scene
    with pytest.raises(ValueError):
        render_camera_adaptive(data, meta, meta.cameras[0], engine="brute",
                               base_spp=2, extra_spp=2, rounds=8)


def test_uneven_round_split_exact_budget(scene):
    data, meta = scene
    _, stats = render_camera_adaptive(
        data, meta, meta.cameras[0], engine="brute", base_spp=2,
        extra_spp=7, refine_frac=0.25, rounds=3, seed=1)
    assert stats["extra_spp_per_round"] == (3, 2, 2)
    assert stats["total_samples"] == (
        stats["refine_units"] * 128 * 2 + stats["refined_blocks"] * 128 * 7)
