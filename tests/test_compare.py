"""Tests for the image-diff CLI (raytracer_tpu/compare.py)."""

import numpy as np

from raytracer_tpu.compare import diff_stats, main
from raytracer_tpu.utils.ppm import write_ppm


def test_diff_stats_identity():
    img = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(4, 3, 3)
    s = diff_stats(img, img)
    assert s["differing"] == 0 and s["max_abs"] == 0 and s["mse"] == 0.0


def test_diff_stats_counts():
    a = np.zeros((2, 2, 3), np.uint8)
    b = a.copy()
    b[0, 0, 0] = 1    # small diff
    b[1, 1, 2] = 200  # big diff
    s = diff_stats(a, b, big=8)
    assert s["differing"] == 2
    assert s["max_abs"] == 200
    assert s["channels_gt_8"] == 1


def test_cli_exr_input_quantized(tmp_path):
    """An EXR input is quantized with the renderer's tone semantics, so a
    PPM and the EXR of the same radiance compare as equal."""
    from raytracer_tpu.utils.exr import write_exr

    rng = np.random.default_rng(2)
    radiance = (rng.random((6, 5, 3)) * 300.0).astype(np.float32)
    q = np.floor(np.clip(radiance, 0, 255) + 0.5).astype(np.uint8)
    pe, pp = str(tmp_path / "r.exr"), str(tmp_path / "r.ppm")
    write_exr(pe, radiance, half=False)
    write_ppm(pp, q)
    assert main([pe, pp, "--frac-tol", "0"]) == 0


def test_cli_match_and_mismatch(tmp_path):
    a = np.zeros((8, 8, 3), np.uint8)
    b = a.copy()
    b[0, 0, 0] = 1  # one LSB flip: within default tolerances
    pa, pb = str(tmp_path / "a.ppm"), str(tmp_path / "b.ppm")
    write_ppm(pa, a)
    write_ppm(pb, b)
    assert main([pa, pb]) == 0
    c = a.copy()
    c[:, :, :] = 255  # everything differs hugely
    pc = str(tmp_path / "c.ppm")
    write_ppm(pc, c)
    assert main([pa, pc]) == 1
    assert main([pa, pb, "--frac-tol", "0"]) == 1  # tightened tolerance
