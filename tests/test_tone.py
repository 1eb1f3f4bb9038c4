"""Tone-mapping tests (ops.image.tone_map + the CLI --tone flag)."""

import numpy as np
import pytest

from raytracer_tpu.ops.image import quantize, tone_map

SIMPLE = "/root/reference/inputs/simple.xml"


def test_none_is_quantize():
    x = np.linspace(-10, 300, 97).reshape(-1, 1) * np.ones((1, 3))
    assert np.array_equal(np.asarray(tone_map(x, "none")),
                          np.asarray(quantize(x)))


@pytest.mark.parametrize("mode", ["gamma", "reinhard", "aces"])
def test_curves_monotone_and_anchored(mode):
    x = np.linspace(0.0, 255.0, 256).reshape(-1, 1) * np.ones((1, 3))
    y = np.asarray(tone_map(x, mode)).astype(int)
    assert (np.diff(y[:, 0]) >= 0).all()          # monotone
    assert y[0, 0] == 0                           # black stays black
    assert y[-1, 0] <= 255


def test_reinhard_never_clips():
    # radiance far above the 255 clip keeps gradation under reinhard
    x = np.array([[300.0, 600.0, 1200.0]])
    y = np.asarray(tone_map(x, "reinhard")).astype(int)
    assert y[0, 0] < y[0, 1] < y[0, 2] < 255
    assert np.asarray(quantize(x)).astype(int).tolist() == [[255, 255, 255]]


def test_gamma_brightens_midtones():
    x = np.full((1, 3), 64.0)  # 0.25 normalized
    y = np.asarray(tone_map(x, "gamma")).astype(int)
    assert y[0, 0] > 64


def test_unknown_mode_raises():
    with pytest.raises(ValueError):
        tone_map(np.zeros((1, 3)), "filmic-xyz")


def test_cli_tone_png(tmp_path):
    from raytracer_tpu.render import main

    main([SIMPLE, "--ssaa", "1", "--format", "png", "--tone", "aces",
          "--out-dir", str(tmp_path), "--engine", "brute"])
    p = tmp_path / "simple.png"
    assert p.exists() and p.stat().st_size > 0

    main([SIMPLE, "--ssaa", "1", "--format", "png",
          "--out-dir", str(tmp_path / "plain"), "--engine", "brute"])
    a = (tmp_path / "simple.png").read_bytes()
    b = (tmp_path / "plain" / "simple.png").read_bytes()
    assert a != b  # the tone curve actually changed the pixels
