"""CLI driver smoke test: renders every camera, writes parseable PPMs."""

import numpy as np

from raytracer_tpu.render import main
from raytracer_tpu.utils.ppm import read_ppm


def test_cli_renders_all_cameras(reference_inputs, tmp_path, capsys):
    main([
        f"{reference_inputs}/cornellbox.xml",
        "--ssaa", "1", "--engine", "cluster", "--out-dir", str(tmp_path),
    ])
    out = capsys.readouterr().out
    assert "Planted trees" in out and "Total:" in out
    ppms = sorted(p.name for p in tmp_path.glob("*.ppm"))
    assert ppms == [
        "cornellbox_front.ppm", "cornellbox_inverse.ppm", "cornellbox_top.ppm"
    ]
    img = read_ppm(str(tmp_path / "cornellbox_front.ppm"))
    assert img.shape == (480, 480, 3)
    assert img.max() > 0


def test_cli_ssaa_parity_mode(reference_inputs, tmp_path):
    main([
        f"{reference_inputs}/simple.xml",
        "--ssaa", "2", "--engine", "brute", "--out-dir", str(tmp_path),
    ])
    img = read_ppm(str(tmp_path / "simple.ppm"))
    assert img.shape == (800, 800, 3)  # downsampled back to declared res


def test_cli_accel_cache_roundtrip(reference_inputs, tmp_path):
    """--accel-cache builds+saves on first run, loads on second, with
    identical output (self-describing npz, VERDICT round-1 item 8)."""
    import numpy as np

    from raytracer_tpu.render import main
    from raytracer_tpu.utils.ppm import read_ppm

    xml = f"{reference_inputs}/simple.xml"
    cache = str(tmp_path / "simple_accel.npz")
    main([xml, "--ssaa", "1", "--engine", "cluster",
          "--accel-cache", cache, "--out-dir", str(tmp_path / "a")])
    assert (tmp_path / "simple_accel.npz").exists()
    main([xml, "--ssaa", "1", "--engine", "cluster",
          "--accel-cache", cache, "--out-dir", str(tmp_path / "b")])
    ia = read_ppm(str(tmp_path / "a" / "simple.ppm"))
    ib = read_ppm(str(tmp_path / "b" / "simple.ppm"))
    np.testing.assert_array_equal(ia, ib)
