import numpy as np

from raytracer_tpu.utils.ppm import read_ppm, write_ppm


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    p = tmp_path / "x.ppm"
    write_ppm(str(p), img)
    assert (read_ppm(str(p)) == img).all()


def test_exact_format(tmp_path):
    """Byte format must match the reference writer (ppm.cpp:13-36):
    'P3\\n<w> <h>\\n255\\n', values space-separated, NO trailing space at the
    last channel of each row, newline per row."""
    img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    p = tmp_path / "f.ppm"
    write_ppm(str(p), img)
    raw = p.read_bytes()
    assert raw == b"P3\n2 2\n255\n0 1 2 3 4 5\n6 7 8 9 10 11\n"


def test_reads_reference_golden():
    import os
    path = "/root/reference/outputs/simple.ppm"
    if not os.path.exists(path):
        return
    img = read_ppm(path)
    assert img.shape == (800, 800, 3)
