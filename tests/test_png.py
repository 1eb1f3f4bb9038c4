"""PNG writer round-trip + container well-formedness (utils/png.py).

The PNG path is a quality extension over the reference's only format
(ASCII P3, /root/reference/ppm.cpp); pixels must match the PPM path
exactly — only the container differs.
"""

import struct
import zlib

import numpy as np

from raytracer_tpu.utils.png import read_png, write_png


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(13, 7, 3), dtype=np.uint8)
    p = tmp_path / "x.png"
    write_png(str(p), img)
    assert (read_png(str(p)) == img).all()


def test_container_is_valid_png(tmp_path):
    img = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3)
    p = tmp_path / "y.png"
    write_png(str(p), img)
    raw = p.read_bytes()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    # walk chunks: lengths consistent, CRCs valid, IHDR/IDAT/IEND present
    pos, tags = 8, []
    while pos < len(raw):
        (length,) = struct.unpack(">I", raw[pos : pos + 4])
        tag = raw[pos + 4 : pos + 8]
        payload = raw[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", raw[pos + 8 + length : pos + 12 + length])
        assert crc == zlib.crc32(tag + payload) & 0xFFFFFFFF
        tags.append(tag)
        pos += 12 + length
    assert tags == [b"IHDR", b"IDAT", b"IEND"]
    assert pos == len(raw)
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", raw[16:29]
    )
    assert (w, h, depth, color, comp, filt, interlace) == (4, 5, 8, 2, 0, 0, 0)


def test_cli_png_output(tmp_path):
    from raytracer_tpu.render import main
    from raytracer_tpu.utils.ppm import read_ppm

    main(["tests/data/entry_scene.xml", "--ssaa", "1", "--engine", "brute",
          "--out-dir", str(tmp_path), "--format", "png"])
    main(["tests/data/entry_scene.xml", "--ssaa", "1", "--engine", "brute",
          "--out-dir", str(tmp_path)])
    ppms = sorted(tmp_path.glob("*.ppm"))
    assert ppms, "ppm reference output missing"
    for ppm in ppms:
        png = ppm.with_suffix(".png")
        assert png.exists(), f"missing {png}"
        assert (read_png(str(png)) == read_ppm(str(ppm))).all()
