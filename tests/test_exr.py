"""EXR HDR writer round-trip + container well-formedness (utils/exr.py).

HDR float output is a capability the reference lacks (its only format is
8-bit ASCII P3, /root/reference/ppm.cpp); the EXR path must carry the
renderer's linear float radiance losslessly (float32 mode) or to half
precision (default), and quantizing the EXR pixels must reproduce the PPM
path exactly.
"""

import struct

import numpy as np

from raytracer_tpu.utils.exr import read_exr, write_exr


def test_roundtrip_float32(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.random((11, 5, 3)) * 300.0).astype(np.float32)
    p = tmp_path / "x.exr"
    write_exr(str(p), img, half=False)
    assert (read_exr(str(p)) == img).all()


def test_roundtrip_half(tmp_path):
    rng = np.random.default_rng(1)
    img = (rng.random((4, 9, 3)) * 300.0).astype(np.float32)
    p = tmp_path / "h.exr"
    write_exr(str(p), img)  # default: HALF channels
    got = read_exr(str(p))
    assert (got == img.astype(np.float16).astype(np.float32)).all()


def test_container_structure(tmp_path):
    img = np.arange(3 * 4 * 3, dtype=np.float32).reshape(3, 4, 3)
    p = tmp_path / "s.exr"
    write_exr(str(p), img, half=False)
    raw = p.read_bytes()
    assert struct.unpack_from("<ii", raw, 0) == (20000630, 2)
    # header must end with a lone null; find it by walking attributes
    pos = 8
    names = []
    while raw[pos] != 0:
        nul = raw.index(b"\0", pos)
        names.append(raw[pos:nul].decode())
        pos = raw.index(b"\0", nul + 1) + 1
        (size,) = struct.unpack_from("<i", raw, pos)
        pos += 4 + size
    pos += 1
    for required in ("channels", "compression", "dataWindow",
                     "displayWindow", "lineOrder", "pixelAspectRatio",
                     "screenWindowCenter", "screenWindowWidth"):
        assert required in names
    # offset table: one int64 per scanline pointing at y-ordered blocks
    offsets = struct.unpack_from("<3q", raw, pos)
    for y, off in enumerate(offsets):
        by, nbytes = struct.unpack_from("<ii", raw, off)
        assert by == y
        assert nbytes == 3 * 4 * 4
    assert offsets[0] == pos + 8 * 3
    assert len(raw) == offsets[-1] + 8 + 3 * 4 * 4


def test_cli_exr_output(tmp_path):
    from raytracer_tpu.ops.image import quantize
    from raytracer_tpu.render import main
    from raytracer_tpu.utils.ppm import read_ppm

    main(["tests/data/entry_scene.xml", "--ssaa", "1", "--engine", "brute",
          "--out-dir", str(tmp_path), "--format", "exr"])
    main(["tests/data/entry_scene.xml", "--ssaa", "1", "--engine", "brute",
          "--out-dir", str(tmp_path)])
    ppms = sorted(tmp_path.glob("*.ppm"))
    assert ppms, "ppm reference output missing"
    for ppm in ppms:
        exr = ppm.with_suffix(".exr")
        assert exr.exists(), f"missing {exr}"
        radiance = read_exr(str(exr))
        # half-float carries ~11 mantissa bits; quantized pixels may land
        # one LSB off the PPM path only at exact .5 rounding boundaries
        q = np.asarray(quantize(radiance)).astype(np.int32)
        ref = read_ppm(str(ppm)).astype(np.int32)
        assert np.abs(q - ref).max() <= 1
        assert (q != ref).mean() < 1e-2
