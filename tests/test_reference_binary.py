"""Integration parity against the REFERENCE BINARY itself.

The TA goldens cover only 4 no-AA scenes; compiling and running the
actual reference program closes the rest of the gap — in particular the
committed SSAA path (truncating uint8 box filter), for which no golden
exists.  Marked slow; skipped when the reference sources or a C++
toolchain are unavailable.
"""

import shutil
import subprocess

import numpy as np
import pytest

from raytracer_tpu.render import main
from raytracer_tpu.utils.ppm import read_ppm

REF = "/root/reference"


@pytest.fixture(scope="module")
def reference_binary(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("no C++ toolchain")
    src = tmp_path_factory.mktemp("refbuild")
    for f in ("raytracer.cpp", "bvh.h", "parser.h", "parser.cpp",
              "ppm.cpp", "ppm.h", "tinyxml2.cpp", "tinyxml2.h", "Makefile"):
        try:
            shutil.copy(f"{REF}/{f}", src / f)
        except FileNotFoundError:
            pytest.skip(f"reference source {f} unavailable")
    r = subprocess.run(["make", "-C", str(src)], capture_output=True, timeout=300)
    if r.returncode != 0:
        pytest.skip(f"reference build failed: {r.stderr[-400:]}")
    binary = src / "raytracer"
    if not binary.exists():
        cands = list(src.glob("*.out")) + list(src.glob("raytracer*"))
        cands = [c for c in cands if c.suffix not in (".cpp", ".h", ".o")]
        if not cands:
            pytest.skip("reference binary not found after build")
        binary = cands[0]
    return str(binary)


@pytest.mark.slow
@pytest.mark.parametrize("scene,image", [
    ("simple", "simple.ppm"),                          # SSAA path, no golden
    ("simple_reflectance", "simple_reflectance.ppm"),  # mirror recursion
])
def test_ssaa_parity_vs_reference_binary(reference_binary, tmp_path, scene,
                                         image):
    """Our --ssaa 2 parity mode vs the committed reference's SSAA output."""
    xml = f"{REF}/inputs/{scene}.xml"
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    r = subprocess.run(
        [reference_binary, xml], cwd=ref_dir, capture_output=True, timeout=600
    )
    assert r.returncode == 0, r.stderr[-400:]
    ref_img = read_ppm(str(ref_dir / image)).astype(int)

    ours_dir = tmp_path / "ours"
    main([xml, "--ssaa", "2", "--ssaa-mode", "parity",
          "--out-dir", str(ours_dir)])
    our_img = read_ppm(str(ours_dir / image)).astype(int)

    d = np.abs(ref_img - our_img)
    # same tolerance class as the no-AA goldens: near-exact with isolated
    # silhouette-edge rounding flips
    assert (d > 1).mean() < 2e-3, ((d > 1).sum(), d.max())
    assert (d <= 1).mean() > 0.998
