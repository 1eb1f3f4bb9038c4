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


def _build_reference(tmp_path_factory, disable_ssaa: bool):
    if shutil.which("g++") is None:
        pytest.skip("no C++ toolchain")
    src = tmp_path_factory.mktemp("refbuild_noaa" if disable_ssaa else "refbuild")
    for f in ("raytracer.cpp", "bvh.h", "parser.h", "parser.cpp",
              "ppm.cpp", "ppm.h", "tinyxml2.cpp", "tinyxml2.h", "Makefile"):
        try:
            shutil.copy(f"{REF}/{f}", src / f)
        except FileNotFoundError:
            pytest.skip(f"reference source {f} unavailable")
    if disable_ssaa:
        # flip the committed compile-time SSAA flag (raytracer.cpp:26-28)
        # in OUR build copy: the bundled goldens are no-AA (SURVEY §4)
        cpp = (src / "raytracer.cpp").read_text()
        cpp = cpp.replace("#define DO_SSAA_ANTI_ALIASING true",
                          "#define DO_SSAA_ANTI_ALIASING false")
        (src / "raytracer.cpp").write_text(cpp)
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


@pytest.fixture(scope="module")
def reference_binary(tmp_path_factory):
    return _build_reference(tmp_path_factory, disable_ssaa=False)


@pytest.fixture(scope="module")
def reference_binary_noaa(tmp_path_factory):
    return _build_reference(tmp_path_factory, disable_ssaa=True)


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


ALL_SCENES = [
    "simple", "simple_shading", "simple_reflectance", "cornellbox",
    "mirror_spheres", "marbles", "monkey", "bunny", "low_poly",
    "berserker", "car", "dragon_lowres", "horse_and_mug",
]
# killeroo.xml is stripped from the mount (.MISSING_LARGE_BLOBS); its golden
# exists but the scene cannot be exercised.


def _run_scene_pair(binary, tmp_path, scene, our_args):
    """Run the reference binary and our CLI on `scene`; yield per-camera
    (image_name, ref uint8, ours uint8)."""
    xml = f"{REF}/inputs/{scene}.xml"
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir(exist_ok=True)
    r = subprocess.run([binary, xml], cwd=ref_dir, capture_output=True,
                       timeout=1200)
    assert r.returncode == 0, r.stderr[-400:]
    ours_dir = tmp_path / "ours"
    main([xml, "--out-dir", str(ours_dir), *our_args])
    for ppm in sorted(ref_dir.glob("*.ppm")):
        yield ppm.name, read_ppm(str(ppm)).astype(int), read_ppm(
            str(ours_dir / ppm.name)).astype(int)


def _stats(ref, ours):
    d = np.abs(ref - ours)
    return {
        "frac_diff": float((d > 0).mean()),
        "frac_gt2": float((d > 2).mean()),
        "max": int(d.max()),
        "mse": float((d.astype(float) ** 2).mean()),
    }


# Tolerances are the reference binary's OWN noise class vs the TA goldens
# (SURVEY §4: +-few LSB everywhere, isolated silhouette-edge flips that can
# be large).  Mirror-heavy scenes accumulate reordered-float divergence
# through up to 6 bounces, so the edge-flip allowance is per-scene.
FULLRES_TOL = {
    #            frac(d>2)  mse
    "default":   (2e-3,     8.0),
    "mirror_spheres": (4e-3, 30.0),
    "marbles":   (4e-3,    30.0),
    "cornellbox": (2e-3,   30.0),
}


@pytest.mark.veryslow
@pytest.mark.parametrize("scene", ALL_SCENES)
def test_full_res_noaa_parity(reference_binary_noaa, tmp_path, scene):
    """Every bundled scene, full resolution, no AA, every camera, vs the
    no-AA reference binary (VERDICT round-1 item 4).  Per-scene stats are
    recorded in BASELINE.md."""
    tol = FULLRES_TOL.get(scene, FULLRES_TOL["default"])
    for name, ref, ours in _run_scene_pair(
            reference_binary_noaa, tmp_path, scene,
            ["--ssaa", "1", "--engine", "bvh"]):
        s = _stats(ref, ours)
        print(f"PARITY {scene}/{name}: {s}")
        assert s["frac_gt2"] <= tol[0], (name, s)
        assert s["mse"] <= tol[1], (name, s)


@pytest.mark.veryslow
@pytest.mark.parametrize("scene", ALL_SCENES)
def test_full_res_ssaa_parity(reference_binary, tmp_path, scene):
    """Every bundled scene vs the COMMITTED reference configuration
    (2x SSAA, truncating uint8 box filter)."""
    tol = FULLRES_TOL.get(scene, FULLRES_TOL["default"])
    for name, ref, ours in _run_scene_pair(
            reference_binary, tmp_path, scene,
            ["--ssaa", "2", "--ssaa-mode", "parity", "--engine", "bvh"]):
        s = _stats(ref, ours)
        print(f"PARITY-SSAA {scene}/{name}: {s}")
        assert s["frac_gt2"] <= tol[0], (name, s)
        assert s["mse"] <= tol[1], (name, s)
