"""Native C++ runtime vs pure-Python fallbacks: bit-identical results."""

import numpy as np
import pytest

import raytracer_tpu.models.bvh as bvh_mod
import raytracer_tpu.utils.native as native_mod
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.utils.ppm import write_ppm


def _force_python(monkeypatch):
    monkeypatch.setattr(native_mod, "_tried", True)
    monkeypatch.setattr(native_mod, "_lib", None)


@pytest.fixture
def native_lib():
    lib = native_mod.load()
    if lib is None:
        pytest.skip("native library unavailable (no C++ toolchain)")
    return lib


def test_bvh_native_matches_python(reference_inputs, native_lib, monkeypatch):
    data, meta = load_scene(f"{reference_inputs}/bunny.xml")
    b_native = bvh_mod.build_bvh(data, meta)
    _force_python(monkeypatch)
    b_python = bvh_mod.build_bvh(data, meta)
    for f in ("box_min", "box_max", "skip", "leaf_start", "leaf_count",
              "axis", "prim_idx"):
        np.testing.assert_array_equal(
            np.asarray(getattr(b_native, f)), np.asarray(getattr(b_python, f)),
            err_msg=f,
        )
    bvh_mod.validate_bvh(b_native, meta.n_tris + meta.n_spheres)


def test_ppm_native_matches_python(tmp_path, native_lib, monkeypatch):
    img = np.random.default_rng(7).integers(0, 256, (21, 33, 3)).astype(np.uint8)
    p_native = tmp_path / "native.ppm"
    write_ppm(str(p_native), img)
    _force_python(monkeypatch)
    p_python = tmp_path / "python.ppm"
    write_ppm(str(p_python), img)
    assert p_native.read_bytes() == p_python.read_bytes()
