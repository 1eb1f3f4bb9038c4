"""Multi-device CLI: --mesh auto must be bitwise-identical to --mesh 1.

The reference parallelizes automatically with hardware_concurrency()
threads (/root/reference/raytracer.cpp:367-377); our CLI's analog is
--mesh auto, sharding each row band's ray axis over all local devices
(models.whitted._render_band_jit).  These tests run on the conftest's
forced 8-device CPU mesh and pin the VERDICT round-3 done-criteria:
bitwise-identical PPMs vs single-device at --ssaa 1 AND --ssaa 2.
"""

import numpy as np
import pytest

from raytracer_tpu.render import main
from raytracer_tpu.utils.ppm import read_ppm


@pytest.mark.parametrize("ssaa", ["1", "2"])
def test_cli_mesh_bitwise_vs_single_device(reference_inputs, tmp_path, ssaa):
    import jax

    assert len(jax.devices()) == 8  # conftest's forced CPU mesh
    common = [f"{reference_inputs}/simple.xml", "--ssaa", ssaa,
              "--engine", "cluster"]
    main(common + ["--mesh", "1", "--out-dir", str(tmp_path / "single")])
    main(common + ["--mesh", "auto", "--out-dir", str(tmp_path / "mesh")])
    a = read_ppm(str(tmp_path / "single" / "simple.ppm"))
    b = read_ppm(str(tmp_path / "mesh" / "simple.ppm"))
    assert a.shape == (800, 800, 3)
    np.testing.assert_array_equal(a, b)


def test_cli_mesh_explicit_n(reference_inputs, tmp_path, capsys):
    """--mesh N uses exactly N devices and still matches single-device."""
    common = [f"{reference_inputs}/simple_shading.xml", "--ssaa", "1",
              "--engine", "cluster"]
    main(common + ["--mesh", "1", "--out-dir", str(tmp_path / "single")])
    main(common + ["--mesh", "4", "--out-dir", str(tmp_path / "mesh")])
    out = capsys.readouterr().out
    assert "Rendering with 4 devices" in out
    a = read_ppm(str(tmp_path / "single" / "simple_shading.ppm"))
    b = read_ppm(str(tmp_path / "mesh" / "simple_shading.ppm"))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("height", [144, 150])
def test_mesh_streamed_band_padding(reference_inputs, height):
    """A frame whose height doesn't divide the aligned band height takes
    the virtual-pad-rows path (trailing band rendered long, cropped) and
    still matches single-device bitwise.

    height=150 is deliberately NOT a multiple of the 8-row tile block:
    the real/pad boundary lands mid tile-block, so boundary tiles mix
    virtual-row rays into real pixels' shortlists.  Extra rays only WIDEN
    a tile's cluster shortlist (a sound superset — a real ray cannot hit
    a cluster box its slab test misses), so each real ray tests the same
    winning primitives; composition can only reorder visits, which is
    observable solely in the exact-float-t tie class the engine already
    documents (_closest_kernel docstring).  This test pins the boundary
    case bitwise on simple.xml."""
    import dataclasses

    import jax

    from raytracer_tpu.models.bvh import build_bvh
    from raytracer_tpu.models.clusters import build_clusters
    from raytracer_tpu.models.scene import load_scene
    from raytracer_tpu.models.whitted import render_camera_streamed
    from raytracer_tpu.parallel.mesh import make_mesh

    data, meta = load_scene(f"{reference_inputs}/simple.xml")
    cset = build_clusters(data, meta, build_bvh(data, meta))
    # 144 rows: lcm(16, 8*8 shard rows) = 64 doesn't divide 144
    cam = dataclasses.replace(meta.cameras[0], width=128, height=height)
    mesh = make_mesh(jax.devices())
    single = np.asarray(render_camera_streamed(
        data, meta, cam, bvh=cset, engine="cluster"))
    sharded = np.asarray(render_camera_streamed(
        data, meta, cam, bvh=cset, engine="cluster", mesh=mesh))
    assert sharded.shape == (height, 128, 3)
    np.testing.assert_array_equal(single, sharded)
