"""Repeatable ON-HARDWARE certification (VERDICT round-3 item 3;
broadened to the FULL gate in round 5 per VERDICT round-4 item 3).

One command re-pins, on the real TPU chip, everything BASELINE claims:

    RAYTRACER_TPU_TESTS=1 python -m pytest tests -m tpu -q

  - cluster-engine-vs-reference-binary parity on ALL 13 bundled scenes
    at full resolution (the whole matrix, like the CPU --run-veryslow
    sweep; tolerances from tests/test_reference_binary.py),
  - the >= 10 Mrays/s sustained throughput bar on horse_and_mug,
  - a synthetic >512-cluster-column terrain so the HIERARCHICAL mask
    and the cluster-axis SEGMENTATION compile and run under Mosaic
    inside the gate (previously certified only by one-off experiments),
  - the cluster kernels under jax.shard_map on the chip (the --mesh
    CLI path's trace context; virtual-CPU meshes cannot certify the
    Mosaic lowering).

Runtime: ~25-35 min through the axon tunnel, dominated by the 13
reference-binary renders + per-scene compiles (persistent compile cache
makes re-runs much faster).  Golden semantics: the freshly built NO-AA
reference binary (the TA goldens are no-AA,
/root/reference/outputs_nobfc/README.txt).
"""

import time

import numpy as np
import pytest

from raytracer_tpu.render import main
from raytracer_tpu.utils.ppm import read_ppm
from tests.test_reference_binary import (
    ALL_SCENES, FULLRES_TOL, REF, _build_reference, _stats,
)

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu_backend():
    import jax

    if jax.default_backend() in ("cpu",):
        pytest.skip("no TPU backend — this module certifies real hardware")
    return jax.default_backend()


@pytest.fixture(scope="module")
def ref_binary_noaa(tmp_path_factory):
    return _build_reference(tmp_path_factory, disable_ssaa=True)


@pytest.mark.parametrize("scene", ALL_SCENES)
def test_tpu_cluster_parity(tpu_backend, ref_binary_noaa, tmp_path, scene):
    """Cluster engine on the chip vs the no-AA reference binary — the
    WHOLE scene matrix (round 5; previously marbles/mirror_spheres/
    horse_and_mug only)."""
    import subprocess

    xml = f"{REF}/inputs/{scene}.xml"
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    r = subprocess.run([ref_binary_noaa, xml], cwd=ref_dir,
                       capture_output=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-400:]
    ours_dir = tmp_path / "ours"
    main([xml, "--ssaa", "1", "--engine", "cluster",
          "--out-dir", str(ours_dir)])
    tol = FULLRES_TOL.get(scene, FULLRES_TOL["default"])
    for ppm in sorted(ref_dir.glob("*.ppm")):
        ref_img = read_ppm(str(ppm)).astype(int)
        our_img = read_ppm(str(ours_dir / ppm.name)).astype(int)
        s = _stats(ref_img, our_img)
        print(f"TPU-PARITY {scene}/{ppm.name}: {s}")
        assert s["frac_gt2"] <= tol[0], (ppm.name, s)
        assert s["mse"] <= tol[1], (ppm.name, s)


def test_tpu_hier_mask_and_segmentation(tpu_backend):
    """A synthetic 135k-triangle terrain (>512 cluster columns AND
    >SEG_SLOTS primitive slots) renders on the chip through the
    HIERARCHICAL mask kernel + cluster-axis segmentation, and matches
    the brute all-pairs engine on the same chip.  Brute-vs-cluster is
    pinned bitwise on CPU; on hardware the two run through different
    compilers (Mosaic vs XLA fusion), so the bar here is quantized
    agreement within the documented silhouette class."""
    import jax
    import jax.numpy as jnp

    from raytracer_tpu.models.bvh import build_bvh
    from raytracer_tpu.models.clusters import build_clusters
    from raytracer_tpu.models.whitted import render_camera
    from raytracer_tpu.ops import cluster_trace as ct
    from raytracer_tpu.ops.image import quantize
    from raytracer_tpu.utils.compile_cache import enable
    from raytracer_tpu.utils.synth import terrain_scene

    enable()
    data, meta = terrain_scene(cells=260, res=256)
    assert meta.n_tris > ct.SEG_SLOTS, "terrain must exceed SEG_SLOTS"
    bvh = build_bvh(data, meta)
    cset = build_clusters(data, meta, bvh)
    cpad = -(-cset.tri_cmin.shape[0] // 128) * 128
    assert cpad > ct._SUPER_MIN_CPAD, (
        f"cpad {cpad} must engage the hierarchical mask")
    cset = jax.device_put(cset)
    data = jax.device_put(data)
    cam = meta.cameras[0]
    img_c = np.asarray(quantize(render_camera(
        data, meta, cam, bvh=cset, engine="cluster"))).astype(int)
    img_b = np.asarray(quantize(render_camera(
        data, meta, cam, engine="brute"))).astype(int)
    d = np.abs(img_c - img_b)
    frac_gt2 = float((d > 2).mean())
    print(f"TPU-HIER terrain 135k: frac_gt2={frac_gt2:.2e} "
          f"max={int(d.max())}")
    assert frac_gt2 <= 2e-3, frac_gt2


def test_tpu_shard_map_kernels(tpu_backend):
    """The cluster kernels compile and run INSIDE jax.shard_map on the
    chip (the --mesh CLI path's trace context).  The CPU-mesh tests pin
    bitwise multi-device semantics; only hardware certifies the
    Mosaic-under-shard_map lowering.  On TPU the surrounding XLA ops
    (shade/glue — the kernels are opaque custom calls) fuse differently
    inside shard_map than in the direct jit, so the hardware bar is
    quantized <= 1 LSB + rtol 1e-4 radiance (measured: 0.165% of
    elements at <= 1.1e-5 relative)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    from raytracer_tpu.models.bvh import build_bvh
    from raytracer_tpu.models.clusters import build_clusters
    from raytracer_tpu.models.scene import load_scene
    from raytracer_tpu.models.whitted import render_rays
    from raytracer_tpu.ops.camera import camera_vectors, eye_rays_band
    from raytracer_tpu.ops.tiling import block_permutation
    from raytracer_tpu.parallel.mesh import RAY_AXIS
    from raytracer_tpu.utils.compile_cache import enable

    enable()
    data, meta = load_scene(f"{REF}/inputs/simple_reflectance.xml")
    cset = jax.device_put(build_clusters(data, meta, build_bvh(data, meta)))
    data = jax.device_put(data)
    import dataclasses

    cam = dataclasses.replace(meta.cameras[0], width=128, height=128)
    origin, dirs = eye_rays_band(jnp.asarray(camera_vectors(cam)),
                                 cam.width, cam.height, jnp.float32(0),
                                 cam.height)
    perm, _ = block_permutation(cam.height, cam.width, 8, 16)
    dirs = jnp.asarray(dirs)[jnp.asarray(perm)]
    origin = jnp.asarray(origin, jnp.float32)

    direct = render_rays(data, meta, origin, dirs, bvh=cset,
                         engine="cluster")
    mesh = Mesh(np.array(jax.devices()[:1]), (RAY_AXIS,))
    sharded = jax.shard_map(
        lambda dat, bv, org, dd: render_rays(dat, meta, org, dd, bvh=bv,
                                             engine="cluster"),
        mesh=mesh, in_specs=(P(), P(), P(), P(RAY_AXIS)),
        out_specs=P(RAY_AXIS), check_vma=False,
    )(data, cset, origin, dirs)
    a, b = np.asarray(direct), np.asarray(sharded)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)
    from raytracer_tpu.ops.image import quantize

    qa = np.asarray(quantize(jnp.asarray(a))).astype(int)
    qb = np.asarray(quantize(jnp.asarray(b))).astype(int)
    assert np.abs(qa - qb).max() <= 1, np.abs(qa - qb).max()


def test_tpu_throughput_bar(tpu_backend):
    """Sustained horse_and_mug >= 10 M primary rays/s on the chip
    (BASELINE.md records 11.9; this is the regression bar, not the
    record).  bench.py methodology: pipelined frames, one
    scalar-reduction sync (block_until_ready alone does not drain the
    axon tunnel queue — ROADMAP.md methodology note)."""
    import jax
    import jax.numpy as jnp

    from raytracer_tpu.models.bvh import build_bvh
    from raytracer_tpu.models.clusters import build_clusters
    from raytracer_tpu.models.scene import load_scene
    from raytracer_tpu.models.whitted import render_camera
    from raytracer_tpu.utils.compile_cache import enable

    enable()
    data, meta = load_scene(f"{REF}/inputs/horse_and_mug.xml")
    accel = jax.device_put(build_clusters(data, meta, build_bvh(data, meta)))
    data = jax.device_put(data)
    cam = meta.cameras[0]

    def once():
        return render_camera(data, meta, cam, bvh=accel, engine="cluster",
                             chunk=1 << 21)

    for _ in range(3):  # warmup incl. the fresh-process first-scene artifact
        float(jnp.sum(once()))
    n = 4
    t0 = time.perf_counter()
    imgs = [once() for _ in range(n)]
    s = float(sum(jnp.sum(im) for im in imgs))
    assert s == s
    dt = (time.perf_counter() - t0) / n
    mrays = cam.width * cam.height / dt / 1e6
    print(f"TPU-BENCH horse_and_mug: {dt * 1e3:.1f} ms/frame, "
          f"{mrays:.2f} Mrays/s")
    assert mrays >= 10.0, f"{mrays:.2f} Mrays/s below the 10.0 bar"
