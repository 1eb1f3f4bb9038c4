"""Repeatable ON-HARDWARE certification (VERDICT round-3 item 3).

One command re-pins cluster-engine-vs-reference-binary parity AND the
throughput bar on the real TPU chip after any kernel change:

    RAYTRACER_TPU_TESTS=1 python -m pytest tests -m tpu -q

Replaces the one-off experiment sweeps (exp_scene_sweep_tpu.py) as the
hardware gate.  Scene selection: marbles + mirror_spheres (the
deep-recursion sphere scenes where kernel changes bite hardest) and
horse_and_mug (the benchmark scene; throughput bar >= 10 Mrays/s
sustained, vs the 11.9 recorded in BASELINE.md).  Golden semantics:
the freshly built NO-AA reference binary (the TA goldens are no-AA,
/root/reference/outputs_nobfc/README.txt), tolerances from the
full-res CPU certification (tests/test_reference_binary.py).
"""

import time

import numpy as np
import pytest

from raytracer_tpu.render import main
from raytracer_tpu.utils.ppm import read_ppm
from tests.test_reference_binary import (
    FULLRES_TOL, REF, _build_reference, _stats,
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


@pytest.mark.parametrize("scene", ["marbles", "mirror_spheres",
                                   "horse_and_mug"])
def test_tpu_cluster_parity(tpu_backend, ref_binary_noaa, tmp_path, scene):
    """Cluster engine on the chip vs the no-AA reference binary."""
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
