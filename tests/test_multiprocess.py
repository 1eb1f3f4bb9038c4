"""TRUE multi-process runtime test: two OS processes bring up
`jax.distributed` (CPU/gloo), build a GLOBAL 2-device mesh, render a
ray-sharded wavefront where each process holds only its own shard, and
assemble the full image via the cross-process gather path
(`parallel.distributed.assemble_image` -> `process_allgather`).

This exercises the code path the in-process 8-device mesh tests cannot:
non-addressable shards, the coordinator bring-up, and package import
BEFORE backend initialization (module-level jnp constants would break
`jax.distributed.initialize`; see ops/cluster_trace.py MISS/_BIG).
"""

import os
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import sys
    import jax  # import must NOT initialize the backend

    pid = int(sys.argv[1])
    port = sys.argv[2]
    from raytracer_tpu.parallel.distributed import assemble_image, initialize

    idx = initialize(f"127.0.0.1:{port}", 2, pid)
    assert idx == pid, (idx, pid)
    assert jax.process_count() == 2

    import dataclasses
    import numpy as np
    import jax.numpy as jnp

    from raytracer_tpu.models.scene import load_scene
    from raytracer_tpu.models.whitted import render_rays
    from raytracer_tpu.ops.camera import eye_rays
    from raytracer_tpu.parallel.mesh import make_mesh, ray_sharding, replicated
    from raytracer_tpu.parallel.render import render_rays_sharded

    data, meta = load_scene("/root/reference/inputs/simple.xml")
    cam = dataclasses.replace(meta.cameras[0], width=16, height=16)
    origin, dirs = eye_rays(cam)
    dirs = np.asarray(dirs, np.float32)
    r = dirs.shape[0]

    assert len(jax.devices()) == 2, jax.devices()
    mesh = make_mesh()  # GLOBAL mesh: one device per process
    sh = ray_sharding(mesh)
    # each process feeds ONLY its local half of the wavefront
    local = dirs[pid * (r // 2) : (pid + 1) * (r // 2)]
    gdirs = jax.make_array_from_process_local_data(sh, local, (r, 3))
    gdata = jax.device_put(data, replicated(mesh))

    color = render_rays_sharded(gdata, meta, jnp.asarray(origin), gdirs,
                                mesh, engine="brute")
    img = assemble_image(color)
    assert img.shape == (r, 3)

    # reference: plain single-device render of the full wavefront
    ldata = jax.tree.map(jnp.asarray, data)
    ref = np.asarray(render_rays(ldata, meta, jnp.asarray(origin),
                                 jnp.asarray(dirs), engine="brute"))
    np.testing.assert_allclose(img, ref, rtol=1e-6, atol=1e-6)

    # round 4: the CLI pipeline path (banded streaming + quantization,
    # ray axis shard_map'ed, multi-host assemble_image gather) on the
    # same global mesh, bitwise vs a local single-device render
    from raytracer_tpu.pipeline import render_one_camera

    cam2 = dataclasses.replace(meta.cameras[0], width=32, height=32)
    img2, _ = render_one_camera(gdata, meta, cam2, None, engine="brute",
                                ssaa=1, mesh=mesh)
    ref2, _ = render_one_camera(ldata, meta, cam2, None, engine="brute",
                                ssaa=1)
    np.testing.assert_array_equal(img2, ref2)
    print(f"proc {pid}: ok", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_distributed_render(tmp_path):
    worker = tmp_path / "mp_worker.py"
    worker.write_text(_WORKER)
    env = {
        **os.environ,
        # fresh CPU-only processes: drop the axon TPU plugin's site dir
        # and any forced device counts from the parent test env
        "PYTHONPATH": "/root/repo",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "",
    }
    port = str(50000 + os.getpid() % 10000)  # avoid cross-run collisions
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), port],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid}: ok" in out
