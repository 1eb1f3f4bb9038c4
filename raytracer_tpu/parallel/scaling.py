"""Scaling-efficiency harness: rays/s versus mesh size.

The reference's only scaling story is pthread row interleaving inside one
process (raytracer.cpp:367-380).  Ours is the sharded ray axis; because
rays never communicate, throughput should scale ~linearly with chips
(BASELINE.md north-star: >= 85% efficiency at >= 2 hosts).  This harness
measures it: for each mesh size n it renders the same camera with the ray
axis sharded over the first n devices and reports sustained rays/s.

On real multi-chip hardware the numbers are the scaling curve; on a CPU
host with XLA_FLAGS=--xla_force_host_platform_device_count=N the "devices"
share the same cores, so the harness validates partitioning/dispatch
correctness rather than genuine speedup (wall-clock efficiency on a
virtual mesh is meaningless and is NOT asserted by tests).
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.models.scene import SceneMeta, SceneData
from raytracer_tpu.parallel.mesh import make_mesh, ray_sharding, replicated
from raytracer_tpu.parallel.render import render_rays_sharded


@dataclasses.dataclass
class ScalePoint:
    n_devices: int
    rays_per_s: float
    seconds_per_frame: float
    efficiency: float  # rays_per_s / (n * rays_per_s[n=1])


def measure_scaling(
    data: SceneData,
    meta: SceneMeta,
    origin,
    dirs,
    accel=None,
    engine: str = "brute",
    sizes: Optional[Sequence[int]] = None,
    frames: int = 3,
) -> List[ScalePoint]:
    """Render the wavefront at each mesh size; returns the scaling curve.

    Timing follows bench.py's methodology: `frames` pipelined repeats with
    one scalar-reduction sync (device-side readbacks are the only reliable
    sync on the tunneled axon platform; see BASELINE.md).
    """
    devices = jax.devices()
    if sizes is None:
        sizes = [n for n in (1, 2, 4, 8) if n <= len(devices)]
    r = int(np.asarray(dirs).shape[0])
    points: List[ScalePoint] = []
    base = None
    for n in sizes:
        mesh = make_mesh(n=n)
        d_data = jax.device_put(data, replicated(mesh))
        d_accel = (
            jax.device_put(accel, replicated(mesh)) if accel is not None else None
        )
        rr = r - (r % n) if r % n else r
        d_dirs = jax.device_put(jnp.asarray(dirs)[:rr], ray_sharding(mesh))

        def frame():
            color = render_rays_sharded(
                d_data, meta, origin, d_dirs, mesh, bvh=d_accel, engine=engine
            )
            return color

        # warm up + compile
        float(frame().sum())
        t0 = time.perf_counter()
        out = None
        for _ in range(frames):
            out = frame()
        float(out.sum())  # single sync for the pipelined frames
        dt = (time.perf_counter() - t0) / frames
        rays_per_s = rr / dt
        if base is None:
            base = rays_per_s
        points.append(
            ScalePoint(
                n_devices=n,
                rays_per_s=rays_per_s,
                seconds_per_frame=dt,
                efficiency=rays_per_s / (n * base),
            )
        )
    return points
