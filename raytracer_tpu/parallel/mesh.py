"""Device mesh helpers.

One logical axis, ``"rays"``: ray tracing has no cross-ray communication
until the final image gather, so a 1-D mesh over all chips (flattening any
physical 2-D/3-D topology) is the idiomatic layout — every collective is a
single all-gather/psum that XLA lays onto ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, n: Optional[int] = None) -> Mesh:
    """A 1-D mesh over ``devices`` (default: all), optionally truncated to n."""
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if n is not None:
        if len(devices) < n:
            raise ValueError(f"need {n} devices, have {len(devices)}")
        devices = devices[:n]
    return Mesh(np.array(devices), (RAY_AXIS,))


def mesh_from_arg(arg: str = "auto") -> Optional[Mesh]:
    """CLI ``--mesh`` handling shared by the render/serve/train entry
    points: ``"auto"`` = all local devices, an integer = the first N.
    Returns None when only one device would be used (callers then take
    their single-device path)."""
    n = len(jax.devices()) if arg == "auto" else int(arg)
    return make_mesh(n=n) if n > 1 else None


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) axis across the mesh."""
    return NamedSharding(mesh, P(RAY_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated (scene, BVH, parameters)."""
    return NamedSharding(mesh, P())
