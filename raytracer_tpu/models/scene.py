"""Scene data model: struct-of-arrays pytrees resident in device memory.

The reference keeps the scene as nested C++ structs with 1-based vertex and
material ids (``/root/reference/parser.h:170-251``) and flattens mesh faces
into one triangle soup at startup (``/root/reference/raytracer.cpp:336-348``).
Here the scene IS the flattened struct-of-arrays form from the start: every
per-primitive attribute is a padded, statically-shaped device array so the
whole pipeline jits, shards, and differentiates.

Differentiability contract: ``SceneData`` holds only arrays; gradients flow
into ``vertices`` (and through them into triangle geometry and sphere
centers, which are vertex references, mirroring parser.h:200-204), sphere
radii, material reflectances, and light position/intensity.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Tuple

import jax
import numpy as np

Array = Any


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SceneData:
    """All differentiable / device-resident scene state (a JAX pytree).

    Shapes use padded static sizes V, T, S, M, L; the ``*_valid`` masks mark
    real entries. Triangle order matches the reference's soup: lone
    ``<Triangle>`` objects first, then every mesh's faces in file order
    (raytracer.cpp:336-341) — ties in closest-hit then resolve identically.
    """

    vertices: Array        # (V, 3) f32
    tri_v: Array           # (T, 3) i32 — 0-based vertex indices
    tri_mat: Array         # (T,)   i32 — 0-based material index
    tri_valid: Array       # (T,)   bool
    sphere_cvid: Array     # (S,)   i32 — 0-based vertex index of the center
    sphere_rad: Array      # (S,)   f32
    sphere_mat: Array      # (S,)   i32
    sphere_valid: Array    # (S,)   bool
    mat_ambient: Array     # (M, 3) f32
    mat_diffuse: Array     # (M, 3) f32
    mat_specular: Array    # (M, 3) f32
    mat_mirror: Array      # (M, 3) f32
    mat_phong: Array       # (M,)   f32
    mat_is_mirror: Array   # (M,)   bool — set iff XML attribute type="mirror" (parser.cpp:119)
    light_pos: Array       # (L, 3) f32
    light_int: Array       # (L, 3) f32
    light_valid: Array     # (L,)   bool
    ambient_light: Array   # (3,)   f32
    background: Array      # (3,)   f32 — parsed as ints in the reference (parser.h:256)


@dataclasses.dataclass(frozen=True)
class Camera:
    """Static per-render camera config (mirrors parser.h:170-178).

    ``near_plane`` is (l, r, b, t) in the XML's order. None of position /
    gaze / up are normalized or re-orthonormalized — the reference uses them
    verbatim (raytracer.cpp:292-314).
    """

    position: Tuple[float, float, float]
    gaze: Tuple[float, float, float]
    up: Tuple[float, float, float]
    near_plane: Tuple[float, float, float, float]
    near_distance: float
    width: int
    height: int
    image_name: str

    def scaled(self, factor: int) -> "Camera":
        """Camera with resolution multiplied by `factor` (SSAA prepass,
        raytracer.cpp:506-509)."""
        return dataclasses.replace(
            self, width=self.width * factor, height=self.height * factor
        )


@dataclasses.dataclass(frozen=True)
class SceneMeta:
    """Static (non-traced) scene config: loop bounds and true counts."""

    shadow_eps: float
    max_depth: int
    cameras: Tuple[Camera, ...]
    n_verts: int
    n_tris: int
    n_spheres: int
    n_materials: int
    n_lights: int


def _pad_to(arr: np.ndarray, n: int, fill=0) -> np.ndarray:
    if arr.shape[0] == n:
        return arr
    pad_shape = (n - arr.shape[0],) + arr.shape[1:]
    return np.concatenate([arr, np.full(pad_shape, fill, dtype=arr.dtype)], axis=0)


def _round_up(n: int, m: int) -> int:
    return max(m, ((n + m - 1) // m) * m)


def from_parsed(parsed: dict, pad_multiple: int = 8) -> Tuple[SceneData, SceneMeta]:
    """Build the SoA scene from the dict produced by utils.xml_ingest.parse_xml.

    Pads primitive axes up to a multiple of ``pad_multiple`` so jit caches
    stay warm across scenes of similar size.
    """
    verts = np.asarray(parsed["vertices"], dtype=np.float32).reshape(-1, 3)
    V = max(1, verts.shape[0])
    verts = _pad_to(verts, V)

    # triangle soup: lone triangles first, then mesh faces (raytracer.cpp:336-341)
    tri_v: List[Tuple[int, int, int]] = []
    tri_mat: List[int] = []
    for mat_id, (i0, i1, i2) in parsed["triangles"]:
        tri_v.append((i0 - 1, i1 - 1, i2 - 1))
        tri_mat.append(mat_id - 1)
    for mat_id, faces in parsed["meshes"]:
        for (i0, i1, i2) in faces:
            tri_v.append((i0 - 1, i1 - 1, i2 - 1))
            tri_mat.append(mat_id - 1)
    n_tris = len(tri_v)
    T = _round_up(n_tris, pad_multiple)
    tri_v_a = _pad_to(np.asarray(tri_v, dtype=np.int32).reshape(-1, 3), T)
    tri_mat_a = _pad_to(np.asarray(tri_mat, dtype=np.int32).reshape(-1), T)
    tri_valid = np.arange(T) < n_tris

    spheres = parsed["spheres"]  # list of (mat_id, center_vid, radius)
    n_spheres = len(spheres)
    S = _round_up(n_spheres, pad_multiple)
    sph_cvid = _pad_to(
        np.asarray([s[1] - 1 for s in spheres], dtype=np.int32).reshape(-1), S
    )
    sph_rad = _pad_to(
        np.asarray([s[2] for s in spheres], dtype=np.float32).reshape(-1), S
    )
    sph_mat = _pad_to(
        np.asarray([s[0] - 1 for s in spheres], dtype=np.int32).reshape(-1), S
    )
    sph_valid = np.arange(S) < n_spheres

    mats = parsed["materials"]  # list of dicts
    n_mats = len(mats)
    M = max(1, n_mats)

    def mat_field(key, dim):
        a = np.asarray([m[key] for m in mats], dtype=np.float32).reshape(n_mats, dim)
        return _pad_to(a, M)

    lights = parsed["point_lights"]  # list of (pos, intensity)
    n_lights = len(lights)
    L = max(1, n_lights)
    light_pos = _pad_to(
        np.asarray([l[0] for l in lights], dtype=np.float32).reshape(n_lights, 3), L
    )
    light_int = _pad_to(
        np.asarray([l[1] for l in lights], dtype=np.float32).reshape(n_lights, 3), L
    )
    light_valid = np.arange(L) < n_lights

    data = SceneData(
        vertices=verts,
        tri_v=tri_v_a,
        tri_mat=tri_mat_a,
        tri_valid=tri_valid,
        sphere_cvid=sph_cvid,
        sphere_rad=sph_rad,
        sphere_mat=sph_mat,
        sphere_valid=sph_valid,
        mat_ambient=mat_field("ambient", 3),
        mat_diffuse=mat_field("diffuse", 3),
        mat_specular=mat_field("specular", 3),
        mat_mirror=mat_field("mirror", 3),
        mat_phong=_pad_to(
            np.asarray([m["phong"] for m in mats], dtype=np.float32).reshape(-1), M
        ),
        mat_is_mirror=_pad_to(
            np.asarray([m["is_mirror"] for m in mats], dtype=bool).reshape(-1), M,
            fill=False,
        ),
        light_pos=light_pos,
        light_int=light_int,
        light_valid=light_valid,
        ambient_light=np.asarray(parsed["ambient_light"], dtype=np.float32),
        background=np.asarray(parsed["background"], dtype=np.float32),
    )
    data = jax.tree.map(lambda x: np.asarray(x), data)

    cameras = tuple(
        Camera(
            position=tuple(c["position"]),
            gaze=tuple(c["gaze"]),
            up=tuple(c["up"]),
            near_plane=tuple(c["near_plane"]),
            near_distance=c["near_distance"],
            width=c["width"],
            height=c["height"],
            image_name=c["image_name"],
        )
        for c in parsed["cameras"]
    )
    meta = SceneMeta(
        shadow_eps=float(parsed["shadow_eps"]),
        max_depth=int(parsed["max_depth"]),
        cameras=cameras,
        n_verts=verts.shape[0],
        n_tris=n_tris,
        n_spheres=n_spheres,
        n_materials=n_mats,
        n_lights=n_lights,
    )
    return data, meta


def load_scene(path: str, pad_multiple: int = 8) -> Tuple[SceneData, SceneMeta]:
    """Parse a CENG477 scene XML into (SceneData, SceneMeta)."""
    from raytracer_tpu.utils.xml_ingest import parse_xml

    return from_parsed(parse_xml(path), pad_multiple=pad_multiple)
