"""Cluster acceleration structure: the TPU-native answer to the BVH.

The reference accelerates per-ray traversal with a deep binary BVH walked
by a divergent stack (/root/reference/bvh.h, raytracer.cpp:177-280).  A
per-ray pointer walk is the wrong shape for a 8x128-lane vector machine;
what the VPU wants is DENSE tiles of ray x primitive tests with no gathers.

So the accelerator here is flat and two-level:

  - primitives are reordered into SPATIALLY COHERENT, FIXED-SIZE CLUSTERS
    (CLUSTER=128 = one VPU lane row).  The order comes from the reference
    BVH build's preorder leaf sequence (models.bvh), which is exactly a
    space-filling order of the primitive soup; consecutive runs of 128
    primitives therefore have tight bounding boxes.
  - every RAY is slab-tested exactly against every cluster AABB,
    OR-reduced over its TILE (ops.cluster_trace.ray_cluster_mask, a
    dense rays x clusters computation run as a Pallas kernel on TPU);
    shared-origin eye tiles use the cheaper interval-arithmetic tile
    test (ops.cluster_trace.tile_cluster_mask), which is near-tight
    for coherent frusta.
  - surviving (tile, cluster) pairs are intersected densely by a Pallas
    kernel: rays on sublanes x 128 cluster primitives on lanes, both
    operands resident in VMEM.

Triangles and spheres get separate cluster sets (their tests differ);
sphere clusters are visited after triangle clusters, preserving the
reference's leaf test order (raytracer.cpp:199-216) under strict-< best
updates.

Triangle data is stored in the Wald projection form (n = e1 x e2 plus the
dual basis w1, w2 of the edges and their scalar products with vertex a),
which evaluates t/beta/gamma in ~22 VPU ops/pair instead of ~45 for the
three-determinant Cramer solve the reference uses (raytracer.cpp:129-175).
Acceptance semantics (inclusive edges, t >= 0, no backface culling, sphere
negative-t quirk) are identical; float rounding differs at silhouette
edges exactly like any reordering of the same math.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import numpy as np

from raytracer_tpu.models.bvh import BVH
from raytracer_tpu.models.scene import SceneData, SceneMeta

Array = Any

CLUSTER = 128  # primitives per cluster = one f32 lane row


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ClusterSet:
    """Device-resident cluster acceleration data (a JAX pytree).

    Pt/Ps are the padded (multiple-of-CLUSTER) triangle/sphere slot
    counts; Ct/Cs the cluster counts.  `*_slot` maps kernel slot index ->
    global primitive id in the owning SceneData's encoding (tris [0, T),
    spheres T + s); padding slots map to 0 but are masked in-kernel by the
    static real counts `n_tri` / `n_sph`.
    """

    tri_dat: Array    # (12, Pt) f32: n, w1, w2 (xyz each), n.a, w1.a, w2.a
    tri_slot: Array   # (Pt,) i32 global tri id per slot
    tri_cmin: Array   # (Ct, 3) f32 cluster AABB (fattened not needed: exact)
    tri_cmax: Array   # (Ct, 3) f32
    sph_dat: Array    # (4, Ps) f32: cx, cy, cz, r
    sph_slot: Array   # (Ps,) i32 global prim id per slot (T_pad + s)
    sph_cmin: Array   # (Cs, 3) f32
    sph_cmax: Array   # (Cs, 3) f32
    # per-slot shading table (tris then spheres, Pt + Ps rows): lets the
    # forward path turn a kernel (t, slot) into a full Hit with ONE gather
    # (ops.shade.refine_hit stays as the differentiable path).  Columns:
    # 0-2 = tri unit geometric normal (normalize((b-a)x(c-a)),
    # raytracer.cpp:342-348) or sphere center; 3 = sphere radius (0 for
    # tris); 4 = material id (exact small int in f32); 5 = global prim id
    # (tris [0, T), spheres T_pad + s; exact in f32 below 2^24), so the
    # fast path needs ONE row gather instead of three; 6-7 padding
    slot_pack: Array  # (Pt+Ps, 8) f32
    # verbatim f32 triangle vertices per slot (rows: ax ay az bx by bz cx
    # cy cz; zero on padding slots).  Source data for the per-light shadow
    # plane tables (ops.cluster_trace.build_shadow_planes), built on
    # DEVICE each render so moving lights stay correct in training loops.
    tri_verts: Array  # (9, Pt) f32
    # static (non-pytree) metadata
    n_tri: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_sph: int = dataclasses.field(metadata=dict(static=True), default=0)


def _pad_to_multiple(n: int, m: int) -> int:
    return max(m, ((n + m - 1) // m) * m)


def _treelet_slots(bvh: BVH, max_size: int) -> np.ndarray:
    """Treelet partition of the BVH's preorder primitive sequence.

    Returns slot_of_prim (P,): for preorder position p, the padded slot
    index it occupies.  Greedy top-down: the largest subtrees holding
    <= max_size primitives become clusters (their preorder prim ranges are
    contiguous by construction), so cluster boxes are REAL BVH subtree
    boxes instead of arbitrary 128-strides — 2.6x fewer per-ray box
    crossings on horse_and_mug at the cost of ~1.65x more clusters.
    Oversized depth-19 leaves fall back to max_size chunks.
    """
    counts = np.asarray(bvh.leaf_count, np.int64)
    skip = np.asarray(bvh.skip, np.int64)
    n = counts.shape[0]
    cum = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=cum[1:])  # cum[i] = prims before node i (preorder)
    ranges = []  # (lo, hi) prim ranges, preorder-ascending
    stack = [0]
    while stack:
        i = stack.pop()
        lo, hi = cum[i], cum[skip[i]]
        if hi <= lo:
            continue
        if hi - lo <= max_size or counts[i] > 0:
            for s in range(lo, hi, max_size):  # leaf larger than max_size
                ranges.append((s, min(s + max_size, hi)))
        else:  # inner: left = i+1, right = skip[i+1]; pop order keeps preorder
            stack.append(skip[i + 1])
            stack.append(i + 1)
    slot = np.zeros(cum[n], np.int64)
    base = 0
    for lo, hi in ranges:
        slot[lo:hi] = base + np.arange(hi - lo)
        base += CLUSTER * (-(-(hi - lo) // CLUSTER))
    return slot


def build_clusters(
    data: SceneData,
    meta: SceneMeta,
    bvh: Optional[BVH] = None,
    treelet: bool = False,
) -> ClusterSet:
    """Host-side build from (numpy-convertible) scene arrays.

    If a BVH is given, its reordered preorder primitive sequence provides
    the spatial clustering; otherwise file order is used (fine for tiny
    scenes).  ``treelet=True`` aligns triangle-cluster boundaries to BVH
    subtrees (tighter boxes, more clusters) — pays when the ray wavefront
    is surface-sorted so tile shortlist unions track per-ray crossings.
    """
    verts = np.asarray(data.vertices, np.float32)
    tri_v = np.asarray(data.tri_v, np.int64)
    t_pad = tri_v.shape[0]
    n_tri, n_sph = meta.n_tris, meta.n_spheres

    tri_pos = None  # padded slot per triangle (in tri_order order)
    if bvh is not None:
        order = np.asarray(bvh.prim_idx, np.int64)
        tri_order = order[order < t_pad][:n_tri]
        sph_order = order[order >= t_pad][:n_sph] - t_pad
        if tri_order.shape[0] != n_tri:  # safety: fall back to identity
            tri_order = np.arange(n_tri, dtype=np.int64)
        if sph_order.shape[0] != n_sph:
            sph_order = np.arange(n_sph, dtype=np.int64)
        if treelet and n_tri:
            # treelet partition over the FULL prim sequence, then projected
            # to triangles: a range's spheres are dropped from it (spheres
            # keep their own simple run clustering below), leaving gaps
            # that stay padded slots
            slot_all = _treelet_slots(bvh, CLUSTER)
            tri_pos = slot_all[np.asarray(order < t_pad).nonzero()[0][:n_tri]]
    else:
        tri_order = np.arange(n_tri, dtype=np.int64)
        sph_order = np.arange(n_sph, dtype=np.int64)

    # --- triangles in Wald projection form
    if tri_pos is None:
        tri_pos = np.arange(n_tri, dtype=np.int64)
    if n_tri:
        # compact away clusters that ended up with no triangles (treelet
        # ranges whose primitives were all spheres)
        used = np.zeros((int(tri_pos.max()) // CLUSTER + 1,), bool)
        used[tri_pos // CLUSTER] = True
        remap = np.cumsum(used) - 1
        tri_pos = remap[tri_pos // CLUSTER] * CLUSTER + tri_pos % CLUSTER
    Pt = _pad_to_multiple(int(tri_pos.max()) + 1 if n_tri else 0, CLUSTER)
    tri_dat = np.zeros((12, Pt), np.float32)
    tri_slot = np.zeros((Pt,), np.int32)
    if n_tri:
        v = tri_v[tri_order]
        a = verts[v[:, 0]].astype(np.float64)
        b = verts[v[:, 1]].astype(np.float64)
        c = verts[v[:, 2]].astype(np.float64)
        e1 = b - a
        e2 = c - a
        n = np.cross(e1, e2)
        nn = (n * n).sum(-1, keepdims=True)
        nn = np.where(nn == 0.0, 1.0, nn)  # degenerate tris can never hit
        w1 = np.cross(e2, n) / nn
        w2 = np.cross(n, e1) / nn
        tri_dat[0:3, tri_pos] = n.T
        tri_dat[3:6, tri_pos] = w1.T
        tri_dat[6:9, tri_pos] = w2.T
        tri_dat[9, tri_pos] = (n * a).sum(-1)
        tri_dat[10, tri_pos] = (w1 * a).sum(-1)
        tri_dat[11, tri_pos] = (w2 * a).sum(-1)
        tri_slot[tri_pos] = tri_order.astype(np.int32)

    Ct = Pt // CLUSTER
    tri_cmin = np.full((Ct, 3), np.inf, np.float32)
    tri_cmax = np.full((Ct, 3), -np.inf, np.float32)
    if n_tri:
        v = tri_v[tri_order]
        corners = verts[v]  # (n_tri, 3, 3)
        pmin = corners.min(axis=1)
        pmax = corners.max(axis=1)
        ci_of = tri_pos // CLUSTER
        np.minimum.at(tri_cmin, ci_of, pmin)
        np.maximum.at(tri_cmax, ci_of, pmax)

    # --- spheres
    Ps = _pad_to_multiple(n_sph, CLUSTER)
    sph_dat = np.zeros((4, Ps), np.float32)
    sph_slot = np.zeros((Ps,), np.int32)
    Cs = Ps // CLUSTER
    sph_cmin = np.full((Cs, 3), np.inf, np.float32)
    sph_cmax = np.full((Cs, 3), -np.inf, np.float32)
    if n_sph:
        centers = verts[np.asarray(data.sphere_cvid, np.int64)[sph_order]]
        radii = np.asarray(data.sphere_rad, np.float32)[sph_order]
        sph_dat[0:3, :n_sph] = centers.T
        sph_dat[3, :n_sph] = radii
        sph_slot[:n_sph] = (t_pad + sph_order).astype(np.int32)
        for ci in range(Cs):
            s, e = ci * CLUSTER, min((ci + 1) * CLUSTER, n_sph)
            if s < e:
                sph_cmin[ci] = (centers[s:e] - radii[s:e, None]).min(axis=0)
                sph_cmax[ci] = (centers[s:e] + radii[s:e, None]).max(axis=0)

    # clusters that ended up with NO primitives (n_tri == 0 / n_sph == 0
    # scenes keep one forced padding cluster) get NaN boxes: every slab
    # comparison is then False in both mask forms, so they are never
    # listed or visited (inf/-inf boxes would HIT every ray in the exact
    # mask's min/max-reordered slab test)
    empty_t = ~(tri_cmax >= tri_cmin).all(axis=1)
    tri_cmin[empty_t] = np.nan
    tri_cmax[empty_t] = np.nan
    empty_s = ~(sph_cmax >= sph_cmin).all(axis=1)
    sph_cmin[empty_s] = np.nan
    sph_cmax[empty_s] = np.nan

    # per-slot shading table
    slot_pack = np.zeros((Pt + Ps, 8), np.float32)
    tri_verts = np.zeros((9, Pt), np.float32)
    tri_mat = np.asarray(data.tri_mat, np.int32)
    if n_tri:
        v = tri_v[tri_order]
        a32 = verts[v[:, 0]]
        b32 = verts[v[:, 1]]
        c32 = verts[v[:, 2]]
        n32 = np.cross(b32 - a32, c32 - a32).astype(np.float32)
        norm = np.linalg.norm(n32, axis=-1, keepdims=True)
        slot_pack[tri_pos, 0:3] = n32 / norm  # f32 like raytracer.cpp:342-348
        slot_pack[tri_pos, 4] = tri_mat[tri_order]
        slot_pack[tri_pos, 5] = tri_order
        tri_verts[0:3, tri_pos] = a32.T
        tri_verts[3:6, tri_pos] = b32.T
        tri_verts[6:9, tri_pos] = c32.T
    if n_sph:
        slot_pack[Pt : Pt + n_sph, 0:3] = centers
        slot_pack[Pt : Pt + n_sph, 3] = radii
        slot_pack[Pt : Pt + n_sph, 4] = np.asarray(
            data.sphere_mat, np.int32
        )[sph_order]
        slot_pack[Pt : Pt + n_sph, 5] = t_pad + sph_order

    return ClusterSet(
        tri_dat=tri_dat, tri_slot=tri_slot,
        tri_cmin=tri_cmin, tri_cmax=tri_cmax,
        sph_dat=sph_dat, sph_slot=sph_slot,
        sph_cmin=sph_cmin, sph_cmax=sph_cmax,
        slot_pack=slot_pack, tri_verts=tri_verts,
        n_tri=n_tri, n_sph=n_sph,
    )
