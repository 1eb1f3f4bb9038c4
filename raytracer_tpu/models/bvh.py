"""BVH: host-side build → flat, skip-threaded struct-of-arrays for HBM.

Build algorithm reproduces the reference's proven recipe
(/root/reference/bvh.h:48-163): top-down, split on the WIDEST axis at the
spatial MIDPOINT of the node's bounding box, with up to 19 bisection retries
toward the non-empty side to eliminate empty partitions (critical for
horse_and_mug per bvh.h:117); a node becomes a leaf when it holds <= 1
primitive, reaches depth 19, or the split fails.  Node boxes are the union
of triangle-vertex AABBs extended by sphere AABBs (parser.h:272-317);
partitioning compares primitive CENTERS (triangle centroid (a+b+c)/3,
sphere center vertex) against the midpoint (bvh.h:123-135).

Layout is redesigned for SIMD-lockstep device traversal instead of the
reference's pointer stack (raytracer.cpp:177-225): nodes are flattened in
PREORDER (left child = node+1, as in bvh.h:81-105) and each node additionally
carries a SKIP index — the next preorder node outside its subtree — so a ray
walks the whole tree with a single cursor and no stack:

    hit box  → next node = node + 1   (descend / continue preorder)
    miss box → next node = skip[node] (hop over the subtree)

Leaves reference a contiguous range of a REORDERED primitive index array
(triangles before spheres within each leaf, matching the reference's leaf
test order raytracer.cpp:199-216) instead of carrying copies.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import numpy as np

from raytracer_tpu.models.scene import SceneData, SceneMeta

Array = Any

MAX_BVH_DEPTH = 19  # bvh.h:18
SPLIT_RETRIES = 19  # bvh.h:117


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BVH:
    """Flat skip-threaded BVH (a JAX pytree of device arrays).

    N nodes in preorder; P reordered primitive slots.  Primitive ids encode
    triangles as [0, T_pad) and spheres as T_pad + s, where T_pad is the
    padded triangle count of the owning SceneData.
    """

    box_min: Array      # (N, 3) f32
    box_max: Array      # (N, 3) f32
    skip: Array         # (N,)  i32 — next preorder node outside this subtree
    leaf_start: Array   # (N,)  i32 — into prim_idx; 0 for inner nodes
    leaf_count: Array   # (N,)  i32 — 0 for inner nodes
    axis: Array         # (N,)  i32 — split axis (inner nodes)
    prim_idx: Array     # (P,)  i32 — reordered primitive ids
    # Ordered-descent octant threads (round 5): eight re-threaded copies
    # of the node arrays, one per ray direction octant
    # o = 4*(dx<0) + 2*(dy<0) + (dz<0), concatenated as blocks of N.
    # Block o's preorder visits, at every inner node, the NEAR child
    # first for rays of that octant (left first iff dir[axis] >= 0 —
    # the reference's ordered descent, raytracer.cpp:190-196, realized
    # stacklessly: a ray just starts its walk at node o*N).  Block 0 is
    # exactly the classic preorder.  Skip values are GLOBAL (offset by
    # o*N).  None when the build skips them (ordered=False, or trees
    # above _ORDERED_MAX_NODES where the 8x memory is not worth the
    # fallback engine's time).  Measured: 1.74-1.88x fewer lockstep
    # iterations on bunny/dragon eye waves (exp_ordered_descent.py).
    oct_box_min: Array = None    # (8N, 3) f32
    oct_box_max: Array = None    # (8N, 3) f32
    oct_skip: Array = None       # (8N,)  i32 (global indices)
    oct_leaf_start: Array = None # (8N,)  i32
    oct_leaf_count: Array = None # (8N,)  i32


# Above this node count the octant threads (8x node memory) are skipped;
# the walk then falls back to plain preorder.  The bvh engine is the
# CPU-sweep/fallback engine — giant scenes use the cluster engine.
_ORDERED_MAX_NODES = 200_000


def _octant_threads(bvh: BVH) -> BVH:
    """Attach the eight ordered-descent node threads (vectorized host
    pass, O(8N); see the BVH field docs)."""
    skip0 = np.asarray(bvh.skip, np.int64)
    leaf_count = np.asarray(bvh.leaf_count, np.int64)
    axis = np.asarray(bvh.axis, np.int64)
    box_min = np.asarray(bvh.box_min, np.float32)
    box_max = np.asarray(bvh.box_max, np.float32)
    leaf_start = np.asarray(bvh.leaf_start, np.int64)
    n = skip0.shape[0]
    size = skip0 - np.arange(n)          # subtree size per node
    inner = leaf_count == 0
    idx = np.arange(n)
    left = np.minimum(idx + 1, n - 1)
    right = np.where(inner, skip0[left], 0)

    obm, obx, osk, ols, olc = [], [], [], [], []
    for o in range(8):
        neg = np.array([(o >> 2) & 1, (o >> 1) & 1, o & 1], bool)
        swap = inner & neg[axis]
        first = np.where(swap, right, idx + 1)
        second = np.where(swap, idx + 1, right)
        newpos = np.zeros(n, np.int64)
        frontier = np.array([0], np.int64)
        while frontier.size:
            f = frontier[inner[frontier]]
            if f.size == 0:
                break
            fc, sc = first[f], second[f]
            newpos[fc] = newpos[f] + 1
            newpos[sc] = newpos[f] + 1 + size[fc]
            frontier = np.concatenate([fc, sc])
        inv = np.empty(n, np.int64)
        inv[newpos] = idx                 # old node at each new slot
        base = o * n
        obm.append(box_min[inv])
        obx.append(box_max[inv])
        osk.append((np.arange(n) + size[inv] + base).astype(np.int32))
        ols.append(leaf_start[inv].astype(np.int32))
        olc.append(leaf_count[inv].astype(np.int32))
    return dataclasses.replace(
        bvh,
        oct_box_min=np.concatenate(obm),
        oct_box_max=np.concatenate(obx),
        oct_skip=np.concatenate(osk),
        oct_leaf_start=np.concatenate(ols),
        oct_leaf_count=np.concatenate(olc),
    )


def _widest_axis(bmin: np.ndarray, bmax: np.ndarray) -> int:
    # strictly-greater comparison ⇒ first max wins, like Box::getWidestAxis
    # (parser.h:227-235)
    return int(np.argmax(bmax - bmin))


def _build_native(prim_min, prim_max, centers, prim_ids):
    """Build via the C++ runtime (native/raytracer_native.cpp); None if the
    library is unavailable.  Bit-identical to the Python path (both are
    float32 midpoint bisection)."""
    import ctypes

    from raytracer_tpu.utils.native import load

    lib = load()
    if lib is None:
        return None
    n = prim_ids.shape[0]
    cap = 2 * n + 1
    f32 = np.float32
    i32 = np.int32
    pmin = np.ascontiguousarray(prim_min, f32)
    pmax = np.ascontiguousarray(prim_max, f32)
    cen = np.ascontiguousarray(centers, f32)
    pid = np.ascontiguousarray(prim_ids, i32)
    node_min = np.empty((cap, 3), f32)
    node_max = np.empty((cap, 3), f32)
    skip = np.empty((cap,), i32)
    leaf_start = np.empty((cap,), i32)
    leaf_count = np.empty((cap,), i32)
    axis = np.empty((cap,), i32)
    prim_out = np.empty((n,), i32)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    cf, ci = ctypes.c_float, ctypes.c_int32
    n_nodes = lib.rt_build_bvh(
        n, p(pmin, cf), p(pmax, cf), p(cen, cf), p(pid, ci),
        MAX_BVH_DEPTH, SPLIT_RETRIES,
        p(node_min, cf), p(node_max, cf), p(skip, ci), p(leaf_start, ci),
        p(leaf_count, ci), p(axis, ci), p(prim_out, ci), cap,
    )
    if n_nodes <= 0:
        return None
    return BVH(
        box_min=node_min[:n_nodes].copy(),
        box_max=node_max[:n_nodes].copy(),
        skip=skip[:n_nodes].copy(),
        leaf_start=leaf_start[:n_nodes].copy(),
        leaf_count=leaf_count[:n_nodes].copy(),
        axis=axis[:n_nodes].copy(),
        prim_idx=prim_out,
    )


def build_bvh(data: SceneData, meta: SceneMeta, ordered: bool | None = None
              ) -> BVH:
    """Build on host from the (numpy-convertible) scene arrays.

    ``ordered``: attach the octant ordered-descent threads (default:
    auto — yes below _ORDERED_MAX_NODES)."""
    verts = np.asarray(data.vertices, dtype=np.float32)
    tri_v = np.asarray(data.tri_v, dtype=np.int64)[: meta.n_tris]
    t_pad = int(np.asarray(data.tri_v).shape[0])
    sph_c = verts[np.asarray(data.sphere_cvid, dtype=np.int64)[: meta.n_spheres]]
    sph_r = np.asarray(data.sphere_rad, dtype=np.float32)[: meta.n_spheres]

    n_tris, n_sph = meta.n_tris, meta.n_spheres
    n_prims = n_tris + n_sph
    if n_prims == 0:
        return BVH(
            box_min=np.zeros((1, 3), np.float32),
            box_max=np.zeros((1, 3), np.float32),
            skip=np.ones((1,), np.int32),
            leaf_start=np.zeros((1,), np.int32),
            leaf_count=np.zeros((1,), np.int32),
            axis=np.zeros((1,), np.int32),
            prim_idx=np.zeros((1,), np.int32),
        )

    # per-primitive AABBs and centers; prims ordered tris-then-spheres so a
    # stable partition keeps every leaf's triangles ahead of its spheres.
    tv = verts[tri_v]  # (n_tris, 3, 3)
    prim_min = np.concatenate([tv.min(axis=1), sph_c - sph_r[:, None]], axis=0)
    prim_max = np.concatenate([tv.max(axis=1), sph_c + sph_r[:, None]], axis=0)
    centers = np.concatenate([tv.mean(axis=1), sph_c], axis=0).astype(np.float32)
    prim_ids = np.concatenate(
        [np.arange(n_tris, dtype=np.int32), t_pad + np.arange(n_sph, dtype=np.int32)]
    )

    def _finish(b: BVH) -> BVH:
        do = ordered if ordered is not None else (
            b.skip.shape[0] <= _ORDERED_MAX_NODES)
        return _octant_threads(b) if do else b

    built = _build_native(prim_min, prim_max, centers, prim_ids)
    if built is not None:
        return _finish(built)

    node_min, node_max, node_axis = [], [], []
    leaf_ranges = []  # (start, count) per node; (0, 0) for inner
    prim_order: list[np.ndarray] = []
    prim_cursor = 0

    def emit(idx_list: np.ndarray, depth: int) -> int:
        """Emit the subtree over prims `idx_list` in preorder; return size."""
        nonlocal prim_cursor
        my = len(node_min)
        bmin = prim_min[idx_list].min(axis=0)
        bmax = prim_max[idx_list].max(axis=0)
        node_min.append(bmin)
        node_max.append(bmax)
        node_axis.append(0)
        leaf_ranges.append((0, 0))

        def make_leaf():
            nonlocal prim_cursor
            leaf_ranges[my] = (prim_cursor, len(idx_list))
            prim_order.append(prim_ids[idx_list])
            prim_cursor += len(idx_list)
            return 1

        if len(idx_list) <= 1 or depth >= MAX_BVH_DEPTH:
            return make_leaf()

        ax = _widest_axis(bmin, bmax)
        node_axis[my] = ax
        start, end = np.float32(bmin[ax]), np.float32(bmax[ax])
        mid = np.float32((start + end) / 2)
        coords = centers[idx_list, ax]
        left_mask = coords < mid
        # bvh.h:119-161 evaluates at most 19 candidate midpoints total (the
        # initial one plus 18 bisection retries), so allow 18 adjustments
        # after the initial partition test.
        tries = SPLIT_RETRIES - 1
        while tries > 0 and (left_mask.all() or not left_mask.any()):
            tries -= 1
            if not left_mask.any():
                start = mid
            else:
                end = mid
            mid = np.float32((start + end) / 2)
            left_mask = coords < mid
        if left_mask.all() or not left_mask.any():
            return make_leaf()  # split failed → leaf (bvh.h:71-74)

        size_l = emit(idx_list[left_mask], depth + 1)
        size_r = emit(idx_list[~left_mask], depth + 1)
        return 1 + size_l + size_r

    all_idx = np.arange(n_prims)
    total = emit(all_idx, 0)
    n_nodes = len(node_min)
    assert total == n_nodes

    # skip pointers: skip[i] = i + subtree_size(i); recover subtree sizes by
    # a second preorder pass mirroring emit's recursion via leaf/inner flags.
    leaf_count_arr = np.array([c for (_, c) in leaf_ranges], dtype=np.int32)
    skip = np.zeros(n_nodes, dtype=np.int32)

    def fill_skip(i: int) -> int:
        if leaf_count_arr[i] > 0:
            skip[i] = i + 1
            return i + 1
        j = fill_skip(i + 1)
        j = fill_skip(j)
        skip[i] = j
        return j

    end_idx = fill_skip(0)
    assert end_idx == n_nodes

    return _finish(BVH(
        box_min=np.stack(node_min).astype(np.float32),
        box_max=np.stack(node_max).astype(np.float32),
        skip=skip,
        leaf_start=np.array([s for (s, _) in leaf_ranges], dtype=np.int32),
        leaf_count=leaf_count_arr,
        axis=np.array(node_axis, dtype=np.int32),
        prim_idx=np.concatenate(prim_order).astype(np.int32),
    ))


def validate_bvh(bvh: BVH, n_prims: int) -> None:
    """Structural invariants (used by tests): every primitive appears in
    exactly one leaf; child boxes are contained in parent boxes; skip
    pointers are monotone and land inside [i+1, N]."""
    prim_idx = np.asarray(bvh.prim_idx)
    counts = np.asarray(bvh.leaf_count)
    starts = np.asarray(bvh.leaf_start)
    n = counts.shape[0]
    seen: list[int] = []
    for i in range(n):
        if counts[i] > 0:
            seen.extend(prim_idx[starts[i] : starts[i] + counts[i]].tolist())
    assert len(seen) == n_prims, (len(seen), n_prims)
    assert len(set(seen)) == n_prims
    skip = np.asarray(bvh.skip)
    assert (skip >= np.arange(n) + 1).all()
    assert (skip <= n).all()
    bmin, bmax = np.asarray(bvh.box_min), np.asarray(bvh.box_max)
    for i in range(n):
        if counts[i] == 0:  # inner: children are i+1 and skip[i+1]
            for ch in (i + 1, int(skip[i + 1])):
                assert (bmin[ch] >= bmin[i] - 1e-5).all()
                assert (bmax[ch] <= bmax[i] + 1e-5).all()
