"""Visibility engines: closest-hit and any-hit over a batched ray axis.

Two interchangeable engines, both operating on the flattened ray wavefront:

- ``brute``: dense all-rays x all-primitives tests, scanned over primitive
  chunks with a running (t, prim) minimum.  No gathers, perfectly dense VPU
  work — on TPU this is the fastest choice for small scenes and the
  reference implementation the BVH engine is tested against.
- ``bvh``: SIMD-lockstep walk of the flat skip-threaded BVH
  (models.bvh.BVH).  Every ray carries a single node cursor plus a leaf
  cursor — no per-ray stack — inside one `lax.while_loop`; each iteration a
  ray either advances through the node array (slab test → node+1 on hit,
  skip[node] on miss, with closest-hit t-pruning like raytracer.cpp:188) or
  consumes one primitive of its current leaf.  This replaces the reference's
  divergent per-ray `std::stack` walk (raytracer.cpp:177-280) with
  fixed-shape lockstep iteration that XLA maps onto the VPU.

Both engines reproduce the reference's acceptance rules: triangle hits need
t >= 0; sphere hits report the smaller root even when negative; the
closest-hit keeps the minimum accepted t (ties broken toward triangles,
matching leaf test order raytracer.cpp:199-216); the shadow any-hit accepts
ANY hit with t < t_max and does NOT t-prune boxes (raytracer.cpp:227-253).

Engines return integer hit ids only and are wrapped in stop_gradient;
gradient flow is re-established by ``ops.shade.refine_hit`` which
differentiably recomputes the hit from the chosen primitive.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.models.bvh import BVH
from raytracer_tpu.models.scene import SceneData
from raytracer_tpu.ops.intersect import aabb_intersect, sphere_intersect, tri_intersect

# prim id encoding: [0, T_pad) = triangle index, [T_pad, T_pad+S_pad) = sphere.
MISS = np.int32(-1)  # numpy scalar: importing this module must not init the backend


def _gather_tris(data: SceneData):
    """Hoist the vertex gather out of the per-chunk loop: one (T, 3)x3
    gather per trace instead of one per scan step (the in-loop gather
    defeats XLA's fusion and was a ~50x slowdown on TPU)."""
    v = data.tri_v
    return data.vertices[v[:, 0]], data.vertices[v[:, 1]], data.vertices[v[:, 2]]


def _tri_chunk_test(tri_abc, tri_valid, origin, dirs, start, size: int,
                    bfc: bool = False):
    """Test rays against triangles [start, start+size) (start may be traced).
    Returns (t, ok, ids) of shape (R, size) / (size,)."""
    a, b, c = (jax.lax.dynamic_slice_in_dim(x, start, size, axis=0) for x in tri_abc)
    valid = jax.lax.dynamic_slice_in_dim(tri_valid, start, size, axis=0)
    t, ok = tri_intersect(
        origin[..., None, :], dirs[..., None, :], a[None], b[None], c[None],
        bfc=bfc,
    )
    ids = (start + jnp.arange(size)).astype(jnp.int32)
    return t, ok & valid[None], ids


def _sph_chunk_test(data: SceneData, sph_center, origin, dirs, start, size: int):
    center = jax.lax.dynamic_slice_in_dim(sph_center, start, size, axis=0)
    rad = jax.lax.dynamic_slice_in_dim(data.sphere_rad, start, size, axis=0)
    valid = jax.lax.dynamic_slice_in_dim(data.sphere_valid, start, size, axis=0)
    t, ok = sphere_intersect(
        origin[..., None, :], dirs[..., None, :], center[None], rad[None]
    )
    t_pad = data.tri_v.shape[0]
    ids = (t_pad + start + jnp.arange(size)).astype(jnp.int32)
    return t, ok & valid[None], ids


def _chunk_starts(total: int, chunk: int):
    """Fixed-size chunk starts covering [0, total); the last start is clamped
    so chunks may overlap — safe because min/any updates are idempotent."""
    if total <= 0:
        return None, 0
    chunk = min(chunk, total)
    n = (total + chunk - 1) // chunk
    starts = jnp.minimum(jnp.arange(n) * chunk, total - chunk).astype(jnp.int32)
    return starts, chunk


def brute_closest(data: SceneData, origin, dirs, chunk: int = 512,
                  bfc: bool = False):
    """Dense closest hit. Returns prim ids (R,), -1 on miss.

    Scanned over fixed-size primitive chunks with a running (t, prim)
    minimum; the graph size is independent of scene size.
    """
    origin = jax.lax.stop_gradient(origin)
    dirs = jax.lax.stop_gradient(dirs)
    r = dirs.shape[0]
    best = (
        jnp.full((r,), jnp.inf, dtype=jnp.float32),
        jnp.full((r,), MISS),
    )

    def chunk_min(best, t, ok, ids):
        best_t, best_p = best
        t = jnp.where(ok, t, jnp.inf)
        j = jnp.argmin(t, axis=-1)
        tj = jnp.take_along_axis(t, j[:, None], axis=-1)[:, 0]
        # strict < keeps the earlier (lower-id) primitive on exact t ties,
        # giving triangles priority over spheres like raytracer.cpp:199-216.
        upd = tj < best_t
        return (jnp.where(upd, tj, best_t), jnp.where(upd, ids[j], best_p))

    tri_abc = _gather_tris(data)
    starts, csize = _chunk_starts(data.tri_v.shape[0], chunk)
    if starts is not None:
        def tri_step(best, start):
            t, ok, ids = _tri_chunk_test(
                tri_abc, data.tri_valid, origin, dirs, start, csize, bfc=bfc
            )
            return chunk_min(best, t, ok, ids), None
        best, _ = jax.lax.scan(tri_step, best, starts)

    sph_center = data.vertices[data.sphere_cvid]
    starts, csize = _chunk_starts(data.sphere_cvid.shape[0], chunk)
    if starts is not None:
        def sph_step(best, start):
            t, ok, ids = _sph_chunk_test(data, sph_center, origin, dirs, start, csize)
            return chunk_min(best, t, ok, ids), None
        best, _ = jax.lax.scan(sph_step, best, starts)
    return best[1]


def brute_any(data: SceneData, origin, dirs, t_max, chunk: int = 512,
              bfc: bool = False):
    """Dense any-hit: True where some primitive has an accepted hit with
    t < t_max (shadow occlusion semantics, raytracer.cpp:227-253)."""
    origin = jax.lax.stop_gradient(origin)
    dirs = jax.lax.stop_gradient(dirs)
    t_max = jax.lax.stop_gradient(t_max)
    r = dirs.shape[0]
    found = jnp.zeros((r,), dtype=bool)

    tri_abc = _gather_tris(data)
    starts, csize = _chunk_starts(data.tri_v.shape[0], chunk)
    if starts is not None:
        def tri_step(found, start):
            t, ok, _ = _tri_chunk_test(
                tri_abc, data.tri_valid, origin, dirs, start, csize, bfc=bfc
            )
            return found | jnp.any(ok & (t < t_max[:, None]), axis=-1), None
        found, _ = jax.lax.scan(tri_step, found, starts)

    sph_center = data.vertices[data.sphere_cvid]
    starts, csize = _chunk_starts(data.sphere_cvid.shape[0], chunk)
    if starts is not None:
        def sph_step(found, start):
            t, ok, _ = _sph_chunk_test(data, sph_center, origin, dirs, start, csize)
            return found | jnp.any(ok & (t < t_max[:, None]), axis=-1), None
        found, _ = jax.lax.scan(sph_step, found, starts)
    return found


def _prim_test(data: SceneData, origin, dirs, p, bfc: bool = False):
    """Test each ray against its own primitive id p (R,). Returns (t, ok)."""
    t_pad = data.tri_v.shape[0]
    s_pad = data.sphere_cvid.shape[0]
    is_tri = p < t_pad
    ti = jnp.clip(p, 0, t_pad - 1)
    v = data.tri_v[ti]
    a = data.vertices[v[:, 0]]
    b = data.vertices[v[:, 1]]
    c = data.vertices[v[:, 2]]
    t_tri, ok_tri = tri_intersect(origin, dirs, a, b, c, bfc=bfc)
    si = jnp.clip(p - t_pad, 0, s_pad - 1)
    center = data.vertices[data.sphere_cvid[si]]
    rad = data.sphere_rad[si]
    t_sph, ok_sph = sphere_intersect(origin, dirs, center, rad)
    t = jnp.where(is_tri, t_tri, t_sph)
    ok = jnp.where(is_tri, ok_tri, ok_sph)
    return t, ok


def _bvh_walk(data: SceneData, bvh: BVH, origin, dirs, t_max, closest: bool,
              bfc: bool = False):
    """Shared lockstep skip-walk. closest=True → closest-hit with t-pruning;
    False → any-hit with early per-ray termination at t < t_max.

    When the BVH carries octant threads (models.bvh._octant_threads),
    each ray walks the re-threaded preorder for ITS direction octant —
    the reference's near-child-first ordered descent
    (raytracer.cpp:190-196) realized stacklessly: the only change is the
    per-ray start node o*N and end bound (o+1)*N, zero per-step cost.
    Ordered descent tightens best_t earlier so the t-prune fires more:
    measured 1.74-1.88x fewer lockstep iterations on bunny/dragon eye
    waves (experiments/exp_ordered_descent.py) and 1.24-1.25x wall-clock
    on CPU — but a 0.72-0.87x LOSS on TPU, where per-step node gathers
    cost scales with the 8x table (experiments/exp_ordered_ab.py), so
    the threads engage off-TPU only (the bvh engine's CPU-sweep role;
    the TPU flagship is the cluster engine).  Visit ORDER changes, so
    exact cross-primitive float-t ties can resolve to the other equal-t
    primitive — the tie class already documented for engine-vs-engine
    comparisons (bunny/dragon full-res measured bitwise-equal on CPU)."""
    origin = jax.lax.stop_gradient(jnp.broadcast_to(origin, dirs.shape))
    dirs = jax.lax.stop_gradient(dirs)
    r = dirs.shape[0]
    n = bvh.skip.shape[0]
    p_total = bvh.prim_idx.shape[0]
    inv_d = 1.0 / dirs

    ordered = (bvh.oct_skip is not None
               and jax.devices()[0].platform != "tpu")
    if ordered:
        box_min, box_max = bvh.oct_box_min, bvh.oct_box_max
        skip_arr = bvh.oct_skip
        leaf_start, leaf_count = bvh.oct_leaf_start, bvh.oct_leaf_count
        n_total = 8 * n
        oct_ = ((dirs < 0.0).astype(jnp.int32)
                * jnp.array([4, 2, 1], jnp.int32)).sum(-1)
        base = oct_ * n
        node0 = base
        end = base + n
    else:
        box_min, box_max = bvh.box_min, bvh.box_max
        skip_arr = bvh.skip
        leaf_start, leaf_count = bvh.leaf_start, bvh.leaf_count
        n_total = n
        node0 = jnp.zeros((r,), jnp.int32)
        end = jnp.full((r,), n, jnp.int32)

    cursor0 = jnp.zeros((r,), jnp.int32)
    remaining0 = jnp.zeros((r,), jnp.int32)
    best_t0 = jnp.full((r,), jnp.inf, jnp.float32)
    best_p0 = jnp.full((r,), MISS)
    done0 = jnp.zeros((r,), bool)

    def cond(state):
        node, cursor, remaining, best_t, best_p, done = state
        return jnp.any(~done & ((node < end) | (remaining > 0)))

    def body(state):
        node, cursor, remaining, best_t, best_p, done = state
        in_leaf = (remaining > 0) & ~done

        # --- leaf-primitive step (one primitive per iteration per ray)
        ci = jnp.clip(cursor, 0, p_total - 1)
        p = bvh.prim_idx[ci]
        t_p, ok_p = _prim_test(data, origin, dirs, p, bfc=bfc)
        if closest:
            upd = in_leaf & ok_p & (t_p < best_t)
            best_t = jnp.where(upd, t_p, best_t)
            best_p = jnp.where(upd, p, best_p)
        else:
            found = in_leaf & ok_p & (t_p < t_max)
            best_p = jnp.where(found & (best_p == MISS), p, best_p)
            done = done | found
        cursor = jnp.where(in_leaf, cursor + 1, cursor)
        remaining = jnp.where(in_leaf, remaining - 1, remaining)

        # --- node step
        at_node = ~in_leaf & (node < end) & ~done
        ni = jnp.clip(node, 0, n_total - 1)
        tmin, ok_box = aabb_intersect(origin, inv_d, box_min[ni], box_max[ni])
        if closest:
            visit = ok_box & (tmin <= best_t)  # prune like raytracer.cpp:188
        else:
            visit = ok_box  # shadow walk never t-prunes boxes (cpp:264-280)
        count = leaf_count[ni]
        is_leaf = count > 0
        next_node = jnp.where(visit, node + 1, skip_arr[ni])
        enter_leaf = at_node & visit & is_leaf
        node = jnp.where(at_node, next_node, node)
        remaining = jnp.where(enter_leaf, count, remaining)
        cursor = jnp.where(enter_leaf, leaf_start[ni], cursor)
        return node, cursor, remaining, best_t, best_p, done

    state = (node0, cursor0, remaining0, best_t0, best_p0, done0)
    _, _, _, _, best_p, done = jax.lax.while_loop(cond, body, state)
    return best_p, done


def bvh_closest(data: SceneData, bvh: BVH, origin, dirs, bfc: bool = False):
    best_p, _ = _bvh_walk(data, bvh, origin, dirs, None, closest=True, bfc=bfc)
    return best_p


def bvh_any(data: SceneData, bvh: BVH, origin, dirs, t_max, bfc: bool = False):
    t_max = jax.lax.stop_gradient(t_max)
    _, done = _bvh_walk(data, bvh, origin, dirs, t_max, closest=False, bfc=bfc)
    return done


def closest_hit(data: SceneData, origin, dirs, accel, engine: str, active=None,
                bfc: bool = False):
    """Dispatch closest hit. engine in {'brute', 'bvh', 'cluster'}."""
    if engine == "bvh":
        assert accel is not None, "bvh engine requires a built BVH"
        return bvh_closest(data, accel, origin, dirs, bfc=bfc)
    if engine == "cluster":
        from raytracer_tpu.ops.cluster_trace import cluster_closest

        assert accel is not None, "cluster engine requires a built ClusterSet"
        return cluster_closest(data, accel, origin, dirs, active=active, bfc=bfc)
    return brute_closest(data, origin, dirs, bfc=bfc)


def any_hit(data: SceneData, origin, dirs, t_max, accel, engine: str, active=None,
            bfc: bool = False, relaxed: bool = False):
    """``relaxed`` (cluster engine only): sqrt/div-free sphere occlusion
    sign tests (--relaxed-parity; cluster_trace._sph_cluster_occluded_relaxed)."""
    if engine == "bvh":
        assert accel is not None, "bvh engine requires a built BVH"
        return bvh_any(data, accel, origin, dirs, t_max, bfc=bfc)
    if engine == "cluster":
        from raytracer_tpu.ops.cluster_trace import cluster_any

        assert accel is not None, "cluster engine requires a built ClusterSet"
        return cluster_any(data, accel, origin, dirs, t_max, active=active,
                           bfc=bfc, relaxed=relaxed)
    return brute_any(data, origin, dirs, t_max, bfc=bfc)
