"""Cluster-culled dense visibility engine (Pallas TPU kernels).

Pipeline per trace call (closest-hit or shadow any-hit):

1. ``ray_cluster_mask`` (pure jnp, dense): an EXACT per-ray slab test of
   every ray against every cluster AABB, OR-reduced over the ray tile ->
   a per-tile cluster hit mask.  Sound by construction: a primitive lies
   inside its cluster box, so a ray can only hit it if its slab test
   crosses the box.  Strictly tighter than the round-2 interval-
   arithmetic tile mask (``tile_cluster_mask``, kept for experiments):
   interval bounds lose the per-ray (origin, direction) correlation and
   saturate on divergent secondary tiles (measured 2.7-7x more cluster
   visits on horse_and_mug's bounce waves, experiments/exp_exact_mask).
   Inactive lanes are excluded (their results are masked downstream).
2. ``_compact``: the per-tile mask becomes a short SMEM-resident cluster
   id list (ascending ids, via top_k) plus a count, and a packed bitmask
   kept as a sound fallback for tiles whose candidate count overflows the
   list (the kernel then scans all clusters, testing bits).
3. A Pallas kernel visits, for each ray tile, only its listed clusters:
   128 primitives per cluster on VPU lanes x TILE rays on sublanes, both
   operands resident in VMEM, best-(t, slot) kept in VMEM scratch.

Semantics match ops.traverse.brute_* (and therefore the reference,
raytracer.cpp:70-175,199-253): inclusive triangle edges with t >= 0, no
backface culling, spheres report the smaller root even when negative,
strict-< best updates with triangles tested before spheres, shadow
any-hit accepts any t < t_max.  These engines return discrete ids only
and are non-differentiable by design (ops.shade.refine_hit re-derives
the differentiable quantities).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.models.clusters import CLUSTER, ClusterSet
from raytracer_tpu.models.scene import SceneData

TILE = 128          # rays per shortlist tile
TPB = 8             # tiles per grid program (amortizes ~10us/program cost)
MAX_TRI_LIST = 48   # cluster-list capacity before bitmask fallback
MAX_SPH_LIST = 8
MAX_NT = 1536       # tiles per pallas_call: bounds the SMEM-resident
                    # shortlists (~0.4 MB of the 1 MB budget); larger
                    # wavefronts run as sequential in-graph segments
MISS = np.int32(-1)    # numpy scalars: importing this module must not
_BIG = np.float32(1e18)  # initialize the JAX backend (multi-host bring-up)


def _interpret() -> bool:
    interp = jax.devices()[0].platform != "tpu"
    if interp:
        # interpret-mode execution corrupts the jax 0.9 C++ dispatch
        # cache (see utils.jax_workarounds) — opt out before the first
        # interpreted kernel is built
        from raytracer_tpu.utils.jax_workarounds import (
            disable_cpp_fastpath_caching,
        )

        disable_cpp_fastpath_caching()
    return interp


# ---------------------------------------------------------------------------
# Phase 1: conservative tile -> cluster mask (dense jnp)
# ---------------------------------------------------------------------------

def _interval_mul(alo, ahi, blo, bhi):
    p1, p2, p3, p4 = alo * blo, alo * bhi, ahi * blo, ahi * bhi
    lo = jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4))
    hi = jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4))
    return lo, hi


def tile_cluster_mask(origin, dirs, active, cmin, cmax, t_hi, tile: int,
                      subsplit: int = 1):
    """(nt, C) conservative bool: could any tile ray hit this cluster box?

    origin/dirs: (R, 3); active: (R,) bool or None; cmin/cmax: (C, 3);
    t_hi: per-ray conservative upper bound on useful t ((R,) or None).

    Each tile is evaluated as `subsplit` independent sub-intervals whose
    masks are OR-ed: secondary-ray tiles straddling depth discontinuities
    have strongly multi-modal origin sets, and one interval box over all
    of them admits most of the scene; four quarter-boxes stay tight.
    """
    origin = jax.lax.stop_gradient(origin)
    dirs = jax.lax.stop_gradient(dirs)
    r = dirs.shape[0]
    nt_out = r // tile
    if subsplit > 1:
        tile //= subsplit
    nt = r // tile
    o = origin.reshape(nt, tile, 3)
    d = dirs.reshape(nt, tile, 3)
    if active is None:
        o_lo = o.min(1); o_hi = o.max(1)
        d_lo = d.min(1); d_hi = d.max(1)
        cap = None if t_hi is None else t_hi.reshape(nt, tile).max(1)
    else:
        act = active.reshape(nt, tile, 1)
        big = jnp.float32(jnp.inf)
        o_lo = jnp.where(act, o, big).min(1)
        o_hi = jnp.where(act, o, -big).max(1)
        d_lo = jnp.where(act, d, big).min(1)
        d_hi = jnp.where(act, d, -big).max(1)
        none_active = ~active.reshape(nt, tile).any(1, keepdims=True)
        # a fully-inactive tile gets a degenerate point interval at 0
        o_lo = jnp.where(none_active, 0.0, o_lo); o_hi = jnp.where(none_active, 0.0, o_hi)
        d_lo = jnp.where(none_active, 1.0, d_lo); d_hi = jnp.where(none_active, 1.0, d_hi)
        if t_hi is None:
            cap = None
        else:
            cap = jnp.where(
                active.reshape(nt, tile), t_hi.reshape(nt, tile), -jnp.inf
            ).max(1)
            cap = jnp.where(none_active[:, 0], 0.0, cap)

    # reciprocal-direction interval per tile/axis (finite sentinel for the
    # sign-crossing case so products stay NaN-free)
    crosses = (d_lo <= 0.0) & (d_hi >= 0.0)
    i_lo = jnp.where(crosses, -_BIG, 1.0 / d_hi)
    i_hi = jnp.where(crosses, _BIG, 1.0 / d_lo)

    # numerator intervals vs every cluster: (nt, C, 3)
    n1_lo = cmin[None] - o_hi[:, None]; n1_hi = cmin[None] - o_lo[:, None]
    n2_lo = cmax[None] - o_hi[:, None]; n2_hi = cmax[None] - o_lo[:, None]
    il = i_lo[:, None]; ih = i_hi[:, None]
    t1_lo, t1_hi = _interval_mul(n1_lo, n1_hi, il, ih)
    t2_lo, t2_hi = _interval_mul(n2_lo, n2_hi, il, ih)
    near_lo = jnp.minimum(t1_lo, t2_lo)   # lower bound of per-ray slab entry
    far_hi = jnp.maximum(t1_hi, t2_hi)    # upper bound of per-ray slab exit
    entry_lo = near_lo.max(-1)            # (nt, C)
    exit_hi = far_hi.min(-1)
    hit = (entry_lo <= exit_hi) & (exit_hi >= 0.0)
    if cap is not None:
        hit &= entry_lo <= cap[:, None]
    if active is not None:
        # fully-inactive tiles must visit NOTHING (their placeholder
        # interval would otherwise still overlap scene clusters)
        hit &= ~none_active
    if subsplit > 1:
        c = hit.shape[1]
        hit_s = hit.reshape(nt_out, subsplit, c)
        entry_s = entry_lo.reshape(nt_out, subsplit, c)
        # merged entry bound: min over the sub-intervals that can hit
        # (rays of non-hitting subs are irrelevant to this cluster)
        entry_lo = jnp.where(hit_s, entry_s, jnp.inf).min(1)
        hit = hit_s.any(1)
    return hit, entry_lo


def _ray_mask_jnp(origin, dirs, active, cmin, cmax, t_hi, tile: int):
    """Pure-jnp exact per-ray mask (the CPU path of ray_cluster_mask and
    the COARSE supercluster pass of the hierarchical TPU mask).  Same
    clamped-reciprocal FMA slab math as the Pallas kernel — bitwise-equal
    masks (pinned in exp_mask_kernel.py)."""
    r = dirs.shape[0]
    nt = r // tile
    o = origin.reshape(nt, tile, 1, 3)
    d = dirs.reshape(nt, tile, 1, 3)
    # clamped to the finite sentinel so denormal-tiny components cannot
    # produce an infinite reciprocal (inf*c - inf*o would be NaN)
    inv = jnp.where(
        d != 0.0,
        jnp.clip(1.0 / jnp.where(d != 0.0, d, 1.0), -_BIG, _BIG),
        _BIG,
    )
    oi = o * inv                            # per-ray, hoisted out of C
    t1 = cmin[None, None] * inv - oi        # (nt, tile, C, 3): 1 FMA/pair
    t2 = cmax[None, None] * inv - oi
    near = jnp.minimum(t1, t2)
    far = jnp.maximum(t1, t2)
    entry = near.max(-1)                    # (nt, tile, C)
    exit_ = far.min(-1)
    hit = (entry <= exit_) & (exit_ >= 0.0)
    if t_hi is not None:
        hit &= entry <= t_hi.reshape(nt, tile, 1)
    if active is not None:
        hit &= active.reshape(nt, tile, 1)
    e = jnp.where(hit, entry, jnp.inf).min(1)
    return hit.any(1), e


# Hierarchical (two-level) mask: above this many cluster columns the TPU
# mask kernel guards each 128-cluster lane-row chunk with a COARSE
# supercluster test, so per-tile mask work scales with the geometry a
# tile actually crosses instead of O(C).  This is the reference BVH's
# log-depth idea (/root/reference/bvh.h:48-79) recast for the flat
# engine: superclusters are unions of 128 consecutive BVH-preorder
# clusters, i.e. real subtree-ish boxes.  Soundness is exact: a
# supercluster box contains its clusters' boxes componentwise, and the
# slab test's FMA/min/max chain is monotone in the box coordinates, so
# coarse-miss => fine-miss bitwise (no tolerance argument needed).
# Bundled scenes all have cpad <= 512 and keep the single-level kernel
# unchanged; the hierarchy only engages for big scenes (~>65k tris).
_SUPER = 128
# Overridable for A/B experiments (exp_super_min_ab.py) and the synthetic
# hier-gate hardware test: lowering to 128 engages the row-granularity
# gate on 256-column scenes (horse_and_mug).  Round-5 measurement: at
# cpad <= 512 the gate is a measured 7% LOSS on horse (86.5 -> 92.8 ms,
# bitwise-equal) — live-tile row-skip fractions are only 0.05-1.6% on
# the exact-mask waves (exp_subchunk_stats.py) — so the default stays
# 512.
_SUPER_MIN_CPAD = int(os.environ.get("RAYTRACER_SUPER_MIN_CPAD", "512"))


def _super_boxes(cmin, cmax, cpad: int):
    """(S, 3) nan-aware unions of each 128-cluster chunk's boxes (NaN =
    empty/padding cluster, never hit — matching models.clusters).

    The union is DILATED by a relative epsilon: the coarse gate runs as
    XLA-compiled jnp while the fine test runs under Mosaic, and the two
    compilers may contract the slab FMA chain differently (observed in
    interpret mode, tests/test_hier_mask.py).  The bitwise monotonicity
    argument covers one rounding scheme only; the dilation (~1e-5
    relative, invisible to tightness) makes coarse-miss => fine-miss
    robust across compilers and future compiler upgrades."""
    c = cmin.shape[0]
    pad = cpad - c
    cmin_p = jnp.concatenate(
        [cmin, jnp.full((pad, 3), jnp.nan, cmin.dtype)]) if pad else cmin
    cmax_p = jnp.concatenate(
        [cmax, jnp.full((pad, 3), jnp.nan, cmax.dtype)]) if pad else cmax
    s = cpad // _SUPER
    smin = jnp.nanmin(cmin_p.reshape(s, _SUPER, 3), axis=1)
    smax = jnp.nanmax(cmax_p.reshape(s, _SUPER, 3), axis=1)
    eps = jnp.float32(1e-5)
    tiny = jnp.float32(1e-30)
    smin = smin - (eps * jnp.abs(smin) + tiny)
    smax = smax + (eps * jnp.abs(smax) + tiny)
    return smin, smax


def _ray_mask_kernel_hier(act_ref, sup_ref, box_ref, b_ref, hit_out, ent_out,
                          *, tile: int, n_chunks: int):
    """Hierarchical form of _ray_mask_kernel: the (tile, cpad) pair work
    is split into 128-cluster lane-row chunks, each guarded by the
    subtile's coarse supercluster bit (sup_ref, scalar-prefetched flat
    (nt * n_chunks,)).  A tile pays only for the superclusters it
    crosses; everything else is a zero-fill store.

    Outputs are 3-D (TPB, n_chunks, 128) blocks: every chunk store is
    then a FULL-lane-row store at a static chunk index — Mosaic rejects
    a lane-offset store at a dynamic sublane index ("dynamic store with
    unaligned indices"), which is what the natural
    ``hit_out[p, pl.ds(j*128, 128)]`` form lowers to."""
    base = pl.program_id(0) * TPB

    def subtile(p, _):
        i = base + p

        @pl.when(act_ref[i] != 0)
        def _():
            lo = pl.multiple_of(p * tile, tile)
            b = b_ref[:, pl.ds(lo, tile)].T          # (tile, 8)
            oix, oiy, oiz, thi = b[:, 0:1], b[:, 1:2], b[:, 2:3], b[:, 3:4]
            ix, iy, iz = b[:, 4:5], b[:, 5:6], b[:, 6:7]
            for j in range(n_chunks):
                cl = pl.multiple_of(j * _SUPER, _SUPER)

                @pl.when(sup_ref[i * n_chunks + j] != 0)
                def _(j=j, cl=cl):
                    row = lambda k: box_ref[k, pl.ds(cl, _SUPER)][None, :]
                    t1 = ix * row(0) - oix
                    t2 = ix * row(4) - oix
                    nx = jnp.minimum(t1, t2); fx = jnp.maximum(t1, t2)
                    t1 = iy * row(1) - oiy
                    t2 = iy * row(5) - oiy
                    ny = jnp.minimum(t1, t2); fy = jnp.maximum(t1, t2)
                    t1 = iz * row(2) - oiz
                    t2 = iz * row(6) - oiz
                    nz = jnp.minimum(t1, t2); fz = jnp.maximum(t1, t2)
                    entry = jnp.maximum(nx, jnp.maximum(ny, nz))
                    exit_ = jnp.minimum(fx, jnp.minimum(fy, fz))
                    hit = (entry <= exit_) & (exit_ >= 0.0) & (entry <= thi)
                    hit_out[p, j, :] = jnp.any(hit, axis=0).astype(jnp.int32)
                    ent_out[p, j, :] = jnp.min(
                        jnp.where(hit, entry, jnp.inf), axis=0)

                @pl.when(sup_ref[i * n_chunks + j] == 0)
                def _(j=j):
                    hit_out[p, j, :] = jnp.zeros((_SUPER,), jnp.int32)
                    ent_out[p, j, :] = jnp.full((_SUPER,), jnp.inf,
                                                jnp.float32)

        @pl.when(act_ref[i] == 0)
        def _():
            for j in range(n_chunks):
                hit_out[p, j, :] = jnp.zeros((_SUPER,), jnp.int32)
                ent_out[p, j, :] = jnp.full((_SUPER,), jnp.inf, jnp.float32)

        return 0

    jax.lax.fori_loop(0, TPB, subtile, 0)


def _ray_mask_kernel(act_ref, box_ref, b_ref, hit_out, ent_out,
                     *, tile: int = TILE):
    """Pallas form of the exact per-ray mask: rays on sublanes (TILE per
    subtile) x cluster boxes on lanes (Cpad), the same pair layout as the
    visit kernels.  The ray bundle arrives PRE-DERIVED as
    [o*inv (3), thi, inv (3), pad] so the per-pair slab test is one FMA +
    min/max per axis; ``thi`` folds the t window AND the active mask
    (-inf on inactive lanes).  ``act_ref`` (scalar prefetch) lets fully-
    inactive tiles skip the pair work entirely (bounce-2 waves are ~10%
    active).  NOTE: the compute MUST stay under a pl.when even for the
    always-active case — the unguarded lowering is ~25x slower (Mosaic
    relayout pathology, experiments/exp_mask_kernel.py)."""
    base = pl.program_id(0) * TPB

    def subtile(p, _):
        i = base + p

        @pl.when(act_ref[i] != 0)
        def _():
            lo = pl.multiple_of(p * tile, tile)
            b = b_ref[:, pl.ds(lo, tile)].T          # (tile, 8)
            oix, oiy, oiz, thi = b[:, 0:1], b[:, 1:2], b[:, 2:3], b[:, 3:4]
            ix, iy, iz = b[:, 4:5], b[:, 5:6], b[:, 6:7]
            row = lambda j: box_ref[j, :][None, :]   # (1, Cpad)
            t1 = ix * row(0) - oix
            t2 = ix * row(4) - oix
            nx = jnp.minimum(t1, t2); fx = jnp.maximum(t1, t2)
            t1 = iy * row(1) - oiy
            t2 = iy * row(5) - oiy
            ny = jnp.minimum(t1, t2); fy = jnp.maximum(t1, t2)
            t1 = iz * row(2) - oiz
            t2 = iz * row(6) - oiz
            nz = jnp.minimum(t1, t2); fz = jnp.maximum(t1, t2)
            entry = jnp.maximum(nx, jnp.maximum(ny, nz))
            exit_ = jnp.minimum(fx, jnp.minimum(fy, fz))
            hit = (entry <= exit_) & (exit_ >= 0.0) & (entry <= thi)
            hit_out[p, :] = jnp.any(hit, axis=0).astype(jnp.int32)
            ent_out[p, :] = jnp.min(jnp.where(hit, entry, jnp.inf), axis=0)

        @pl.when(act_ref[i] == 0)
        def _():
            hit_out[p, :] = jnp.zeros((hit_out.shape[1],), jnp.int32)
            ent_out[p, :] = jnp.full((ent_out.shape[1],), jnp.inf,
                                     jnp.float32)

        return 0

    jax.lax.fori_loop(0, TPB, subtile, 0)


def _ray_cluster_mask_tpu(origin, dirs, active, cmin, cmax, t_hi, tile: int,
                          interpret: bool = False):
    """Pallas dispatch of the exact mask (TPU path of ray_cluster_mask).
    Bitwise-identical masks to the pure-jnp form (same clamped-reciprocal
    FMA math; equality pinned per wave in exp_mask_kernel.py).

    Above _SUPER_MIN_CPAD cluster columns the HIERARCHICAL kernel runs
    instead: a coarse supercluster pass (the cheap jnp mask over C/128
    union boxes) gates each 128-cluster chunk of the fine kernel, so
    per-tile mask work stops scaling O(C) (VERDICT round-3 item 5).
    ``interpret=True`` forces the Pallas interpreter (CPU kernel tests)."""
    r = dirs.shape[0]
    nt = r // tile
    if r % tile or nt % TPB:
        raise ValueError(
            f"ray count {r} must be a multiple of tile*TPB="
            f"{tile * TPB} on the TPU mask path (_pad_rays guarantees "
            "this on every library path; pad explicitly in experiments)")
    inv = jnp.where(
        dirs != 0.0,
        jnp.clip(1.0 / jnp.where(dirs != 0.0, dirs, 1.0), -_BIG, _BIG),
        _BIG,
    )
    oi = origin * inv
    thi = jnp.full((r,), jnp.inf) if t_hi is None else t_hi
    if active is not None:
        thi = jnp.where(active, thi, -jnp.inf)
        act = active.reshape(nt, tile).any(1).astype(jnp.int32)
    else:
        act = jnp.ones((nt,), jnp.int32)
    c = cmin.shape[0]
    cpad = -(-c // 128) * 128
    box = jnp.full((8, cpad), _BIG, jnp.float32)
    box = box.at[0:3, :c].set(cmin.T)
    box = box.at[4:7, :c].set(cmax.T)
    bundle = jnp.concatenate([
        oi.T, thi[None], inv.T, jnp.zeros((1, r), jnp.float32)])
    hier = cpad > _SUPER_MIN_CPAD
    if hier:
        n_chunks = cpad // _SUPER
        smin, smax = _super_boxes(cmin, cmax, cpad)
        sup_hit, _ = _ray_mask_jnp(origin, dirs, active, smin, smax,
                                   t_hi, tile)
        sup = sup_hit.astype(jnp.int32).reshape(nt * n_chunks)
        kernel = functools.partial(_ray_mask_kernel_hier, tile=tile,
                                   n_chunks=n_chunks)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nt // TPB,),
            in_specs=[
                pl.BlockSpec((8, cpad), lambda i, *_: (0, 0)),
                pl.BlockSpec((8, TPB * tile), lambda i, *_: (0, i)),
            ],
            out_specs=[
                pl.BlockSpec((TPB, n_chunks, _SUPER),
                             lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((TPB, n_chunks, _SUPER),
                             lambda i, *_: (i, 0, 0)),
            ],
        )
        hit, ent = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((nt, n_chunks, _SUPER), jnp.int32),
                jax.ShapeDtypeStruct((nt, n_chunks, _SUPER), jnp.float32),
            ],
            interpret=interpret,
        )(act, sup, box, bundle)
        hit = hit.reshape(nt, cpad)
        ent = ent.reshape(nt, cpad)
        return hit[:, :c] != 0, ent[:, :c]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt // TPB,),
        in_specs=[
            pl.BlockSpec((8, cpad), lambda i, *_: (0, 0)),
            pl.BlockSpec((8, TPB * tile), lambda i, *_: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((TPB, cpad), lambda i, *_: (i, 0)),
            pl.BlockSpec((TPB, cpad), lambda i, *_: (i, 0)),
        ],
    )
    hit, ent = pl.pallas_call(
        functools.partial(_ray_mask_kernel, tile=tile),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nt, cpad), jnp.int32),
            jax.ShapeDtypeStruct((nt, cpad), jnp.float32),
        ],
        interpret=interpret,
    )(act, box, bundle)
    return hit[:, :c] != 0, ent[:, :c]


def ray_cluster_mask(origin, dirs, active, cmin, cmax, t_hi, tile: int):
    """(nt, C) exact tile shortlist: does ANY tile ray's slab test cross
    this cluster box (within its t window)?

    origin/dirs: (R, 3); active: (R,) bool or None; cmin/cmax: (C, 3);
    t_hi: per-ray conservative upper bound on useful t ((R,) or None —
    shadow segments pass 1.0).  Returns (hit (nt, C) bool, entry (nt, C)
    f32 = min slab entry over the tile's hitting rays, +inf when none) —
    the entry orders visits front-to-back in ``_compact``.

    Each (ray, cluster) pair gets the reference's slab test
    (raytracer.cpp:101-126).  Zero direction components use a FINITE
    reciprocal sentinel (_BIG): both slab planes then land on the same
    huge-t side exactly when the origin is outside the slab (miss) and
    straddle it when inside (unconstrained) — the IEEE-inf behaviors
    without any NaN (0 * _BIG = 0 puts an on-face origin at t = 0,
    conservatively inside).  The origin term o*inv is per-RAY and hoisted
    out of the cluster broadcast, so per-pair work is 2 FMAs + min + max
    per axis + the reductions (~19 VPU ops — far more than the interval
    mask pays per tile, but XLA fuses the (nt, tile, C) elementwise +
    reduce without materializing it, and the visit savings dwarf the
    mask cost: the kernels are pair-work bound; exp_exact_mask.py).

    On TPU the mask runs as a Pallas kernel (_ray_mask_kernel: ~1.4x the
    fused-XLA cost, plus fully-inactive tiles skip outright); elsewhere
    (CPU tests) the pure-jnp form below computes the identical result.
    """
    origin = jax.lax.stop_gradient(origin)
    dirs = jax.lax.stop_gradient(dirs)
    if not _interpret():
        return _ray_cluster_mask_tpu(origin, dirs, active, cmin, cmax,
                                     t_hi, tile)
    return _ray_mask_jnp(origin, dirs, active, cmin, cmax, t_hi, tile)


def _compact(hit, entry, max_list: int):
    """(hit, entry) (nt, C) -> (words (nt*W,) i32, ids (nt*max_list,) i32,
    elist (nt*max_list,) f32, counts (nt,) i32).

    ids holds the first max_list candidate clusters sorted FRONT-TO-BACK
    by conservative slab entry — the order is load-bearing for exact-t
    tie semantics (the accumulator kernels keep the earliest visit) and
    favors any-hit early exits; elist carries those entries (+inf pad)
    for diagnostics.  counts is UNclamped so the kernel can detect
    overflow and fall back to scanning the (unordered) bitmask."""
    nt, c = hit.shape
    counts = hit.sum(1).astype(jnp.int32)
    k = min(max_list, c)
    keys = jnp.where(hit, -entry, -jnp.inf)
    vals, ids = jax.lax.top_k(keys, k)   # descending -entry == ascending entry
    ids = ids.astype(jnp.int32)
    elist = -vals                         # +inf on non-candidate slots
    if k < max_list:
        ids = jnp.pad(ids, ((0, 0), (0, max_list - k)))
        elist = jnp.pad(elist, ((0, 0), (0, max_list - k)),
                        constant_values=jnp.inf)
    w = -(-c // 32)
    pad = w * 32 - c
    hp = jnp.pad(hit, ((0, 0), (0, pad))) if pad else hit
    weights = jnp.left_shift(jnp.int32(1), jnp.arange(32, dtype=jnp.int32))
    words = (hp.reshape(nt, w, 32).astype(jnp.int32) * weights[None, None]).sum(-1)
    return (words.reshape(-1).astype(jnp.int32), ids.reshape(-1),
            elist.reshape(-1), counts)


# ---------------------------------------------------------------------------
# Phase 2: dense per-tile cluster intersection (Pallas)
# ---------------------------------------------------------------------------

def _tri_cluster_test(tri_ref, s, ox, oy, oz, dx, dy, dz, n_tri: int,
                      bfc: bool = False):
    """Wald-form test of one 128-triangle cluster vs the ray tile.
    Returns (t, ok) of shape (TILE, CLUSTER).  With ``bfc`` (a compile-time
    flag), triangles facing away from the ray (d·n > 0) are culled — the
    TA's outputs/ golden semantics; the reference itself never culls."""
    row = lambda j: tri_ref[j, pl.ds(s, CLUSTER)][None, :]  # (1, CLUSTER)
    nx, ny, nz = row(0), row(1), row(2)
    w1x, w1y, w1z = row(3), row(4), row(5)
    w2x, w2y, w2z = row(6), row(7), row(8)
    naa, w1aa, w2aa = row(9), row(10), row(11)
    nd = dx * nx + dy * ny + dz * nz
    no = ox * nx + oy * ny + oz * nz
    t = (naa - no) / nd
    beta = (ox * w1x + oy * w1y + oz * w1z) + t * (dx * w1x + dy * w1y + dz * w1z) - w1aa
    gamma = (ox * w2x + oy * w2y + oz * w2z) + t * (dx * w2x + dy * w2y + dz * w2z) - w2aa
    alpha = 1.0 - beta - gamma
    # padding slots hold all-zero rows: nd == 0 -> t = 0/0 = NaN -> every
    # comparison below is False, so no lane mask is needed
    del n_tri
    ok = (alpha >= 0.0) & (beta >= 0.0) & (gamma >= 0.0) & (t >= 0.0)
    if bfc:
        ok &= nd < 0.0
    return t, ok


def _sph_cluster_test(sph_ref, s, ox, oy, oz, dx, dy, dz, n_sph: int):
    """Quadratic test of one 128-sphere cluster (reference quirk: reports
    the smaller root even when negative, raytracer.cpp:82-92)."""
    row = lambda j: sph_ref[j, pl.ds(s, CLUSTER)][None, :]
    cx, cy, cz, rad = row(0), row(1), row(2), row(3)
    ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
    a_q = dx * dx + dy * dy + dz * dz                      # (TILE, 1)
    b_q = 2.0 * (dx * ocx + dy * ocy + dz * ocz)
    c_q = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
    disc = b_q * b_q - 4.0 * a_q * c_q
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b_q - sq) / (2.0 * a_q)
    # t2 = (-b_q + sq) / (2 a_q) is consumed ONLY by its sign test, and
    # IEEE division by 2a > 0 preserves the numerator's sign exactly
    # (incl. the +-0 cases), so the per-pair divide is dropped
    # bitwise-safely: t2 < 0  <=>  (sq - b_q) < 0  (fl(sq - b_q) ==
    # fl(-b_q + sq), addition is bitwise commutative)
    t2neg = (sq - b_q) < 0.0
    # padding slots have radius 0 and are rejected explicitly (a zero
    # sphere at the origin could otherwise produce a tangent root)
    del n_sph
    ok = (disc >= 0.0) & ~((t1 < 0.0) & t2neg) & (rad > 0.0)
    return t1, ok


# Shadow kernels: when the scene's WHOLE sphere table spans at most this
# many 128-slot cluster rows, the per-tile sphere shortlist WALK is
# replaced by ONE dense (TILE, Ps) pass over every sphere.  Measured on
# marbles (650 spheres = 6 cluster rows, the only bundled scene in this
# regime): the walk machinery (while_loop + per-visit row loads +
# early-exit reduces) is ~31 of the 43.7 ms bounce-0 2-light shadow wave
# while the pair MATH is ~1 ms (exp_marbles_shadow_anatomy.py,
# exp_relaxed_marbles.py) — the dense pass pays all pairs but none of
# the machinery.  Bitwise-safe: any-hit ORs are order-free, and every
# acceptable pair's cluster is provably shortlisted (origin-inside-
# sphere implies origin-inside-box implies slab hit), so OR over ALL
# clusters equals OR over the shortlist.
#
# Round-5 close-out: GATING each dense row on its exact-mask bitmask bit
# (already in SMEM; live marbles tiles need only 2.7-4.9 of the 6 rows,
# exp_marbles_rowgate_stats.py) is a measured LOSS — marbles 254.6 ->
# 331 ms with a pure static scalar bit test per row, 368 ms when a
# vector->scalar all-lanes-occluded early exit is folded into the gate.
# A Mosaic pl.when costs ~150 cycles and breaks cross-row software
# pipelining, eating the ~350-cycle row saving; the unconditional
# straight-line form below stays.
DENSE_SPH_ROWS = 8


def _sph_dense_occluded(sph_ref, ox, oy, oz, dx, dy, dz, tmax,
                        relaxed: bool):
    """(TILE, 1) any-occluded over the FULL sphere table (all Ps slots,
    padding rejected by rad > 0); same per-pair math as
    _sph_cluster_test / _sph_cluster_occluded_relaxed."""
    row = lambda j: sph_ref[j, :][None, :]          # (1, Ps)
    cx, cy, cz, rad = row(0), row(1), row(2), row(3)
    ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
    a_q = dx * dx + dy * dy + dz * dz
    b_q = 2.0 * (dx * ocx + dy * ocy + dz * ocz)
    c_q = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
    disc = b_q * b_q - 4.0 * a_q * c_q
    if relaxed:
        u = 2.0 * a_q * tmax + b_q
        hit = ((rad > 0.0) & (disc >= 0.0)
               & ((b_q <= 0.0) | (c_q <= 0.0))
               & ((u > 0.0) | (disc > u * u)))
    else:
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t1 = (-b_q - sq) / (2.0 * a_q)
        # t2's divide dropped bitwise-safely (see _sph_cluster_test)
        ok = (disc >= 0.0) & ~((t1 < 0.0) & ((sq - b_q) < 0.0)) & (rad > 0.0)
        hit = ok & (t1 < tmax)
    return jnp.any(hit, axis=1, keepdims=True)


def _sph_cluster_occluded_relaxed(sph_ref, s, ox, oy, oz, dx, dy, dz, tmax):
    """sqrt/div-FREE sphere any-hit: sign tests algebraically equivalent
    to ``ok & (t1 < tmax)`` of _sph_cluster_test (a_q > 0):

        t2 >= 0       <=>  b <= 0  or  c <= 0
        t1 < tmax     <=>  u > 0   or  disc > u^2,   u = 2*a*tmax + b

    Saves the per-pair sqrt + 2 divisions (the transcendental-unit ops
    in the sphere shadow body).  NOT bitwise against the root form —
    grazing/tangent pairs (disc ~ 0 or u ~ 0) can flip under f32
    rounding, the exact class the light-side shadow reversal was
    rejected for (ROADMAP round-2) — hence opt-in via --relaxed-parity
    and default-off everywhere."""
    row = lambda j: sph_ref[j, pl.ds(s, CLUSTER)][None, :]
    cx, cy, cz, rad = row(0), row(1), row(2), row(3)
    ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
    a_q = dx * dx + dy * dy + dz * dz
    b_q = 2.0 * (dx * ocx + dy * ocy + dz * ocz)
    c_q = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
    disc = b_q * b_q - 4.0 * a_q * c_q
    u = 2.0 * a_q * tmax + b_q
    return ((rad > 0.0) & (disc >= 0.0)
            & ((b_q <= 0.0) | (c_q <= 0.0))
            & ((u > 0.0) | (disc > u * u)))


def _load_rays(b_ref, p):
    """Load subtile p's ray bundle as (TILE, 1) sublane vectors.

    Rays arrive as one (8, R) bundle [ox oy oz tmax dx dy dz pad] so the
    dynamic subtile slice runs along the 128-aligned lane dimension
    (Mosaic rejects dynamic views whose minor dim is the unaligned
    literal 3) and ONE fused (8, TILE) -> (TILE, 8) relayout per subtile
    replaces seven separate lane->sublane transposes."""
    lo = pl.multiple_of(p * TILE, TILE)
    b = b_ref[:, pl.ds(lo, TILE)].T          # (TILE, 8) single relayout
    return (b[:, 0:1], b[:, 1:2], b[:, 2:3], b[:, 3:4],
            b[:, 4:5], b[:, 5:6], b[:, 6:7])


def _visit_clusters(i, w_ref, l_ref, c_ref, n_clusters: int, max_list: int,
                    wpt: int, body, keep_going=None):
    """Run `body(cluster_id)` for every candidate cluster of tile i.

    Fast path: iterate the compacted id list (count entries), which is
    sorted front-to-back (list order is load-bearing: the accumulator
    kernels keep the EARLIEST visit on exact-t ties).  Fallback
    (count > max_list): scan all clusters via the (unordered) bitmask.
    An optional `keep_going()` predicate allows early termination
    (any-hit).  A front-to-back entry-bound prune existed here and was
    REMOVED with the lanewise accumulators: it needs a per-visit
    vector->scalar best-t reduction, which costs more than the few
    prunable visits it skips (round-1 measurement; ROADMAP).
    """
    n = c_ref[i]

    @pl.when(n <= max_list)
    def _():
        if keep_going is None:
            def from_list(k, _):
                body(l_ref[i * max_list + k])
                return 0
            jax.lax.fori_loop(0, n, from_list, 0)
        else:
            def cond(k):
                return (k < n) & keep_going()

            def step(k):
                body(l_ref[i * max_list + k])
                return k + 1
            jax.lax.while_loop(cond, step, 0)

    @pl.when(n > max_list)
    def _():
        if keep_going is None:
            def from_bits(k, _):
                bit = (w_ref[i * wpt + (k >> 5)] >> (k & 31)) & 1

                @pl.when(bit != 0)
                def _():
                    body(k)

                return 0
            jax.lax.fori_loop(0, n_clusters, from_bits, 0)
        else:
            def cond(k):
                return (k < n_clusters) & keep_going()

            def step(k):
                bit = (w_ref[i * wpt + (k >> 5)] >> (k & 31)) & 1

                @pl.when(bit != 0)
                def _():
                    body(k)

                return k + 1
            jax.lax.while_loop(cond, step, 0)


def _closest_kernel(
    tw_ref, tl_ref, tc_ref, sw_ref, sl_ref, sc_ref,  # SMEM
    *rest,                  # [org_ref if shared_origin] + VMEM in/out/scratch
    n_tri: int, n_sph: int, ct: int, cs: int, pt: int, wt: int, ws: int,
    bfc: bool = False, shared_origin: bool = False,
):
    """With ``shared_origin`` (primary/eye wavefronts) the origin arrives
    as three SMEM scalars and every origin-dependent Wald/quadratic term
    (n·o, w1·o, w2·o, o-c) collapses to a per-primitive (1, CLUSTER) row
    instead of per-pair (TILE, CLUSTER) work — ~1/3 fewer VPU ops — and
    the ray bundle shrinks to directions only (half the relayout).

    The per-visit best is kept as a LANEWISE accumulator pair
    (acc_t running min, acc_k winning cluster id per lane) — 3 cheap ops
    per visit — instead of an in-visit min+argmin lane reduction
    (~20 ops); the single reduction to (t, slot) runs once per subtile.
    Tie semantics: per lane, the earliest (front-to-back) visit wins and
    spheres visit after triangles (strict <, matching the reference's
    leaf order, raytracer.cpp:199-216); ACROSS lanes an exact-t tie picks
    the lowest lane rather than the earliest visit — both orders already
    differ from the reference's BVH leaf order, and exact cross-primitive
    t ties only arise on shared silhouette edges (the per-scene sweep
    pins dual-engine agreement at <=1 quantization LSB)."""
    if shared_origin:
        org_ref, b_ref, tri_ref, sph_ref, bt_out, bs_out, acc_t, acc_k = rest
    else:
        b_ref, tri_ref, sph_ref, bt_out, bs_out, acc_t, acc_k = rest
    base = pl.program_id(0) * TPB

    def subtile(p, _):
        i = base + p

        # tiles with NO candidates (background-only, or fully-inactive on
        # sparse secondary waves) skip the whole body: the ray relayout,
        # the (TILE, CLUSTER) accumulator init and the final reduction
        # are ~6ms/frame of fixed floor at zero visits (exp_fixed_floor)
        @pl.when((tc_ref[i] == 0) & (sc_ref[i] == 0))
        def _():
            bt_out[p, :] = jnp.full((TILE,), jnp.inf, jnp.float32)
            bs_out[p, :] = jnp.full((TILE,), -1, jnp.int32)

        @pl.when((tc_ref[i] != 0) | (sc_ref[i] != 0))
        def _():
            _closest_subtile(p, i)

        return 0

    def _closest_subtile(p, i):
        if shared_origin:
            lo = pl.multiple_of(p * TILE, TILE)
            bnd = b_ref[:, pl.ds(lo, TILE)].T        # (TILE, 4)
            dx, dy, dz = bnd[:, 0:1], bnd[:, 1:2], bnd[:, 2:3]
            ox, oy, oz = org_ref[0], org_ref[1], org_ref[2]
        else:
            ox, oy, oz, _, dx, dy, dz = _load_rays(b_ref, p)
        acc_t[:] = jnp.full((TILE, CLUSTER), jnp.inf, jnp.float32)
        acc_k[:] = jnp.zeros((TILE, CLUSTER), jnp.int32)

        def tri_body(k):
            # the dynamic lane offset IS cluster-aligned — without the
            # hint Mosaic must assume arbitrary alignment and pay a
            # dynamic relayout per row load
            s = pl.multiple_of(k * CLUSTER, CLUSTER)
            t, ok = _tri_cluster_test(tri_ref, s, ox, oy, oz, dx, dy, dz,
                                      n_tri, bfc=bfc)
            t = jnp.where(ok, t, jnp.inf)
            upd = t < acc_t[:]
            acc_k[:] = jnp.where(upd, k, acc_k[:])
            acc_t[:] = jnp.where(upd, t, acc_t[:])

        def sph_body(k):
            # the dynamic lane offset IS cluster-aligned — without the
            # hint Mosaic must assume arbitrary alignment and pay a
            # dynamic relayout per row load
            s = pl.multiple_of(k * CLUSTER, CLUSTER)
            t, ok = _sph_cluster_test(sph_ref, s, ox, oy, oz, dx, dy, dz, n_sph)
            t = jnp.where(ok, t, jnp.inf)
            # strict < keeps triangles on same-lane exact ties (leaf
            # order, raytracer.cpp:199-216)
            upd = t < acc_t[:]
            acc_k[:] = jnp.where(upd, ct + k, acc_k[:])
            acc_t[:] = jnp.where(upd, t, acc_t[:])

        _visit_clusters(i, tw_ref, tl_ref, tc_ref, ct, MAX_TRI_LIST, wt,
                        tri_body)
        if cs <= DENSE_SPH_ROWS:
            # small sphere tables: visit EVERY cluster unconditionally
            # in ascending order — the walk's per-visit machinery costs
            # more than the spared visits (marbles closest: 12.8 of
            # 16.1 ms is sphere-side, mostly walk overhead;
            # exp_marbles_closest_anatomy.py).  Ascending visit order is
            # the engine's existing bitmask-fallback semantic; it can
            # flip only EXACT cross-cluster float-t ties vs the
            # entry-sorted list walk.
            @pl.when(sc_ref[i] != 0)
            def _():
                for k in range(cs):
                    sph_body(k)
        else:
            _visit_clusters(i, sw_ref, sl_ref, sc_ref, cs, MAX_SPH_LIST,
                            ws, sph_body)
        at = acc_t[:]
        tmin = jnp.min(at, axis=1, keepdims=True)
        j = jnp.argmin(at, axis=1, keepdims=True).astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (TILE, CLUSTER), 1)
        kb = jnp.max(jnp.where(lane == j, acc_k[:], -1), axis=1,
                     keepdims=True)
        slot = jnp.where(kb >= ct,
                         pt + (kb - ct) * CLUSTER + j,
                         kb * CLUSTER + j)
        slot = jnp.where(tmin < jnp.inf, slot, -1)
        bt_out[p, :] = tmin[:, 0]
        bs_out[p, :] = slot[:, 0]

    jax.lax.fori_loop(0, TPB, subtile, 0)


def _any_kernel(
    tw_ref, tl_ref, tc_ref, sw_ref, sl_ref, sc_ref,
    b_ref, tri_ref, sph_ref,
    found_out,
    fnd,
    *, n_tri: int, n_sph: int, ct: int, cs: int, pt: int, wt: int, ws: int,
    bfc: bool = False, relaxed: bool = False,
):
    base = pl.program_id(0) * TPB

    def subtile(p, _):
        i = base + p

        @pl.when((tc_ref[i] == 0) & (sc_ref[i] == 0))
        def _():
            found_out[p, :] = jnp.zeros((TILE,), jnp.int32)

        @pl.when((tc_ref[i] != 0) | (sc_ref[i] != 0))
        def _():
            _any_subtile(p, i)

        return 0

    def _any_subtile(p, i):
        ox, oy, oz, tmax, dx, dy, dz = _load_rays(b_ref, p)
        fnd[:] = jnp.zeros((TILE, 1), jnp.int32)

        def tri_body(k):
            # the dynamic lane offset IS cluster-aligned — without the
            # hint Mosaic must assume arbitrary alignment and pay a
            # dynamic relayout per row load
            s = pl.multiple_of(k * CLUSTER, CLUSTER)
            t, ok = _tri_cluster_test(tri_ref, s, ox, oy, oz, dx, dy, dz,
                                      n_tri, bfc=bfc)
            hit = ok & (t < tmax)
            fnd[:] = fnd[:] | jnp.any(hit, axis=1, keepdims=True).astype(jnp.int32)

        def sph_body(k):
            # the dynamic lane offset IS cluster-aligned — without the
            # hint Mosaic must assume arbitrary alignment and pay a
            # dynamic relayout per row load
            s = pl.multiple_of(k * CLUSTER, CLUSTER)
            if relaxed:
                hit = _sph_cluster_occluded_relaxed(
                    sph_ref, s, ox, oy, oz, dx, dy, dz, tmax)
            else:
                t, ok = _sph_cluster_test(sph_ref, s, ox, oy, oz, dx, dy, dz,
                                          n_sph)
                hit = ok & (t < tmax)
            fnd[:] = fnd[:] | jnp.any(hit, axis=1, keepdims=True).astype(jnp.int32)

        def not_all_found():
            # early exit: stop visiting clusters once every lane is occluded
            return jnp.sum(fnd[:]) < TILE

        # a while_loop's cond evaluates keep_going() (a (TILE, 1)
        # reduce) even when the list is empty — guard each walk on its
        # count (~1.7 ms/frame on horse_and_mug, whose sphere lists are
        # always empty on the kernel path)
        @pl.when(tc_ref[i] != 0)
        def _():
            _visit_clusters(i, tw_ref, tl_ref, tc_ref, ct, MAX_TRI_LIST,
                            wt, tri_body, keep_going=not_all_found)

        @pl.when(sc_ref[i] != 0)
        def _():
            if cs <= DENSE_SPH_ROWS:
                for k in range(cs):  # order-free ORs; walk overhead >
                    sph_body(k)      # the spared visits (see closest)
            else:
                _visit_clusters(i, sw_ref, sl_ref, sc_ref, cs,
                                MAX_SPH_LIST, ws, sph_body,
                                keep_going=not_all_found)

        found_out[p, :] = fnd[:, 0]

    jax.lax.fori_loop(0, TPB, subtile, 0)


def _cross_rows(u, v):
    return jnp.stack([
        u[1] * v[2] - u[2] * v[1],
        u[2] * v[0] - u[0] * v[2],
        u[0] * v[1] - u[1] * v[0],
    ])


# per-light shadow plane tables beyond this size fall back to the generic
# Wald any-hit kernel (the (16, Pt) table must be VMEM-resident; ~16 MB/core)
SHADOW_PLANES_BYTES_MAX = 8 << 20


def build_shadow_planes(cset: ClusterSet, light_pos, bfc: bool = False):
    """(16, Pt) f32 per-light occlusion planes for every triangle slot.

    Every shadow ray is a SEGMENT from a surface point o to THE SAME point
    light L (t < dist, raytracer.cpp:399-405).  With the far endpoint
    fixed, the reference's ray-triangle test (Cramer barycentric +
    0 <= t < d, raytracer.cpp:129-175,227-253) is equivalent to FOUR sign
    tests of planes that depend only on (triangle, L) — the triangle's
    supporting plane and the three planes through L and each edge (the
    classic signed-tetra-volume segment test).  All four share one orientation
    sigma = -sign(n·(L-A)), so after scaling by sigma the kernel-side test
    is just:  occluded  <=>  u0>=0 & v1>=0 & v2>=0 & v3>=0,  where each
    value is a single plane evaluation AT THE RAY ORIGIN — no direction,
    no t, no division (~2.4x fewer VPU ops than the Wald form).

    Row layout: [0:4] sigma*(n, -n·A)  (u0>=0 <=> 0 <= t AND t < d; the
    d-row is -1 on degenerate/padding slots so they can never occlude),
    [4:8] sigma*(m1, -m1·L) with m1 = (A-L)x(B-L), [8:12] edge BC,
    [12:16] edge CA.  v_i(o) has the sign of v_i at the plane crossing
    because the edge planes contain L (v_i(s) = (1-s)*v_i(0)).

    Inclusivity matches the reference exactly in reals: barycentric >= 0
    inclusive <=> v_i >= 0; t >= 0 inclusive / t < d strict <=> u0 >= 0
    with k0 = n·(L-A) != 0.  ``bfc`` culls backfacing occluders
    (n·d < 0 <=> k0 < 0 for any in-window pair), a build-time constant.

    Built on device per render from the set's verbatim f32 vertices, so
    traced light positions (training loops) stay correct.
    """
    sv = cset.tri_verts
    a, b, c = sv[0:3], sv[3:6], sv[6:9]          # (3, Pt) each
    lp = jnp.asarray(light_pos, jnp.float32).reshape(3, 1)
    n = _cross_rows(b - a, c - a)
    d0 = -(n * a).sum(0)
    k0 = (n * (lp - a)).sum(0)
    la, lb, lc = a - lp, b - lp, c - lp
    m1 = _cross_rows(la, lb)
    m2 = _cross_rows(lb, lc)
    m3 = _cross_rows(lc, la)
    c1 = -(m1 * lp).sum(0)
    c2 = -(m2 * lp).sum(0)
    c3 = -(m3 * lp).sum(0)
    ok = k0 < 0.0 if bfc else k0 != 0.0
    s = jnp.where(ok, -jnp.sign(k0), 0.0)
    d0 = jnp.where(ok, s * d0, -1.0)
    return jnp.concatenate([
        s * n, d0[None],
        s * m1, (s * c1)[None],
        s * m2, (s * c2)[None],
        s * m3, (s * c3)[None],
    ], axis=0)


def _shadow_kernel(
    tw_ref, tl_ref, tc_ref, sw_ref, sl_ref, sc_ref, lp_ref,  # SMEM
    b_ref, pln_ref, sph_ref,                                 # VMEM inputs
    found_out,
    fnd, acc,
    *, n_sph: int, ct: int, cs: int, wt: int, ws: int,
    early_exit: bool = True, relaxed: bool = False,
):
    """Any-hit over fixed-light segments: 4-plane sign test per triangle
    pair, evaluated at the ray ORIGIN only (origins are the sole per-ray
    input).  Spheres reuse the quadratic with d = L - o recomputed from
    the SMEM light position (bitwise the segment direction the generic
    kernel is given).

    The kernel is VPU ISSUE-bound (~one (8,128) op per cycle — measured
    1.37us per 40-op visit), so the visit body is kept to the minimum op
    count: dot products chained for FMA fusion, the four sign tests
    folded to one min, and per-visit results accumulated into a
    (TILE, CLUSTER) running max (ONE op) instead of an 9-op lane
    reduction; the any-lane reduction runs once per subtile."""
    dense_sph = cs <= DENSE_SPH_ROWS
    base = pl.program_id(0) * TPB

    def subtile(p, _):
        i = base + p

        @pl.when((tc_ref[i] == 0) & (sc_ref[i] == 0))
        def _():
            found_out[p, :] = jnp.zeros((TILE,), jnp.int32)

        @pl.when((tc_ref[i] != 0) | (sc_ref[i] != 0))
        def _():
            _shadow_subtile(p, i)

        return 0

    def _shadow_subtile(p, i):
        lo = pl.multiple_of(p * TILE, TILE)
        bnd = b_ref[:, pl.ds(lo, TILE)].T       # (TILE, 4) single relayout
        ox, oy, oz = bnd[:, 0:1], bnd[:, 1:2], bnd[:, 2:3]
        fnd[:] = jnp.zeros((TILE, 1), jnp.int32)
        acc[:] = jnp.full((TILE, CLUSTER), -jnp.inf, jnp.float32)

        def tri_body(k):
            # the dynamic lane offset IS cluster-aligned — without the
            # hint Mosaic must assume arbitrary alignment and pay a
            # dynamic relayout per row load
            s = pl.multiple_of(k * CLUSTER, CLUSTER)
            row = lambda j: pln_ref[j, pl.ds(s, CLUSTER)][None, :]
            u0 = ox * row(0) + (oy * row(1) + (oz * row(2) + row(3)))
            v1 = ox * row(4) + (oy * row(5) + (oz * row(6) + row(7)))
            v2 = ox * row(8) + (oy * row(9) + (oz * row(10) + row(11)))
            v3 = ox * row(12) + (oy * row(13) + (oz * row(14) + row(15)))
            m = jnp.minimum(jnp.minimum(u0, v1), jnp.minimum(v2, v3))
            acc[:] = jnp.maximum(acc[:], m)

        _visit_clusters(i, tw_ref, tl_ref, tc_ref, ct, MAX_TRI_LIST, wt,
                        tri_body)
        # occluded <=> some candidate's min-plane value is >= 0; fold the
        # triangle verdict into fnd so the sphere walk's early exit sees it
        fnd[:] = fnd[:] | jnp.any(acc[:] >= 0.0, axis=1,
                                  keepdims=True).astype(jnp.int32)

        def sph_body(k):
            # the dynamic lane offset IS cluster-aligned — without the
            # hint Mosaic must assume arbitrary alignment and pay a
            # dynamic relayout per row load
            s = pl.multiple_of(k * CLUSTER, CLUSTER)
            dx, dy, dz = lp_ref[0] - ox, lp_ref[1] - oy, lp_ref[2] - oz
            if relaxed:
                hit = _sph_cluster_occluded_relaxed(
                    sph_ref, s, ox, oy, oz, dx, dy, dz, 1.0)
            else:
                t, ok = _sph_cluster_test(sph_ref, s, ox, oy, oz, dx, dy, dz,
                                          n_sph)
                hit = ok & (t < 1.0)
            fnd[:] = fnd[:] | jnp.any(hit, axis=1, keepdims=True).astype(
                jnp.int32)

        def not_all_found():
            return jnp.sum(fnd[:]) < TILE

        kg = not_all_found if early_exit else None

        @pl.when(sc_ref[i] != 0)
        def _():
            if dense_sph:
                dx = lp_ref[0] - ox
                dy = lp_ref[1] - oy
                dz = lp_ref[2] - oz
                hit = _sph_dense_occluded(sph_ref, ox, oy, oz, dx, dy, dz,
                                          1.0, relaxed)
                fnd[:] = fnd[:] | hit.astype(jnp.int32)
            else:
                _visit_clusters(i, sw_ref, sl_ref, sc_ref, cs,
                                MAX_SPH_LIST, ws, sph_body, keep_going=kg)
        found_out[p, :] = fnd[:, 0]

    jax.lax.fori_loop(0, TPB, subtile, 0)


@functools.partial(jax.jit,
                   static_argnames=("n_sph", "early_exit", "relaxed"))
def _cluster_shadow_call(thit, shit, origin, planes, lp, sph_dat,
                         n_sph: int, early_exit: bool = True,
                         relaxed: bool = False):
    r = origin.shape[0]
    nt = r // TILE
    if nt > MAX_NT:
        outs = []
        for s in range(0, nt, MAX_NT):
            e = min(s + MAX_NT, nt)
            outs.append(_cluster_shadow_call(
                (thit[0][s:e], thit[1][s:e]), (shit[0][s:e], shit[1][s:e]),
                origin[s * TILE : e * TILE], planes, lp, sph_dat, n_sph,
                early_exit, relaxed,
            ))
        return jnp.concatenate(outs)
    pt = planes.shape[1]
    ps = sph_dat.shape[1]
    ct, cs = pt // CLUSTER, ps // CLUSTER
    tw, tl, _, tc = _compact(*thit, MAX_TRI_LIST)
    sw, sl, _, sc = _compact(*shit, MAX_SPH_LIST)
    wt, ws = tw.shape[0] // nt, sw.shape[0] // nt
    kernel = functools.partial(
        _shadow_kernel, n_sph=n_sph, ct=ct, cs=cs, wt=wt, ws=ws,
        early_exit=early_exit, relaxed=relaxed,
    )
    bundle = jnp.concatenate([origin.T, jnp.zeros((1, r), jnp.float32)])
    blk = TPB * TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(nt // TPB,),
        in_specs=[
            pl.BlockSpec((4, blk), lambda i, *_: (0, i)),
            pl.BlockSpec((16, pt), lambda i, *_: (0, 0)),
            pl.BlockSpec((4, ps), lambda i, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TPB, TILE), lambda i, *_: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((TILE, 1), jnp.int32),
            pltpu.VMEM((TILE, CLUSTER), jnp.float32),
        ],
    )
    found = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt, TILE), jnp.int32),
        interpret=_interpret(),
    )(tw, tl, tc, sw, sl, sc, lp, bundle, planes, sph_dat)
    return found.reshape(r) != 0


def _shadow_kernel_ml(*args, n_sph: int, ct: int, cs: int, wt: int,
                      ws: int, n_lights: int, early_exit: bool = True,
                      relaxed: bool = False):
    """Multi-light variant of _shadow_kernel: ONE grid pass visits every
    light's shortlist per subtile, sharing the ray-origin relayout and
    the per-program fixed cost (~2 ms/call at zero visits).  Per-light
    occlusion bits land in one int32 bitfield output (bit l = light l
    occluded).  Visit math, order, and early-exit semantics per light
    are identical to the single-light kernel, so results are bitwise
    the same."""
    nl = n_lights
    sl_refs = args[: 6 * nl]        # per light: tw, tl, tc, sw, sl, sc
    lp_ref = args[6 * nl]           # (3 * nl,) light positions
    b_ref = args[6 * nl + 1]
    plns = args[6 * nl + 2 : 6 * nl + 2 + nl]
    sph_ref = args[6 * nl + 2 + nl]
    found_out = args[6 * nl + 3 + nl]
    fnd, acc = args[6 * nl + 4 + nl :]
    dense_sph = cs <= DENSE_SPH_ROWS
    base = pl.program_id(0) * TPB

    def subtile(p, _):
        i = base + p
        empty = (sl_refs[2][i] == 0) & (sl_refs[5][i] == 0)
        for l in range(1, nl):
            empty &= (sl_refs[6 * l + 2][i] == 0) & (sl_refs[6 * l + 5][i] == 0)

        @pl.when(empty)
        def _():
            found_out[p, :] = jnp.zeros((TILE,), jnp.int32)

        @pl.when(~empty)
        def _():
            _shadow_subtile_ml(p, i)

        return 0

    def _shadow_subtile_ml(p, i):
        lo = pl.multiple_of(p * TILE, TILE)
        bnd = b_ref[:, pl.ds(lo, TILE)].T   # (TILE, 4) ONE shared relayout
        ox, oy, oz = bnd[:, 0:1], bnd[:, 1:2], bnd[:, 2:3]
        fnd[:] = jnp.zeros((TILE, 1), jnp.int32)
        for l in range(nl):
            tw, tl_, tc, sw, sl_, sc = sl_refs[6 * l : 6 * l + 6]
            pln_ref = plns[l]
            bit = jnp.int32(1 << l)
            acc[:] = jnp.full((TILE, CLUSTER), -jnp.inf, jnp.float32)

            def tri_body(k):
                # cluster-aligned dynamic lane offset (see _shadow_kernel)
                sk = pl.multiple_of(k * CLUSTER, CLUSTER)
                row = lambda j: pln_ref[j, pl.ds(sk, CLUSTER)][None, :]
                u0 = ox * row(0) + (oy * row(1) + (oz * row(2) + row(3)))
                v1 = ox * row(4) + (oy * row(5) + (oz * row(6) + row(7)))
                v2 = ox * row(8) + (oy * row(9) + (oz * row(10) + row(11)))
                v3 = ox * row(12) + (oy * row(13) + (oz * row(14) + row(15)))
                m = jnp.minimum(jnp.minimum(u0, v1), jnp.minimum(v2, v3))
                acc[:] = jnp.maximum(acc[:], m)

            _visit_clusters(i, tw, tl_, tc, ct, MAX_TRI_LIST, wt, tri_body)
            occ_l = jnp.any(acc[:] >= 0.0, axis=1, keepdims=True)
            fnd[:] = fnd[:] | (occ_l.astype(jnp.int32) * bit)

            def sph_body(k):
                sk = pl.multiple_of(k * CLUSTER, CLUSTER)
                dx = lp_ref[3 * l + 0] - ox
                dy = lp_ref[3 * l + 1] - oy
                dz = lp_ref[3 * l + 2] - oz
                if relaxed:
                    hit = _sph_cluster_occluded_relaxed(
                        sph_ref, sk, ox, oy, oz, dx, dy, dz, 1.0)
                else:
                    t, ok = _sph_cluster_test(sph_ref, sk, ox, oy, oz,
                                              dx, dy, dz, n_sph)
                    hit = ok & (t < 1.0)
                fnd[:] = fnd[:] | (jnp.any(hit, axis=1,
                                           keepdims=True).astype(jnp.int32)
                                   * bit)

            def not_all_found():
                return jnp.sum((fnd[:] & bit) != 0) < TILE

            kg = not_all_found if early_exit else None

            if not dense_sph:
                @pl.when(sc[i] != 0)
                def _(l=l, sc=sc, sw=sw, sl_=sl_, bit=bit):
                    _visit_clusters(i, sw, sl_, sc, cs, MAX_SPH_LIST, ws,
                                    sph_body, keep_going=kg)
        if dense_sph:
            # ONE combined dense pass for ALL lights (round 5): the
            # light-INDEPENDENT per-pair terms (o-c and c_q = |o-c|^2 -
            # r^2, ~7 of the ~25 ops/pair/light) are computed once and
            # shared — bitwise-identical expressions to the per-light
            # form, just hoisted (Mosaic cannot CSE across the former
            # per-light pl.when regions).  Runs when ANY light has
            # sphere candidates; a candidate-free light's OR is sound
            # (no ACTIVE lane's segment crosses any sphere box, the
            # DENSE_SPH_ROWS shortlist argument; inactive lanes are
            # masked downstream).
            sc_any = sl_refs[5][i] != 0
            for l in range(1, nl):
                sc_any |= sl_refs[6 * l + 5][i] != 0

            @pl.when(sc_any)
            def _():
                dls = [(lp_ref[3 * l + 0] - ox,
                        lp_ref[3 * l + 1] - oy,
                        lp_ref[3 * l + 2] - oz) for l in range(nl)]
                als = [dx * dx + dy * dy + dz * dz for (dx, dy, dz) in dls]
                for k in range(cs):
                    sk = k * CLUSTER
                    row = lambda j: sph_ref[j, sk:sk + CLUSTER][None, :]
                    cx, cy, cz, rad = row(0), row(1), row(2), row(3)
                    ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
                    c_q = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
                    for l in range(nl):
                        dx, dy, dz = dls[l]
                        a_q = als[l]
                        b_q = 2.0 * (dx * ocx + dy * ocy + dz * ocz)
                        disc = b_q * b_q - 4.0 * a_q * c_q
                        if relaxed:
                            u = 2.0 * a_q + b_q
                            hit = ((rad > 0.0) & (disc >= 0.0)
                                   & ((b_q <= 0.0) | (c_q <= 0.0))
                                   & ((u > 0.0) | (disc > u * u)))
                        else:
                            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                            t1 = (-b_q - sq) / (2.0 * a_q)
                            # t2's divide dropped bitwise-safely (see
                            # _sph_cluster_test)
                            ok = (disc >= 0.0) \
                                & ~((t1 < 0.0) & ((sq - b_q) < 0.0)) \
                                & (rad > 0.0)
                            hit = ok & (t1 < 1.0)
                        fnd[:] = fnd[:] | (
                            jnp.any(hit, axis=1, keepdims=True)
                            .astype(jnp.int32) * jnp.int32(1 << l))
        found_out[p, :] = fnd[:, 0]

    jax.lax.fori_loop(0, TPB, subtile, 0)


@functools.partial(jax.jit,
                   static_argnames=("n_sph", "n_lights", "early_exit",
                                    "relaxed"))
def _cluster_shadow_call_ml(thits, shits, origin, planes, lps, sph_dat,
                            n_sph: int, n_lights: int,
                            early_exit: bool = True,
                            relaxed: bool = False):
    """ONE kernel launch for all n_lights shadow tests of a wavefront.
    thits/shits: per-light tuples of (hit, entry); planes: list of
    per-light (16, Pt) tables; lps: (3*n_lights,) positions.
    Returns (R,) int32 bitfield (bit l = occluded toward light l)."""
    nl = n_lights
    r = origin.shape[0]
    nt = r // TILE
    # the SMEM shortlist budget (MAX_NT is sized for ONE light's lists,
    # ~0.4 MB of ~1 MB) is shared by all n_lights copies here — shrink
    # the per-call segment accordingly
    max_nt = max(TPB, MAX_NT // nl // TPB * TPB)
    if nt > max_nt:
        outs = []
        for s in range(0, nt, max_nt):
            e = min(s + max_nt, nt)
            outs.append(_cluster_shadow_call_ml(
                tuple((th[0][s:e], th[1][s:e]) for th in thits),
                tuple((sh[0][s:e], sh[1][s:e]) for sh in shits),
                origin[s * TILE : e * TILE], planes, lps, sph_dat,
                n_sph, nl, early_exit, relaxed,
            ))
        return jnp.concatenate(outs)
    pt = planes[0].shape[1]
    ps = sph_dat.shape[1]
    ct, cs = pt // CLUSTER, ps // CLUSTER
    prefetch = []
    wt = ws = 1
    for l in range(nl):
        tw, tl_, _, tc = _compact(*thits[l], MAX_TRI_LIST)
        sw, sl_, _, sc = _compact(*shits[l], MAX_SPH_LIST)
        wt, ws = tw.shape[0] // nt, sw.shape[0] // nt
        prefetch += [tw, tl_, tc, sw, sl_, sc]
    prefetch.append(lps)
    kernel = functools.partial(
        _shadow_kernel_ml, n_sph=n_sph, ct=ct, cs=cs, wt=wt, ws=ws,
        n_lights=nl, early_exit=early_exit, relaxed=relaxed,
    )
    bundle = jnp.concatenate([origin.T, jnp.zeros((1, r), jnp.float32)])
    blk = TPB * TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6 * nl + 1,
        grid=(nt // TPB,),
        in_specs=(
            [pl.BlockSpec((4, blk), lambda i, *_: (0, i))]
            + [pl.BlockSpec((16, pt), lambda i, *_: (0, 0))] * nl
            + [pl.BlockSpec((4, ps), lambda i, *_: (0, 0))]
        ),
        out_specs=pl.BlockSpec((TPB, TILE), lambda i, *_: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((TILE, 1), jnp.int32),
            pltpu.VMEM((TILE, CLUSTER), jnp.float32),
        ],
    )
    found = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt, TILE), jnp.int32),
        interpret=_interpret(),
    )(*prefetch, bundle, *planes, sph_dat)
    return found.reshape(r)


def _small_sphere_test_multi(cset: ClusterSet, origin, lps,
                             relaxed: bool = False):
    """Dense small-sphere occlusion for ALL lights at once: (R, L) bool
    of any accepted hit with t < 1 on the segment origin -> light l.
    Shares the light-independent terms (o - c, |o - c|^2 - r^2) across
    lights; per-pair math and acceptance match _small_sphere_test /
    the kernel quadratic exactly."""
    n = cset.n_sph
    cx = cset.sph_dat[0, :n][None]
    cy = cset.sph_dat[1, :n][None]
    cz = cset.sph_dat[2, :n][None]
    rad = cset.sph_dat[3, :n][None]
    ox, oy, oz = origin[:, 0:1], origin[:, 1:2], origin[:, 2:3]
    ocx, ocy, ocz = ox - cx, oy - cy, oz - cz        # (R, n) shared
    c_q = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
    occ = []
    for l in range(lps.shape[0] // 3):
        dx = lps[3 * l + 0] - ox
        dy = lps[3 * l + 1] - oy
        dz = lps[3 * l + 2] - oz
        a_q = dx * dx + dy * dy + dz * dz
        b_q = 2.0 * (dx * ocx + dy * ocy + dz * ocz)
        disc = b_q * b_q - 4.0 * a_q * c_q
        if relaxed:  # same sign tests as _sph_cluster_occluded_relaxed
            u = 2.0 * a_q + b_q  # tmax = 1
            occ.append(jnp.any(
                (rad > 0.0) & (disc >= 0.0)
                & ((b_q <= 0.0) | (c_q <= 0.0))
                & ((u > 0.0) | (disc > u * u)), axis=1))
            continue
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t1 = (-b_q - sq) / (2.0 * a_q)
        # t2's divide dropped bitwise-safely (see _sph_cluster_test)
        ok = (disc >= 0.0) & ~((t1 < 0.0) & ((sq - b_q) < 0.0)) & (rad > 0.0)
        occ.append(jnp.any(ok & (t1 < 1.0), axis=1))
    return jnp.stack(occ, axis=1)                    # (R, L)


def cluster_shadow_multi(cset: ClusterSet, planes_list, origin, light_pos,
                         active_per_light, early_exit: bool = True,
                         relaxed: bool = False):
    """Occlusion of origin -> light segments for ALL lights in ONE
    kernel launch.  light_pos: (L, 3); active_per_light: (R, L) bool
    (per-light consumed-lanes masks — the shadow-relevance gate differs
    per light).  Returns (R, L) bool.  Bitwise-identical per light to
    cluster_shadow; the merge only shares the per-call fixed cost and
    the subtile ray relayout."""
    origin = jax.lax.stop_gradient(origin)
    planes_list = [jax.lax.stop_gradient(pl_) for pl_ in planes_list]
    lp = jax.lax.stop_gradient(
        jnp.asarray(light_pos, jnp.float32).reshape(-1))
    nl = len(planes_list)
    r0 = origin.shape[0]
    acts = [jax.lax.stop_gradient(active_per_light[:, l])
            for l in range(nl)]
    r, origin, _d, *acts = _pad_rays(origin, origin, *acts)
    ones = jnp.ones((origin.shape[0],), jnp.float32)
    thits, shits = [], []
    for l in range(nl):
        dirs_l = lp[3 * l : 3 * l + 3][None] - origin
        th, sh = _cluster_masks(cset, origin, dirs_l, acts[l], ones)
        thits.append(th)
        shits.append(sh)
    found = _segmented_shadow_ml(
        tuple(thits), tuple(shits), origin, planes_list, lp,
        cset.sph_dat, cset.n_sph, nl, early_exit, relaxed,
    )
    occ = jnp.stack([(found >> l) & 1 for l in range(nl)], axis=1) != 0
    if 0 < cset.n_sph <= SMALL_SPH:
        occ = occ | _small_sphere_test_multi(cset, origin, lp,
                                             relaxed=relaxed)
    return occ[:r0]


def cluster_shadow(cset: ClusterSet, planes, origin, dirs, light_pos,
                   active=None, early_exit: bool = True,
                   relaxed: bool = False):
    """Occlusion of segments origin -> light (t < 1) for ONE point light.

    ``dirs`` must be the unnormalized segment light_pos - origin (used for
    the conservative tile shortlists only; the kernel tests origins
    against the precomputed ``planes``).  Semantics match cluster_any on
    the same segments up to float rounding at silhouette/grazing edges.
    """
    origin = jax.lax.stop_gradient(origin)
    dirs = jax.lax.stop_gradient(dirs)
    # occlusion is discrete: zero-gradient by the fixed-hit-topology
    # convention (same as cluster_any), so the plane table — built from
    # traced light positions — must not be differentiated through
    planes = jax.lax.stop_gradient(planes)
    lp = jax.lax.stop_gradient(jnp.asarray(light_pos, jnp.float32).reshape(3))
    r, origin, dirs, active = _pad_rays(origin, dirs, active)
    ones = jnp.ones((origin.shape[0],), jnp.float32)
    thit, shit = _cluster_masks(cset, origin, dirs, active, ones)
    occ = _segmented_shadow(
        thit, shit, origin, planes, lp, cset.sph_dat, cset.n_sph,
        early_exit, relaxed,
    )
    if 0 < cset.n_sph <= SMALL_SPH:
        occ = occ | _small_sphere_occluded(cset, origin, dirs, 1.0, relaxed)
    return occ[:r]


def _cluster_masks(cset: ClusterSet, origin, dirs, active, t_hi,
                   mask_fn=None):
    """ONE mask pass over the concatenated triangle+sphere cluster boxes,
    split back into (thit, shit).

    Small-sphere scenes (n_sph <= SMALL_SPH) get an EMPTY sphere
    shortlist: callers run the dense (R, n_sph) quadratic + merge
    instead — measured FASTER than in-kernel sphere visits, because a
    small sphere cluster's box is crossed by many tiles, each paying a
    (TILE, 128) visit that is ~99% padding AND defeating the
    empty-shortlist subtile skip (tri-empty background tiles become
    non-empty; frame 92.8 -> 96.5 ms when tried in round 3).  Scenes
    with real sphere populations (marbles: 650) get ONE mask pass over
    the concatenated tri+sphere boxes instead of two."""
    if mask_fn is None:
        mask_fn = ray_cluster_mask
    ct_n = cset.tri_cmin.shape[0]
    if cset.n_sph <= SMALL_SPH:
        thit = mask_fn(origin, dirs, active, cset.tri_cmin, cset.tri_cmax,
                       t_hi, TILE)
        return thit, _empty_shit(thit[0].shape[0], cset.sph_cmin.shape[0])
    cmin = jnp.concatenate([cset.tri_cmin, cset.sph_cmin])
    cmax = jnp.concatenate([cset.tri_cmax, cset.sph_cmax])
    hit, ent = mask_fn(origin, dirs, active, cmin, cmax, t_hi, TILE)
    return (hit[:, :ct_n], ent[:, :ct_n]), (hit[:, ct_n:], ent[:, ct_n:])


def _common_dims(dirs, tri_dat, sph_dat):
    r = dirs.shape[0]
    nt = r // TILE
    pt = tri_dat.shape[1]
    ps = sph_dat.shape[1]
    return r, nt, pt, pt // CLUSTER, ps, ps // CLUSTER


@functools.partial(jax.jit,
                   static_argnames=("n_tri", "n_sph", "bfc"))
def _cluster_closest_call(thit, shit, origin, dirs, tri_dat, sph_dat,
                          n_tri: int, n_sph: int, bfc: bool = False):
    r = dirs.shape[0]
    nt = r // TILE
    if nt > MAX_NT:
        bts, bss = [], []
        for s in range(0, nt, MAX_NT):
            e = min(s + MAX_NT, nt)
            bt, bs = _cluster_closest_call(
                (thit[0][s:e], thit[1][s:e]), (shit[0][s:e], shit[1][s:e]),
                origin[s * TILE : e * TILE], dirs[s * TILE : e * TILE],
                tri_dat, sph_dat, n_tri, n_sph, bfc,
            )
            bts.append(bt); bss.append(bs)
        return jnp.concatenate(bts), jnp.concatenate(bss)
    r, nt, pt, ct, ps, cs = _common_dims(dirs, tri_dat, sph_dat)
    tw, tl, _, tc = _compact(*thit, MAX_TRI_LIST)
    sw, sl, _, sc = _compact(*shit, MAX_SPH_LIST)
    wt, ws = tw.shape[0] // nt, sw.shape[0] // nt
    kernel = functools.partial(
        _closest_kernel, n_tri=n_tri, n_sph=n_sph, ct=ct, cs=cs, pt=pt,
        wt=wt, ws=ws, bfc=bfc,
    )
    bundle = jnp.concatenate([
        origin.T, jnp.zeros((1, r), jnp.float32),
        dirs.T, jnp.zeros((1, r), jnp.float32),
    ])  # (8, R): one fused per-subtile relayout in-kernel
    blk = TPB * TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(nt // TPB,),
        in_specs=[
            pl.BlockSpec((8, blk), lambda i, *_: (0, i)),
            pl.BlockSpec((12, pt), lambda i, *_: (0, 0)),
            pl.BlockSpec((4, ps), lambda i, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TPB, TILE), lambda i, *_: (i, 0)),
            pl.BlockSpec((TPB, TILE), lambda i, *_: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE, CLUSTER), jnp.float32),
            pltpu.VMEM((TILE, CLUSTER), jnp.int32),
        ],
    )
    bt, bs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nt, TILE), jnp.float32),
            jax.ShapeDtypeStruct((nt, TILE), jnp.int32),
        ],
        interpret=_interpret(),
    )(tw, tl, tc, sw, sl, sc, bundle, tri_dat, sph_dat)
    return bt.reshape(r), bs.reshape(r)


@functools.partial(jax.jit,
                   static_argnames=("n_tri", "n_sph", "bfc"))
def _cluster_closest_call_shared(thit, shit, org, dirs, tri_dat, sph_dat,
                                 n_tri: int, n_sph: int, bfc: bool = False):
    """Shared-origin (eye) variant: org is the single (3,) origin, the
    bundle carries directions only."""
    r = dirs.shape[0]
    nt = r // TILE
    if nt > MAX_NT:
        bts, bss = [], []
        for s in range(0, nt, MAX_NT):
            e = min(s + MAX_NT, nt)
            bt, bs = _cluster_closest_call_shared(
                (thit[0][s:e], thit[1][s:e]), (shit[0][s:e], shit[1][s:e]),
                org, dirs[s * TILE : e * TILE], tri_dat, sph_dat,
                n_tri, n_sph, bfc,
            )
            bts.append(bt); bss.append(bs)
        return jnp.concatenate(bts), jnp.concatenate(bss)
    r, nt, pt, ct, ps, cs = _common_dims(dirs, tri_dat, sph_dat)
    tw, tl, _, tc = _compact(*thit, MAX_TRI_LIST)
    sw, sl, _, sc = _compact(*shit, MAX_SPH_LIST)
    wt, ws = tw.shape[0] // nt, sw.shape[0] // nt
    kernel = functools.partial(
        _closest_kernel, n_tri=n_tri, n_sph=n_sph, ct=ct, cs=cs, pt=pt,
        wt=wt, ws=ws, bfc=bfc, shared_origin=True,
    )
    bundle = jnp.concatenate([dirs.T, jnp.zeros((1, r), jnp.float32)])
    blk = TPB * TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(nt // TPB,),
        in_specs=[
            pl.BlockSpec((4, blk), lambda i, *_: (0, i)),
            pl.BlockSpec((12, pt), lambda i, *_: (0, 0)),
            pl.BlockSpec((4, ps), lambda i, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TPB, TILE), lambda i, *_: (i, 0)),
            pl.BlockSpec((TPB, TILE), lambda i, *_: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE, CLUSTER), jnp.float32),
            pltpu.VMEM((TILE, CLUSTER), jnp.int32),
        ],
    )
    bt, bs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nt, TILE), jnp.float32),
            jax.ShapeDtypeStruct((nt, TILE), jnp.int32),
        ],
        interpret=_interpret(),
    )(tw, tl, tc, sw, sl, sc, org, bundle, tri_dat, sph_dat)
    return bt.reshape(r), bs.reshape(r)


@functools.partial(jax.jit,
                   static_argnames=("n_tri", "n_sph", "bfc", "relaxed"))
def _cluster_any_call(thit, shit, origin, dirs, t_max, tri_dat, sph_dat,
                      n_tri: int, n_sph: int, bfc: bool = False,
                      relaxed: bool = False):
    r = dirs.shape[0]
    nt = r // TILE
    if nt > MAX_NT:
        outs = []
        for s in range(0, nt, MAX_NT):
            e = min(s + MAX_NT, nt)
            outs.append(_cluster_any_call(
                (thit[0][s:e], thit[1][s:e]), (shit[0][s:e], shit[1][s:e]),
                origin[s * TILE : e * TILE], dirs[s * TILE : e * TILE],
                t_max[s * TILE : e * TILE], tri_dat, sph_dat, n_tri, n_sph,
                bfc, relaxed,
            ))
        return jnp.concatenate(outs)
    r, nt, pt, ct, ps, cs = _common_dims(dirs, tri_dat, sph_dat)
    tw, tl, _, tc = _compact(*thit, MAX_TRI_LIST)
    sw, sl, _, sc = _compact(*shit, MAX_SPH_LIST)
    wt, ws = tw.shape[0] // nt, sw.shape[0] // nt
    kernel = functools.partial(
        _any_kernel, n_tri=n_tri, n_sph=n_sph, ct=ct, cs=cs, pt=pt,
        wt=wt, ws=ws, bfc=bfc, relaxed=relaxed,
    )
    bundle = jnp.concatenate([
        origin.T, t_max.reshape(1, r),
        dirs.T, jnp.zeros((1, r), jnp.float32),
    ])  # (8, R)
    blk = TPB * TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(nt // TPB,),
        in_specs=[
            pl.BlockSpec((8, blk), lambda i, *_: (0, i)),
            pl.BlockSpec((12, pt), lambda i, *_: (0, 0)),
            pl.BlockSpec((4, ps), lambda i, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TPB, TILE), lambda i, *_: (i, 0)),
        scratch_shapes=[pltpu.VMEM((TILE, 1), jnp.int32)],
    )
    found = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt, TILE), jnp.int32),
        interpret=_interpret(),
    )(tw, tl, tc, sw, sl, sc, bundle, tri_dat, sph_dat)
    return found.reshape(r) != 0


# ---------------------------------------------------------------------------
# Public engine entry points
# ---------------------------------------------------------------------------

def _slot_to_prim(cset: ClusterSet, slot):
    pt = cset.tri_dat.shape[1]
    is_tri = slot < pt
    tri_id = cset.tri_slot[jnp.clip(slot, 0, pt - 1)]
    ps = cset.sph_dat.shape[1]
    sph_id = cset.sph_slot[jnp.clip(slot - pt, 0, ps - 1)]
    prim = jnp.where(is_tri, tri_id, sph_id)
    return jnp.where(slot < 0, MISS, prim)


def _pad_rays(origin, dirs, *extras):
    """Pad the ray axis to a multiple of TILE*TPB (kernel program block).
    Extra per-ray arrays are padded with zeros. Returns (r, padded...)."""
    r = dirs.shape[0]
    pad = (-r) % (TILE * TPB)
    if pad == 0:
        return (r, origin, dirs) + extras
    origin = jnp.concatenate([origin, jnp.broadcast_to(origin[-1:], (pad, 3))], 0)
    dirs = jnp.concatenate([dirs, jnp.broadcast_to(dirs[-1:], (pad, 3))], 0)
    out = []
    for e in extras:
        if e is None:
            out.append(None)
        else:
            z = jnp.zeros((pad,) + e.shape[1:], e.dtype)
            out.append(jnp.concatenate([e, z], 0))
    return (r, origin, dirs) + tuple(out)



# When a scene has only a handful of spheres (horse_and_mug: 2,
# cornellbox: 2 — only marbles has many), a full (TILE x 128) sphere
# cluster visit per tile is ~99% padding AND defeats the empty-shortlist
# subtile skip, so the sphere test runs as dense jnp over ALL rays
# instead (R x n_sph pairs; in-kernel visits re-measured SLOWER in
# round 3 even with exact masks: frame 92.8 -> 96.5 ms).  The kernel
# sees an empty sphere shortlist and results merge under the kernel's
# exact rules (spheres after triangles, strict-< updates, first slot
# wins ties).  Bitwise-identical math.
SMALL_SPH = 8


def _small_sphere_test(cset: ClusterSet, origin, dirs):
    """(t, ok) of shape (R, n_sph) via the same quadratic as the kernel."""
    n = cset.n_sph
    cx = cset.sph_dat[0, :n][None]
    cy = cset.sph_dat[1, :n][None]
    cz = cset.sph_dat[2, :n][None]
    rad = cset.sph_dat[3, :n][None]
    ox, oy, oz = origin[:, 0:1], origin[:, 1:2], origin[:, 2:3]
    dx, dy, dz = dirs[:, 0:1], dirs[:, 1:2], dirs[:, 2:3]
    ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
    a_q = dx * dx + dy * dy + dz * dz
    b_q = 2.0 * (dx * ocx + dy * ocy + dz * ocz)
    c_q = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
    disc = b_q * b_q - 4.0 * a_q * c_q
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b_q - sq) / (2.0 * a_q)
    # t2's divide dropped bitwise-safely (see _sph_cluster_test)
    ok = (disc >= 0.0) & ~((t1 < 0.0) & ((sq - b_q) < 0.0)) & (rad > 0.0)
    return t1, ok


def _small_sphere_occluded(cset: ClusterSet, origin, dirs, t_max, relaxed):
    """Dense (R, n_sph) sphere occlusion: root form by default, the
    sqrt/div-free sign tests under --relaxed-parity (see
    _sph_cluster_occluded_relaxed; same acceptance algebra)."""
    if not relaxed:
        t_s, ok = _small_sphere_test(cset, origin, dirs)
        return jnp.any(ok & (t_s < t_max), axis=1)
    n = cset.n_sph
    cx = cset.sph_dat[0, :n][None]
    cy = cset.sph_dat[1, :n][None]
    cz = cset.sph_dat[2, :n][None]
    rad = cset.sph_dat[3, :n][None]
    ox, oy, oz = origin[:, 0:1], origin[:, 1:2], origin[:, 2:3]
    dx, dy, dz = dirs[:, 0:1], dirs[:, 1:2], dirs[:, 2:3]
    ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
    a_q = dx * dx + dy * dy + dz * dz
    b_q = 2.0 * (dx * ocx + dy * ocy + dz * ocz)
    c_q = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
    disc = b_q * b_q - 4.0 * a_q * c_q
    u = 2.0 * a_q * t_max + b_q
    return jnp.any((rad > 0.0) & (disc >= 0.0)
                   & ((b_q <= 0.0) | (c_q <= 0.0))
                   & ((u > 0.0) | (disc > u * u)), axis=1)


def _empty_shit(nt: int, cs: int):
    return (jnp.zeros((nt, cs), bool), jnp.full((nt, cs), jnp.inf))


def _merge_small_spheres(cset: ClusterSet, origin, dirs, t_k, slot_k):
    """Merge kernel (t, slot) with the dense small-sphere test, matching
    the in-kernel rule: strict < so triangles keep exact-t ties, and the
    lowest sphere slot wins sphere-sphere ties (argmin -> first min)."""
    t_s, ok = _small_sphere_test(cset, origin, dirs)
    t_s = jnp.where(ok, t_s, jnp.inf)
    j = jnp.argmin(t_s, axis=1)
    # the winning value IS the min — a take_along_axis gather here
    # measured 16 ms/1M rays (XLA TPU row gather), the min is free
    tj = jnp.min(t_s, axis=1)
    t_kv = jnp.where(slot_k >= 0, t_k, jnp.inf)
    upd = tj < t_kv
    pt = cset.tri_dat.shape[1]
    slot = jnp.where(upd, pt + j.astype(jnp.int32), slot_k)
    return jnp.where(upd, tj, t_k), slot


# The visit kernels keep tri_dat fully VMEM-resident (BlockSpec (12, Pt)
# whole-array): at 12 floats/slot that is 6 MB per 128k slots against
# ~16 MB of VMEM/core.  Scenes beyond SEG_SLOTS triangle slots run the
# kernel once per 128k-slot CLUSTER-AXIS SEGMENT (shortlist columns
# sliced per segment, results min-merged), so scene size is bounded by
# HBM, not VMEM.  Round 5 extends the same segmentation to the SPHERE
# axis (sphere tables beyond SEG_SLOTS slots previously rode whole into
# every kernel: a (4, 1M) block crashed the remote compiler; 1M-sphere
# scenes now render).  Tie semantics across segments: strict-< keeps
# the EARLIER segment's winner (ascending cluster id); all tri segments
# merge BEFORE all sphere segments so a tri always keeps an exact-t tie
# against a sphere — the same rule as the single-pass kernel except for
# exact float ties between primitives in different segments where the
# in-kernel front-to-back visit order could have picked differently (no
# bundled scene is segmented; the regime has no reference golden).
# Assumes the default non-treelet cluster build (valid slots form a
# prefix, so a segment's real-slot count is clip(n_valid - s0, 0, w)).
SEG_SLOTS = 128 * 1024


def _remap_seg_slot(slot, s0: int, w: int, pt: int, sph_s0: int = 0):
    """Segment-local kernel slot -> global slot space ([0, pt) tris,
    [pt, pt+ps) spheres); ``sph_s0`` offsets sphere-segment slots."""
    return jnp.where(
        slot < 0, MISS,
        jnp.where(slot < w, slot + s0, slot - w + pt + sph_s0))


def _seg_ranges(p: int):
    return [(s, min(s + SEG_SLOTS, p)) for s in range(0, p, SEG_SLOTS)]


_MIN_PAD = CLUSTER  # minimal placeholder table width (one cluster row)


def _segmented_closest(call, thit, shit, org, dirs, tri_dat, sph_dat,
                       n_tri: int, n_sph: int, bfc: bool):
    pt = tri_dat.shape[1]
    ps = sph_dat.shape[1]
    if pt <= SEG_SLOTS and ps <= SEG_SLOTS:
        return call(thit, shit, org, dirs, tri_dat, sph_dat, n_tri, n_sph,
                    bfc)
    nt = thit[0].shape[0]
    cs = shit[0].shape[1]
    tsegs = _seg_ranges(pt)
    ssegs = _seg_ranges(ps)
    # placeholder tables/shortlists for the axis a call does not visit
    empty_sh = _empty_shit(nt, cs)
    sph_min = sph_dat[:, :_MIN_PAD]
    best_t = best_slot = None

    def merge(t, slot):
        nonlocal best_t, best_slot
        if best_slot is None:
            best_t, best_slot = t, slot
        else:
            tv_new = jnp.where(slot >= 0, t, jnp.inf)
            tv_best = jnp.where(best_slot >= 0, best_t, jnp.inf)
            upd = tv_new < tv_best
            best_t = jnp.where(upd, t, best_t)
            best_slot = jnp.where(upd, slot, best_slot)

    for si, (s0, s1) in enumerate(tsegs):
        # spheres ride the last tri segment only when they fit one call
        with_sph = (si == len(tsegs) - 1) and len(ssegs) == 1
        th = (thit[0][:, s0 // CLUSTER: s1 // CLUSTER],
              thit[1][:, s0 // CLUSTER: s1 // CLUSTER])
        t, slot = call(th, shit if with_sph else empty_sh, org, dirs,
                       tri_dat[:, s0:s1],
                       sph_dat if with_sph else sph_min,
                       int(np.clip(n_tri - s0, 0, s1 - s0)),
                       n_sph if with_sph else 0, bfc)
        merge(t, _remap_seg_slot(slot, s0, s1 - s0, pt))
    if len(ssegs) > 1:
        t0, t1 = tsegs[-1]
        tri_min = tri_dat[:, t0:t0 + _MIN_PAD]
        empty_th = _empty_shit(nt, _MIN_PAD // CLUSTER)
        for (s0, s1) in ssegs:
            sh = (shit[0][:, s0 // CLUSTER: s1 // CLUSTER],
                  shit[1][:, s0 // CLUSTER: s1 // CLUSTER])
            t, slot = call(empty_th, sh, org, dirs, tri_min,
                           sph_dat[:, s0:s1], 0,
                           int(np.clip(n_sph - s0, 0, s1 - s0)), bfc)
            merge(t, _remap_seg_slot(slot, 0, _MIN_PAD, pt, sph_s0=s0))
    return best_t, best_slot


def _segmented_any(thit, shit, origin, dirs, t_max_col, tri_dat, sph_dat,
                   n_tri: int, n_sph: int, bfc: bool,
                   relaxed: bool = False):
    pt = tri_dat.shape[1]
    ps = sph_dat.shape[1]
    if pt <= SEG_SLOTS and ps <= SEG_SLOTS:
        return _cluster_any_call(thit, shit, origin, dirs, t_max_col,
                                 tri_dat, sph_dat, n_tri, n_sph, bfc,
                                 relaxed)
    nt = thit[0].shape[0]
    cs = shit[0].shape[1]
    tsegs = _seg_ranges(pt)
    ssegs = _seg_ranges(ps)
    empty_sh = _empty_shit(nt, cs)
    sph_min = sph_dat[:, :_MIN_PAD]
    occ = None
    for si, (s0, s1) in enumerate(tsegs):
        with_sph = (si == len(tsegs) - 1) and len(ssegs) == 1
        th = (thit[0][:, s0 // CLUSTER: s1 // CLUSTER],
              thit[1][:, s0 // CLUSTER: s1 // CLUSTER])
        o = _cluster_any_call(th, shit if with_sph else empty_sh, origin,
                              dirs, t_max_col, tri_dat[:, s0:s1],
                              sph_dat if with_sph else sph_min,
                              int(np.clip(n_tri - s0, 0, s1 - s0)),
                              n_sph if with_sph else 0, bfc, relaxed)
        occ = o if occ is None else (occ | o)
    if len(ssegs) > 1:
        t0, _ = tsegs[-1]
        tri_min = tri_dat[:, t0:t0 + _MIN_PAD]
        empty_th = _empty_shit(nt, _MIN_PAD // CLUSTER)
        for (s0, s1) in ssegs:
            sh = (shit[0][:, s0 // CLUSTER: s1 // CLUSTER],
                  shit[1][:, s0 // CLUSTER: s1 // CLUSTER])
            o = _cluster_any_call(empty_th, sh, origin, dirs, t_max_col,
                                  tri_min, sph_dat[:, s0:s1], 0,
                                  int(np.clip(n_sph - s0, 0, s1 - s0)),
                                  bfc, relaxed)
            occ = o if occ is None else (occ | o)
    return occ


def _segmented_shadow(thit, shit, origin, planes, lp, sph_dat,
                      n_sph: int, early_exit: bool, relaxed: bool):
    """Sphere-axis segmentation of the plane-kernel shadow call (round
    5): occlusion ORs are order-free, so each 128k-slot sphere segment
    runs its own call (shortlist columns sliced); the tri planes +
    shortlists ride segment 0 only (later segments see a minimal
    placeholder plane table + empty tri lists)."""
    ps = sph_dat.shape[1]
    if ps <= SEG_SLOTS:
        return _cluster_shadow_call(thit, shit, origin, planes, lp,
                                    sph_dat, n_sph, early_exit, relaxed)
    nt = thit[0].shape[0]
    empty_th = _empty_shit(nt, _MIN_PAD // CLUSTER)
    planes_min = planes[:, :_MIN_PAD]
    occ = None
    for si, (s0, s1) in enumerate(_seg_ranges(ps)):
        sh = (shit[0][:, s0 // CLUSTER: s1 // CLUSTER],
              shit[1][:, s0 // CLUSTER: s1 // CLUSTER])
        o = _cluster_shadow_call(
            thit if si == 0 else empty_th, sh, origin,
            planes if si == 0 else planes_min, lp, sph_dat[:, s0:s1],
            int(np.clip(n_sph - s0, 0, s1 - s0)), early_exit, relaxed)
        occ = o if occ is None else (occ | o)
    return occ


def _segmented_shadow_ml(thits, shits, origin, planes_list, lp, sph_dat,
                         n_sph: int, n_lights: int, early_exit: bool,
                         relaxed: bool):
    """Multi-light variant of _segmented_shadow: per-light occlusion
    bitfields OR across sphere segments."""
    ps = sph_dat.shape[1]
    if ps <= SEG_SLOTS:
        return _cluster_shadow_call_ml(thits, shits, origin, planes_list,
                                       lp, sph_dat, n_sph, n_lights,
                                       early_exit, relaxed)
    nt = thits[0][0].shape[0]
    empty_th = _empty_shit(nt, _MIN_PAD // CLUSTER)
    planes_min = [p[:, :_MIN_PAD] for p in planes_list]
    found = None
    for si, (s0, s1) in enumerate(_seg_ranges(ps)):
        shs = tuple((sh[0][:, s0 // CLUSTER: s1 // CLUSTER],
                     sh[1][:, s0 // CLUSTER: s1 // CLUSTER])
                    for sh in shits)
        ths = thits if si == 0 else tuple(empty_th for _ in thits)
        f = _cluster_shadow_call_ml(
            ths, shs, origin, planes_list if si == 0 else planes_min,
            lp, sph_dat[:, s0:s1],
            int(np.clip(n_sph - s0, 0, s1 - s0)), n_lights,
            early_exit, relaxed)
        found = f if found is None else (found | f)
    return found


def cluster_closest(data: SceneData, cset: ClusterSet, origin, dirs,
                    active=None, bfc: bool = False):
    """Closest hit over the tiled wavefront. Returns global prim ids (R,)."""
    del data  # geometry lives in cset
    origin = jax.lax.stop_gradient(jnp.broadcast_to(origin, dirs.shape))
    dirs = jax.lax.stop_gradient(dirs)
    r, origin, dirs, active = _pad_rays(origin, dirs, active)
    thit, shit = _cluster_masks(cset, origin, dirs, active, None)
    t, slot = _segmented_closest(
        _cluster_closest_call, thit, shit, origin, dirs,
        cset.tri_dat, cset.sph_dat, cset.n_tri, cset.n_sph, bfc,
    )
    if 0 < cset.n_sph <= SMALL_SPH:
        _, slot = _merge_small_spheres(cset, origin, dirs, t, slot)
    return _slot_to_prim(cset, slot)[:r]


def cluster_closest_hit(cset: ClusterSet, origin, dirs, shadow_eps: float,
                        active=None, bfc: bool = False,
                        shared_origin: bool = False,
                        with_slot: bool = False):
    """Closest hit WITH shading info, via the kernel's (t, slot) and the
    per-slot tables — the fast forward path (no per-primitive re-derive).

    ``shared_origin`` (origin given as a single (3,) point — eye
    wavefronts) runs the specialized kernel whose origin-dependent terms
    are hoisted to per-primitive rows; results are bitwise-identical math
    evaluated with scalar broadcasting.
    Returns (hit, t, normal, mat, point, offset, prim).  With
    ``with_slot`` the kernel SLOT index (-1 on miss) is appended — the
    slot order is the cluster layout's spatial preorder, which makes it
    the surface-locality sort key for secondary wavefronts.
    Non-differentiable (kernel t is the authority); training uses
    ops.shade.refine_hit.
    """
    shared = shared_origin and jnp.ndim(origin) == 1
    if shared:
        org1 = jax.lax.stop_gradient(
            jnp.asarray(origin, jnp.float32).reshape(3)
        )
    origin = jax.lax.stop_gradient(jnp.broadcast_to(origin, dirs.shape))
    dirs = jax.lax.stop_gradient(dirs)
    r, origin, dirs, active = _pad_rays(origin, dirs, active)
    # shared-origin eye tiles are coherent frusta where the interval mask
    # is already near-tight; the exact per-ray mask pays ~25 ops/pair for
    # no visit savings there (divergent secondary waves are where it wins
    # 2.7-7x — exp_exact_mask.py)
    mask_fn = tile_cluster_mask if shared else ray_cluster_mask
    thit, shit = _cluster_masks(cset, origin, dirs, active, None,
                                mask_fn=mask_fn)
    if shared:
        t, slot = _segmented_closest(
            _cluster_closest_call_shared, thit, shit, org1, dirs,
            cset.tri_dat, cset.sph_dat, cset.n_tri, cset.n_sph, bfc,
        )
    else:
        t, slot = _segmented_closest(
            _cluster_closest_call, thit, shit, origin, dirs,
            cset.tri_dat, cset.sph_dat, cset.n_tri, cset.n_sph, bfc,
        )
    if 0 < cset.n_sph <= SMALL_SPH:
        t, slot = _merge_small_spheres(cset, origin, dirs, t, slot)
    t, slot = t[:r], slot[:r]
    origin, dirs = origin[:r], dirs[:r]
    hit = slot >= 0
    sslot = jnp.where(hit, slot, 0)
    pt = cset.tri_dat.shape[1]
    pack = cset.slot_pack[sslot]        # ONE (R, 8) gather
    aux = pack[:, 0:3]                  # tri: unit normal; sph: center
    rad = pack[:, 3]
    mat = jnp.where(hit, pack[:, 4].astype(jnp.int32), 0)
    t = jnp.where(hit, t, 1.0)
    point = origin + t[:, None] * dirs
    is_tri = sslot < pt
    sph_lane = hit & ~is_tri
    safe_rad = jnp.where(sph_lane, jnp.maximum(rad, 1e-30), 1.0)
    n_raw = jnp.where(
        sph_lane[:, None], (point - aux) / safe_rad[:, None],
        jnp.array([0.0, 0.0, 1.0]),
    )
    n_sphere = n_raw / jnp.linalg.norm(n_raw, axis=-1, keepdims=True)
    normal = jnp.where(sph_lane[:, None], n_sphere, aux)
    normal = jnp.where(hit[:, None], normal, jnp.array([0.0, 0.0, 1.0]))
    offset = point + normal * jnp.float32(shadow_eps)
    prim = jnp.where(hit, pack[:, 5].astype(jnp.int32), MISS)
    if with_slot:
        return hit, t, normal, mat, point, offset, prim, slot
    return hit, t, normal, mat, point, offset, prim


def cluster_any(data: SceneData, cset: ClusterSet, origin, dirs, t_max,
                active=None, bfc: bool = False, relaxed: bool = False):
    """Shadow any-hit: True where some accepted hit has t < t_max."""
    del data
    origin = jax.lax.stop_gradient(jnp.broadcast_to(origin, dirs.shape))
    dirs = jax.lax.stop_gradient(dirs)
    t_max = jax.lax.stop_gradient(t_max)
    r, origin, dirs, active, t_max = _pad_rays(origin, dirs, active, t_max)
    thit, shit = _cluster_masks(cset, origin, dirs, active, t_max)
    occ = _segmented_any(
        thit, shit, origin, dirs, t_max[:, None],
        cset.tri_dat, cset.sph_dat, cset.n_tri, cset.n_sph, bfc, relaxed,
    )
    if 0 < cset.n_sph <= SMALL_SPH:
        occ = occ | _small_sphere_occluded(cset, origin, dirs,
                                           t_max[:, None], relaxed)
    return occ[:r]
