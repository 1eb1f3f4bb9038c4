"""The Whitted integrator as a bounded-depth wavefront loop.

The reference recurses per pixel (rayTrace, raytracer.cpp:385-452); recursion
is hostile to XLA, so the integrator here carries the whole flattened ray
wavefront through max_recursion_depth+1 lockstep bounce iterations with a
running throughput (the product of mirror tints along the path):

    color     += throughput ⊙ local(bounce d)
    throughput ⊙= mat.mirror            (mirror hits only)
    ray        = reflection ray          (others go inactive)

Reference behaviors reproduced: background color only for a depth-0 miss,
black for deeper misses (:442-449); ambient re-added at every bounce (:394);
a bounce at depth > max_recursion_depth contributes nothing (:387-389).
The reference's per-level clamp(color, 0, inf) (:451) is a no-op for the
non-negative XML inputs the format allows, so the order-sensitive nesting
collapses to this throughput form exactly.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.models.bvh import BVH
from raytracer_tpu.models.scene import Camera, SceneData, SceneMeta
from raytracer_tpu.ops import traverse
from raytracer_tpu.ops.camera import eye_rays
from raytracer_tpu.ops.shade import refine_hit, reflection_rays, shade_local

# First bounce depth at which the wavefront carry MAY be compacted
# (stably sorted by activity so live lanes form a dense prefix).
# Deep-recursion scenes (marbles: 23% of rays still bouncing at depth 6,
# survivors SCATTERED across tiles) otherwise pay near-full tile prices
# on every wave; compaction lets the trailing all-inactive tiles hit the
# kernels' scalar-prefetch skip paths and the all-lanes-occluded early
# exits.  Validated on marbles' bounce-3 2-light shadow wave: 50.6 ->
# 28.4 ms for a 5.2 ms sort (experiments/exp_marbles_compact.py);
# occlusion verified permutation-covariant.
#
# Whether to sort is decided AT RUNTIME per bounce (lax.cond on a
# scatter statistic): the round-4 integrated A/B
# (experiments/exp_compact_integrated.py) measured that an
# unconditional per-bounce sort wins only on marbles (472 -> 372 ms)
# and LOSES on every coherent deep scene (mirror_spheres 62 -> 97,
# car 213 -> 259, monkey 62 -> 91 ms): when survivors are already
# pixel-clustered, the sort costs more than the skipped tiles save AND
# mixing distant pixels into one tile loosens the shortlists.  The
# discriminator is live-tile fraction minus active-lane fraction —
# large iff live lanes are SCATTERED (many tiles kept alive by few
# lanes); compaction fires only above _COMPACT_SCATTER.  Round-2's
# "sorted wavefronts lose" verdict is the coherent-scene side of this
# statistic, now enforced at runtime instead of by a global off-switch.
#
# Parity note: re-tiling changes which rays share a tile and therefore
# the shortlist visit order; per-ray results are identical for every
# pair that is not an EXACT cross-cluster float-t tie (a masked-out
# cluster contributes nothing, an extra conservative visit cannot beat
# the true minimum).  Exact ties could in principle resolve to the
# other of two equally-near primitives — the same tie class already
# documented for engine-vs-engine comparisons (test_cluster).  Pinned
# bitwise on every bundled scene at 64x64 AND by the full-res 28/28
# reference re-certification; not a theorem.
_COMPACT_FROM = 2
_COMPACT_MIN_DEPTH = 3
_COMPACT_SCATTER = 0.15


def _compact_carry(carry):
    """Stably sort the bounce carry by activity: live lanes first.

    One 14-operand lax.sort (~3.3 ms/M rays) serves the bounce's closest
    AND shadow calls.  The active mask is recovered from the sorted key;
    ``idx`` records the permutation so the accumulated color can be
    restored to ray order after the loop (a second small sort — scatters
    on (R, k) arrays cost up to 43 ms on TPU, sorts don't).
    """
    depth, color, throughput, active, org, dirs, idx = carry
    key = (~active).astype(jnp.int32)
    (skey, idx, c0, c1, c2, t0, t1, t2, o0, o1, o2, d0, d1, d2) = jax.lax.sort(
        (key, idx,
         color[:, 0], color[:, 1], color[:, 2],
         throughput[:, 0], throughput[:, 1], throughput[:, 2],
         org[:, 0], org[:, 1], org[:, 2],
         dirs[:, 0], dirs[:, 1], dirs[:, 2]),
        is_stable=True, num_keys=1)
    return (depth,
            jnp.stack([c0, c1, c2], 1),
            jnp.stack([t0, t1, t2], 1),
            skey == 0,
            jnp.stack([o0, o1, o2], 1),
            jnp.stack([d0, d1, d2], 1),
            idx)


def _uncompact_color(color, idx):
    """Restore accumulated radiance to original ray order (sort by idx)."""
    _, c0, c1, c2 = jax.lax.sort(
        (idx, color[:, 0], color[:, 1], color[:, 2]), num_keys=1)
    return jnp.stack([c0, c1, c2], 1)


def render_rays(
    data: SceneData,
    meta: SceneMeta,
    origin,
    dirs,
    bvh=None,
    engine: str = "brute",
    differentiable: bool = False,
    bfc: bool = False,
    relaxed: bool = False,
    compact_mode: str = "auto",
):
    """Trace a wavefront of rays to radiance.

    Args:
      origin: (3,) or (R, 3) ray origins (eye position for primary rays).
      dirs:   (R, 3) ray directions (unnormalized is fine — and is what the
              camera produces, matching the reference's t-unit convention).
      differentiable: when True, hit attributes are re-derived from scene
        parameters (ops.shade.refine_hit) so gradients flow; when False
        the cluster engine's fast kernel-side hit info is used directly.
      bfc: cull backfacing triangles (TA outputs/ semantics; the
        reference code never culls — see ops.intersect.tri_intersect).
      relaxed: --relaxed-parity mode (cluster engine only): sphere
        occlusion via sqrt/div-free sign tests — algebraically identical
        acceptance, but grazing/tangent pairs can flip under f32
        rounding (ops.cluster_trace._sph_cluster_occluded_relaxed).
        Default off: bitwise-unchanged output.
      compact_mode: "auto" (default) gates per-bounce activity
        compaction off below max_depth _COMPACT_MIN_DEPTH; "deep" keeps
        the runtime scatter gate but drops the depth gate — for waves
        known to be scattered by construction (adaptive refinement
        blocks are the divergent edge tiles; VERDICT round-4 item 5).
    Returns:
      (R, 3) float32 radiance (pre-quantization).
    """
    r = dirs.shape[0]
    origin0 = jnp.asarray(origin, jnp.float32)
    eye_shared = origin0.ndim == 1  # single eye point for the whole wavefront
    origin = jnp.broadcast_to(origin0, dirs.shape)
    dirs = jnp.asarray(dirs, jnp.float32)

    fast_hits = engine == "cluster" and not differentiable

    # The cluster engine's shadow path: per-light fixed-endpoint plane
    # kernel (ops.cluster_trace.build_shadow_planes) instead of the
    # generic segment any-hit — ~2.4x fewer VPU ops on the frame's
    # dominant phase.  Tables are built ONCE per render (outside the
    # bounce loop) from traced light positions; oversized scenes fall
    # back to the generic kernel (tables must be VMEM-resident).
    shadow_fn = None
    shadow_multi_fn = None
    if engine == "cluster" and meta.n_lights > 0:
        from raytracer_tpu.ops.cluster_trace import (
            SHADOW_PLANES_BYTES_MAX, build_shadow_planes, cluster_shadow,
            cluster_shadow_multi,
        )

        if bvh.tri_verts.shape[1] * 64 <= SHADOW_PLANES_BYTES_MAX:
            lp_all = data.light_pos
            planes = [
                build_shadow_planes(bvh, lp_all[l], bfc=bfc)
                for l in range(meta.n_lights)
            ]

            def shadow_fn(org, sdir, mask, l):
                return cluster_shadow(bvh, planes[l], org, sdir, lp_all[l],
                                      active=mask, relaxed=relaxed)

            # multi-light scenes: all lights' occlusions in ONE kernel
            # launch per bounce (shared grid walk + ray relayout; every
            # plane table must fit VMEM together)
            if (meta.n_lights >= 2 and meta.n_lights
                    * bvh.tri_verts.shape[1] * 64 <= SHADOW_PLANES_BYTES_MAX):
                def shadow_multi_fn(org, masks):
                    return cluster_shadow_multi(
                        bvh, planes, org, lp_all[: meta.n_lights], masks,
                        relaxed=relaxed)

    # per-bounce active-lane compaction for deep scattered wavefronts
    # (see _compact_carry; fires at runtime only when the wave measures
    # scattered).  Gated off for shallow scenes (horse_and_mug:
    # max_depth 2, coherent bounces — measured loss), the differentiable
    # path (scan carries would double sort count under AD for no forward
    # win), and non-TILE-multiple wavefronts (tile stats undefined).
    compact = (fast_hits and not differentiable
               and (meta.max_depth >= _COMPACT_MIN_DEPTH
                    or compact_mode == "deep"))
    if compact:
        from raytracer_tpu.ops.cluster_trace import TILE as _TILE

        compact = r % _TILE == 0

    def bounce(carry, shared_eye: bool = False):
        if compact:
            from raytracer_tpu.ops.cluster_trace import TILE

            act = carry[3]
            act_f = jnp.mean(act.astype(jnp.float32))
            live_f = jnp.mean(
                act.reshape(-1, TILE).any(1).astype(jnp.float32))
            scattered = live_f - act_f > _COMPACT_SCATTER
            carry = jax.lax.cond(
                (carry[0] >= _COMPACT_FROM) & scattered,
                _compact_carry, lambda c: c, carry)
        depth, color, throughput, active, cur_org, cur_dir, idx = carry
        if fast_hits:
            from raytracer_tpu.ops.cluster_trace import cluster_closest_hit
            from raytracer_tpu.ops.shade import Hit

            fhit, t, normal, mat, point, offset, prim = cluster_closest_hit(
                bvh, origin0 if shared_eye else cur_org, cur_dir,
                meta.shadow_eps, active=active, bfc=bfc,
                shared_origin=shared_eye,
            )
            fhit = fhit & active
            h = Hit(hit=fhit, t=t, normal=normal, mat=mat, point=point,
                    offset=offset)
            prim = jnp.where(active, prim, traverse.MISS)
        else:
            prim = traverse.closest_hit(
                data, cur_org, cur_dir, bvh, engine, active=active, bfc=bfc
            )
            prim = jnp.where(active, prim, traverse.MISS)

        def occluded(org, sdir, t_max, mask):
            return traverse.any_hit(
                data, org, sdir, t_max, bvh, engine, active=mask, bfc=bfc,
                relaxed=relaxed,
            )
        if not fast_hits:
            h = refine_hit(data, meta, cur_org, cur_dir, prim)

        # depth-0 miss → background color; deeper misses stay black
        # (raytracer.cpp:442-449)
        color = color + jnp.where(
            ((depth == 0) & ~h.hit & active)[..., None],
            data.background[None, :],
            0.0,
        )

        local = shade_local(data, meta, cur_dir, h, occluded,
                            shadow_fn=shadow_fn,
                            shadow_multi_fn=shadow_multi_fn)
        color = color + throughput * jnp.where(h.hit[:, None], local, 0.0)

        refl_org, refl_dir, tint, is_mirror = reflection_rays(data, cur_dir, h)
        active = active & is_mirror
        throughput = jnp.where(active[:, None], throughput * tint, 0.0)
        cur_org = jnp.where(active[:, None], refl_org, cur_org)
        cur_dir = jnp.where(active[:, None], refl_dir, cur_dir)
        return depth + 1, color, throughput, active, cur_org, cur_dir, idx

    def alive(carry):
        depth, _, _, active, _, _, _ = carry
        return (depth <= meta.max_depth) & jnp.any(active)

    init = (
        jnp.int32(0),
        jnp.zeros((r, 3), jnp.float32),
        jnp.ones((r, 3), jnp.float32),
        jnp.ones((r,), bool),
        origin,
        dirs,
        jnp.arange(r, dtype=jnp.int32),
    )
    if differentiable:
        # reverse-mode AD cannot cross lax.while_loop; unroll via scan to
        # the static bounce bound instead (no early exit)
        def scan_bounce(carry, _):
            return bounce(carry), None

        (_, color, _, _, _, _, _), _ = jax.lax.scan(
            scan_bounce, init, None, length=meta.max_depth + 1
        )
        return color
    # one traced bounce in a while_loop: graph size independent of
    # recursion depth AND early exit once every mirror path has died
    # (scenes routinely declare MaxRecursionDepth=6 with no mirrors at
    # all — the reference's recursion just never happens there).
    # Bounce 0 is peeled out of the loop for eye wavefronts so the
    # closest-hit kernel can exploit the shared origin.
    carry = init
    if fast_hits and eye_shared:
        carry = bounce(carry, shared_eye=True)
    _, color, _, _, _, _, idx = jax.lax.while_loop(alive, bounce, carry)
    if compact:
        # the restore sort costs ~1-2 ms/M rays even when the runtime
        # gate never fired (idx is then the identity — e.g. no-mirror
        # scenes whose loop exits at bounce 0); skip it unless some
        # bounce actually permuted the carry
        color = jax.lax.cond(
            jnp.any(idx != jnp.arange(r, dtype=jnp.int32)),
            lambda c: _uncompact_color(c, idx),
            lambda c: c,
            color)
    return color


@partial(jax.jit, static_argnames=("meta", "engine", "differentiable",
                                   "bfc", "relaxed"))
def _render_rays_jit(data, meta, origin, dirs, bvh, engine,
                     differentiable=False, bfc=False, relaxed=False):
    return render_rays(data, meta, origin, dirs, bvh=bvh, engine=engine,
                       differentiable=differentiable, bfc=bfc,
                       relaxed=relaxed)


@partial(jax.jit,
         static_argnames=("meta", "h", "w", "engine", "bfc", "blocks",
                          "relaxed"))
def _render_camera_jit(data, meta, cam_vec, h, w, perm, inv, bvh, engine,
                       bfc=False, blocks=None, relaxed=False):
    """Whole-frame pipeline in ONE dispatch: eye rays, tile permutation,
    trace, inverse permutation, reshape.  Camera parameters are TRACED
    (packed in cam_vec) so all cameras sharing a resolution share one
    compile — only H/W are static.  ``blocks=(bh, bw)`` (evenly-dividing
    grids — every bundled scene) applies the tile order as a
    reshape/transpose instead of the perm/inv gathers (ops.tiling)."""
    from raytracer_tpu.ops.camera import eye_rays_from
    from raytracer_tpu.ops.tiling import apply_tile_order, undo_tile_order

    origin, dirs = eye_rays_from(cam_vec, w, h)
    dirs = apply_tile_order(dirs, h, w, blocks, perm)
    color = render_rays(data, meta, origin, dirs, bvh=bvh, engine=engine,
                        bfc=bfc, relaxed=relaxed)
    color = undo_tile_order(color, h, w, blocks, inv)
    return color.reshape(h, w, 3)


@partial(jax.jit, static_argnames=(
    "meta", "h", "w", "band_h", "engine", "bfc", "ssaa", "ssaa_mode",
    "blocks", "hdr", "mesh", "relaxed"))
def _render_band_jit(data, meta, cam_vec, h, w, row0, band_h, perm, inv,
                     bvh, engine, bfc, ssaa, ssaa_mode, blocks=None,
                     hdr=False, seed=None, mesh=None, relaxed=False):
    """One streamed row band: eye rays for rows [row0, row0+band_h) at the
    SSAA-scaled resolution, traced, SSAA-reduced, quantized to uint8
    (``hdr=True`` skips quantization and returns float32 linear radiance
    — the EXR output path; SSAA then always reduces as a float mean).
    ``row0`` is traced, so every equal-height band shares one compile.

    ``mesh``: an optional 1-D jax.sharding.Mesh — the trace is then
    shard_map'ed over the band's (tile-ordered) ray axis, the TPU-native
    replacement for the reference's hardware_concurrency() thread fan-out
    (/root/reference/raytracer.cpp:367-377).  Everything around the trace
    (eye rays, tile order, SSAA reduction, quantization) is the SAME code
    as single-device, so parity holds by construction; the caller aligns
    band_h so each shard receives whole pixel-tile blocks."""
    from raytracer_tpu.ops.camera import eye_rays_band
    from raytracer_tpu.ops.image import (
        downsample_mean, downsample_parity, quantize,
    )
    from raytracer_tpu.ops.tiling import apply_tile_order, undo_tile_order

    jitter = None
    if ssaa_mode == "jitter" and ssaa > 1:
        # deterministic per-band stochastic sample offsets in [-0.5, 0.5)
        # (keyed on seed + the band's first row, so a re-render with the
        # same seed is reproducible and seeds give independent sample sets)
        base_key = jax.random.PRNGKey(0 if seed is None else seed)
        key = jax.random.fold_in(base_key, row0.astype(jnp.int32))
        jitter = jax.random.uniform(
            key, (band_h, w, 2), jnp.float32, minval=-0.5, maxval=0.5)
    origin, dirs = eye_rays_band(cam_vec, w, h, row0, band_h, jitter=jitter)
    dirs = apply_tile_order(dirs, band_h, w, blocks, perm)
    if mesh is None or mesh.size == 1:
        color = render_rays(data, meta, origin, dirs, bvh=bvh, engine=engine,
                            bfc=bfc, relaxed=relaxed)
    else:
        from jax.sharding import PartitionSpec as P

        from raytracer_tpu.parallel.mesh import RAY_AXIS

        def local(dat, bv, org, dd):
            return render_rays(dat, meta, org, dd, bvh=bv, engine=engine,
                               bfc=bfc, relaxed=relaxed)

        color = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P(), P(RAY_AXIS)),
            out_specs=P(RAY_AXIS), check_vma=False,
        )(data, bvh, origin, dirs)
    color = undo_tile_order(color, band_h, w, blocks, inv)
    color = color.reshape(band_h, w, 3)
    if hdr:
        return color if ssaa <= 1 else downsample_mean(color, ssaa)
    if ssaa <= 1:
        return quantize(color)
    if ssaa_mode == "parity":
        return downsample_parity(quantize(color), ssaa)
    return quantize(downsample_mean(color, ssaa))


def _cap_chunk_for_big_scenes(chunk: int, bvh) -> int:
    """Cap the ray-chunk size for SEGMENTED scenes so each compiled
    program carries at most ONE MAX_NT kernel split.

    Scenes beyond SEG_SLOTS triangle slots unroll a Pallas visit call
    per cluster-axis segment per wave; a large chunk multiplies every
    one of those instances (MAX_NT splits) AND scales each instance's
    shortlist arrays, and the remote compile service crashes on the
    resulting program (round-5 envelope, measured: 2M tris / 500k
    spheres FAIL at the default 2M-ray chunk AND at a 196,608-ray
    (exactly-MAX_NT) chunk, and render fine at a 131,072-ray chunk —
    187.3 ms / 463.7 ms at 512^2; experiments/exp_envelope_r5.py).
    Capping costs nothing for bundled scenes (their frames already fit
    one chunk) and only adds per-chunk dispatch overhead for giants."""
    from raytracer_tpu.models.clusters import ClusterSet
    from raytracer_tpu.ops.cluster_trace import SEG_SLOTS

    if isinstance(bvh, ClusterSet) and (
            bvh.tri_dat.shape[1] > SEG_SLOTS
            or bvh.sph_dat.shape[1] > SEG_SLOTS):
        return min(chunk, 1 << 17)
    return chunk


def _tile_block_shape():
    """(bh, bw) pixel-block shape holding exactly TILE rays (e.g. TILE=128
    -> 8x16, 256 -> 16x16): the square-ish frustum the cluster shortlist
    culls against."""
    from raytracer_tpu.ops.cluster_trace import TILE

    bh = 1 << (max(TILE.bit_length() - 1, 0) // 2)
    return bh, TILE // bh


def render_camera_streamed(
    data: SceneData,
    meta: SceneMeta,
    cam: Camera,
    bvh=None,
    engine: str = "auto",
    chunk: int = 1 << 22,
    bfc: bool = False,
    ssaa: int = 1,
    ssaa_mode: str = "parity",
    hdr: bool = False,
    seed: int = 0,
    mesh=None,
    relaxed: bool = False,
):
    """Render one camera to a final-resolution (H, W, 3) uint8 image by
    streaming ROW BANDS of the SSAA-scaled frame through the device
    (``hdr=True``: float32 linear radiance instead, for EXR output).

    Unlike ``render_camera`` (whole-frame float radiance), ray state never
    exceeds one band (~``chunk`` rays): a 256x-SSAA horse_and_mug frame is
    265M rays — 3.2 GB of directions if materialized at once (the
    reference simply allocates the scaled Pixel buffer,
    raytracer.cpp:506-512).  Bands keep the scaled-resolution pixel-tile
    coherence that the cluster kernel's shortlists depend on, and the SSAA
    reduction runs per band on device so only uint8 leaves the band loop.

    ``mesh``: optional 1-D device mesh — each band's ray axis is then
    sharded over it (see _render_band_jit).  Band heights are additionally
    aligned so every shard holds whole pixel-tile blocks, and the frame is
    padded with virtual bottom rows to keep all shards equal (the extra
    rows are rendered and cropped; eye-ray math extrapolates the image
    plane).  When the real/pad boundary lands mid tile-block (frame height
    not a multiple of the 8-row block), pad rays can only WIDEN a boundary
    tile's cluster shortlist — a sound superset, so every real ray still
    tests its winning primitives; composition can only reorder visits,
    observable solely in the exact-float-t tie class the cluster engine
    already documents (cluster_trace._closest_kernel).  The boundary case
    is pinned bitwise by
    tests/test_cli_mesh.py::test_mesh_streamed_band_padding[150].
    """
    from raytracer_tpu.models.clusters import ClusterSet
    from raytracer_tpu.ops.camera import camera_vectors
    from raytracer_tpu.ops.tiling import block_permutation

    if engine == "auto":
        if isinstance(bvh, ClusterSet):
            engine = "cluster"
        elif bvh is not None and meta.n_tris + meta.n_spheres > 64:
            engine = "bvh"
        else:
            engine = "brute"
    if engine == "cluster":
        chunk = _cap_chunk_for_big_scenes(chunk, bvh)
    hs, ws = cam.height * ssaa, cam.width * ssaa
    lcm = 16 * ssaa // np.gcd(16, ssaa)
    if mesh is not None and mesh.size > 1:
        # every shard must hold an equal, whole-block slice of the band
        shard_rows = (_tile_block_shape()[0] if engine == "cluster" else 1)
        lcm = int(np.lcm(lcm, shard_rows * mesh.size))
    band_h = max(lcm, (chunk // ws) // lcm * lcm)
    cam_vec = jnp.asarray(camera_vectors(cam))
    bands = []
    row0 = 0
    while row0 < hs:
        bh = min(band_h, hs - row0)  # trailing band may be shorter
        if mesh is not None and mesh.size > 1 and bh % lcm:
            bh = ((bh + lcm - 1) // lcm) * lcm  # virtual pad rows (mesh)
        blocks = p = i = None
        if engine == "cluster":
            from raytracer_tpu.ops.tiling import divides

            tb_h, tb_w = _tile_block_shape()
            if divides(bh, ws, tb_h, tb_w):
                blocks = (tb_h, tb_w)
            else:
                p, i = block_permutation(bh, ws, tb_h, tb_w)
                p, i = jnp.asarray(p), jnp.asarray(i)
        bands.append(_render_band_jit(
            data, meta, cam_vec, hs, ws, jnp.float32(row0), bh, p, i,
            bvh, engine, bfc, ssaa, ssaa_mode, blocks=blocks, hdr=hdr,
            seed=jnp.uint32(seed), mesh=mesh, relaxed=relaxed,
        ))
        row0 += bh
    out = jnp.concatenate(bands, axis=0)
    return out[: cam.height] if out.shape[0] != cam.height else out


def render_camera(
    data: SceneData,
    meta: SceneMeta,
    cam: Camera,
    bvh=None,
    engine: str = "auto",
    chunk: int = 1 << 22,
    bfc: bool = False,
    relaxed: bool = False,
):
    """Render one camera to an (H, W, 3) float32 radiance image.

    Rays are processed in fixed-size chunks so arbitrarily large frames fit
    in HBM and jit caches are reused across chunks and cameras.  With the
    cluster engine, rays are re-ordered into pixel blocks holding TILE
    rays each (8x16 for TILE=128; see _tile_block_shape) so every kernel
    tile is a coherent frustum — a pure reshape/transpose when the block
    shape divides the frame, a perm/inv gather otherwise; the inverse
    restores image order afterwards.
    """
    from raytracer_tpu.models.clusters import ClusterSet

    if engine == "auto":
        if isinstance(bvh, ClusterSet):
            engine = "cluster"
        elif bvh is not None and meta.n_tris + meta.n_spheres > 64:
            engine = "bvh"
        else:
            engine = "brute"
    r = cam.width * cam.height
    perm = inv = blocks = None
    if engine == "cluster":
        from raytracer_tpu.ops.cluster_trace import TILE
        from raytracer_tpu.ops.tiling import block_permutation, divides

        bh, bw = _tile_block_shape()
        if divides(cam.height, cam.width, bh, bw):
            blocks = (bh, bw)
        else:
            perm, inv = block_permutation(cam.height, cam.width, bh, bw)
        chunk = max(TILE, (chunk // TILE) * TILE)
        chunk = _cap_chunk_for_big_scenes(chunk, bvh)
    if r <= chunk:
        # whole frame in one fused dispatch
        from raytracer_tpu.ops.camera import camera_vectors

        perm_d = None if perm is None else jnp.asarray(perm)
        inv_d = None if inv is None else jnp.asarray(inv)
        return _render_camera_jit(
            data, meta, jnp.asarray(camera_vectors(cam)), cam.height,
            cam.width, perm_d, inv_d, bvh, engine, bfc, blocks=blocks,
            relaxed=relaxed,
        )
    # chunked fallback for frames beyond the per-dispatch ray budget
    origin, dirs = eye_rays(cam)
    from raytracer_tpu.ops.tiling import apply_tile_order, undo_tile_order

    dirs = apply_tile_order(
        jnp.asarray(dirs), cam.height, cam.width, blocks,
        None if perm is None else jnp.asarray(perm))
    if engine == "cluster":
        from raytracer_tpu.ops.cluster_trace import TILE as _T
    else:
        _T = 256
    chunk = min(chunk, ((r + _T - 1) // _T) * _T)
    pad = (-r) % chunk
    if pad:
        dirs = jnp.concatenate([dirs, jnp.broadcast_to(dirs[-1:], (pad, 3))], axis=0)
    outs = []
    for s in range(0, r + pad, chunk):
        outs.append(
            _render_rays_jit(data, meta, origin, dirs[s : s + chunk], bvh,
                             engine, bfc=bfc, relaxed=relaxed)
        )
    color = jnp.concatenate(outs, axis=0)[:r]
    color = undo_tile_order(
        color, cam.height, cam.width, blocks,
        None if inv is None else jnp.asarray(inv))
    return color.reshape(cam.height, cam.width, 3)
