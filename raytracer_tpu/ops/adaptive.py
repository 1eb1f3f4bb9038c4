"""Adaptive (variance-driven) supersampling, tile-granular by design.

A quality/efficiency extension with no reference analog: the reference's
only anti-aliasing is uniform SSAA — every pixel pays the same sample
count whether it covers a flat wall or a silhouette edge
(``/root/reference/raytracer.cpp:506-512`` just scales the resolution).
Adaptive sampling spends a small uniform base pass, measures per-pixel
sample variance, and concentrates extra samples where the variance says
the estimate is still noisy (edges, checker transitions, mirror
boundaries).

TPU-first shape of the idea: the unit of refinement is NOT a pixel but a
**pixel block** (8x16 = one cluster-kernel TILE of pixels,
models/whitted.py ``_tile_block_shape``).  Per-pixel refinement would
hand the tracer a scattered, incoherent ray set — exactly what the
lockstep cluster kernel is worst at — and dynamic per-pixel counts would
break static shapes.  Block granularity keeps every refinement wave a
stack of coherent tile frustums with one static shape (k blocks x
extra_spp x TILE rays), so the whole adaptive render is TWO fixed-shape
dispatches: the base wave and the refinement wave, glued by a top_k over
block variance scores (all on device; nothing data-dependent escapes to
the host).  (32-pixel sub-block selection was tried and measured a wash
— see the comment at p_sel in ``_adaptive_jit``.)

Sample layout: a TILE-ray run must be a TIGHT frustum — the cluster
shortlist's work scales with the tile's pixel footprint.  Laying one
whole 8x16 block at one jitter per run costs a 4x-area frustum vs the
uniform SSAA path (whose blocks live in the SCALED pixel grid) and
measured 1.5x slower per ray on horse_and_mug.  Instead samples are
grouped: with group size g (the largest power-of-2 divisor of spp, <=8),
each 128-ray run is one SUB-block of 128/g pixels x g consecutive
samples — spp=4 gives 2x16-pixel frusta x 4 samples, matching the
uniform path's footprint-per-tile.  Order: (block, sample_group,
sub_block, sample_in_group, pixel).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.models.scene import Camera, SceneData, SceneMeta

_LUM = np.array([0.2126, 0.7152, 0.0722], np.float32)  # Rec.709 luma


def sample_group(spp: int) -> int:
    """Samples per 128-ray kernel run: the largest power-of-2 divisor of
    spp, capped at 8 (a 16-pixel frustum is already tighter than the
    shortlist's win justifies)."""
    g = 1
    while spp % (g * 2) == 0 and g < 8:
        g *= 2
    return g


def _tile_pixel_coords(h: int, w: int, bh: int, bw: int):
    """Host-side (rows, cols, inv_or_None, n_pad) for tile-ordered pixels.

    rows/cols are length R_pad = ceil(h*w / (bh*bw)) * bh*bw with trailing
    pad lanes repeating the last pixel (only non-dividing frames pad; all
    bundled scenes divide).  ``inv`` indexes tile order back to row-major
    (None when a pure reshape works — ops.tiling.from_blocks).
    """
    from raytracer_tpu.ops.tiling import block_permutation, divides

    r = h * w
    tile = bh * bw
    if divides(h, w, bh, bw):
        perm, inv = block_permutation(h, w, bh, bw)
        return perm // w, perm % w, None, 0
    perm, inv = block_permutation(h, w, bh, bw)
    pad = (-r) % tile
    if pad:
        perm = np.concatenate([perm, np.repeat(perm[-1:], pad)])
    return perm // w, perm % w, inv, pad


@partial(jax.jit, static_argnames=(
    "meta", "h", "w", "engine", "bfc", "base_spp", "extra_spp", "k",
    "tile", "reshape_blocks", "relaxed"))
def _adaptive_jit(data, meta, cam_vec, h, w, rows_t, cols_t, inv, key,
                  bvh, engine, bfc, base_spp, extra_spp, k, tile,
                  reshape_blocks, relaxed=False):
    """The whole adaptive render as one traced graph: base wave ->
    [variance -> top-k blocks -> refinement wave] per entry of the
    static tuple ``extra_spp`` (one entry per round) -> merged mean.
    Multi-round refinement re-scores from the ACCUMULATED sample
    statistics each round, so blocks that merely looked noisy at
    base_spp samples drop out once their estimate tightens and the
    budget re-concentrates on true high-variance blocks."""
    from raytracer_tpu.models.whitted import render_rays
    from raytracer_tpu.ops.camera import eye_rays_pixels

    nblk = rows_t.shape[0] // tile
    rows_b = rows_t.reshape(nblk, tile)
    cols_b = cols_t.reshape(nblk, tile)

    def wave(rows2, cols2, spp, subkey, center_first=True):
        """(B, np) pixel coords -> (B, spp, np, 3) per-sample color.
        With ``center_first`` sample 0 is the deterministic pixel center
        (the reference's sampling point); the rest jitter uniformly.
        REFINEMENT waves pass False — the base wave already holds the
        center sample, and re-tracing it would add bit-identical
        duplicates that bias the mean and deflate the variance (every
        round would re-pay it).  Rays are laid out
        (B, spp//g, sub-blocks, g samples, tile//g pixels) so each
        TILE-ray kernel run is a tight sub-block frustum (see module
        docstring); the return value is back in logical order."""
        b, npx = rows2.shape
        g = sample_group(spp)
        og, p = spp // g, tile // g
        sub = npx // p  # sub-blocks per coord row (np must divide by p)
        # logical sample space (b, spp, np); sample 0 = pixel center
        jit_ = jax.random.uniform(subkey, (b, spp, npx, 2), jnp.float32,
                                  minval=-0.5, maxval=0.5)
        if center_first:
            jit_ = jit_.at[:, 0].set(0.0)
        # physical: (b, outer o, sub-block j, in-group sample, pixel)
        jit_p = jit_.reshape(b, og, g, sub, p, 2).transpose(0, 1, 3, 2, 4, 5)
        rr = jnp.broadcast_to(rows2.reshape(b, 1, sub, 1, p),
                              (b, og, sub, g, p)).reshape(-1)
        cc = jnp.broadcast_to(cols2.reshape(b, 1, sub, 1, p),
                              (b, og, sub, g, p)).reshape(-1)
        e, dirs = eye_rays_pixels(cam_vec, w, h, rr, cc,
                                  jitter=jit_p.reshape(-1, 2))
        # refinement waves force the depth-gate off ("deep"): their
        # blocks are the divergent edge tiles whose deep bounces are
        # scattered by construction; the runtime scatter gate still
        # decides per bounce (VERDICT round-4 item 5)
        color = render_rays(data, meta, e, dirs, bvh=bvh, engine=engine,
                            bfc=bfc, relaxed=relaxed,
                            compact_mode="auto" if center_first else "deep")
        color = color.reshape(b, og, sub, g, p, 3).transpose(0, 1, 3, 2, 4, 5)
        return color.reshape(b, spp, npx, 3)

    kb, kr = jax.random.split(key)
    base = wave(rows_b, cols_b, base_spp, kb)        # (nblk, spp, tile, 3)
    lum = base @ jnp.asarray(_LUM)                   # (nblk, spp, tile)

    # Selection granularity: whole 128-pixel blocks.  Finer (32-pixel
    # sub-block) targeting was implemented and MEASURED A WASH on TPU
    # (low_poly: MSE 3.21 -> 3.23 at 12.5%, 2.54 -> 2.81 at 25%): the
    # 4x aiming precision is cancelled by 4x noisier variance estimates
    # (base_spp*p_sel samples per score), and edges cross whole blocks
    # anyway.  The machinery below stays generic over p_sel should a
    # smoothed-score variant revisit this.
    p_sel = tile
    nsel = (nblk * tile) // p_sel

    # running per-pixel sample statistics (tile order): color sum, luma
    # sum and sum of squares, per-refine-unit counts
    sum1 = jnp.sum(base, axis=1).reshape(nsel, p_sel, 3)
    lsum = jnp.sum(lum, axis=1).reshape(nsel, p_sel)
    lsq = jnp.sum(lum * lum, axis=1).reshape(nsel, p_sel)
    counts = jnp.full((nsel, 1, 1), float(base_spp), jnp.float32)
    score = jnp.zeros((nsel,), jnp.float32)
    rows_u = rows_t.reshape(nsel, p_sel)
    cols_u = cols_t.reshape(nsel, p_sel)
    for rnd in range(len(extra_spp) if k > 0 else 0):
        c = counts[:, :, 0]                          # (nsel, 1)
        var = lsq / c - jnp.square(lsum / c)         # (nsel, p_sel)
        score = jnp.mean(jnp.maximum(var, 0.0), axis=1)
        _, sel_ids = jax.lax.top_k(score, k)
        sub = kr if rnd == 0 else jax.random.fold_in(kr, rnd)
        extra = wave(rows_u[sel_ids], cols_u[sel_ids], extra_spp[rnd], sub,
                     center_first=False)
        lum_e = extra @ jnp.asarray(_LUM)            # (k, spp, p_sel)
        sum1 = sum1.at[sel_ids].add(jnp.sum(extra, axis=1))
        lsum = lsum.at[sel_ids].add(jnp.sum(lum_e, axis=1))
        lsq = lsq.at[sel_ids].add(jnp.sum(lum_e * lum_e, axis=1))
        counts = counts.at[sel_ids].add(float(extra_spp[rnd]))
    if k <= 0 or not extra_spp:
        c = counts[:, :, 0]
        var = lsq / c - jnp.square(lsum / c)
        score = jnp.mean(jnp.maximum(var, 0.0), axis=1)
    mean = (sum1 / counts).reshape(-1, 3)            # tile order, padded

    if reshape_blocks is not None:
        from raytracer_tpu.ops.tiling import from_blocks

        img = from_blocks(mean, h, w, *reshape_blocks)
    else:
        img = mean[inv]                              # drops pad lanes too
    return img.reshape(h, w, 3), score


def render_camera_adaptive(
    data: SceneData,
    meta: SceneMeta,
    cam: Camera,
    bvh=None,
    engine: str = "auto",
    base_spp: int = 4,
    extra_spp: int = 12,
    refine_frac: float = 0.125,
    seed: int = 0,
    bfc: bool = False,
    rounds: int = 1,
    relaxed: bool = False,
):
    """Render one camera adaptively to (H, W, 3) float32 radiance.

    Every pixel gets ``base_spp`` jittered samples (sample 0 at the pixel
    center); then ``rounds`` refinement passes each give the CURRENTLY
    noisiest ``refine_frac`` of pixel blocks their exact share of
    ``extra_spp`` (earlier rounds take the remainder; refinement samples
    are fully jittered — the center is already held by the base wave),
    re-scored from the accumulated statistics between passes so
    converged blocks drop out.  Returns ``(image, stats)`` where
    stats records the realized budget: at the defaults the frame costs
    base 4 + 0.125*12 = 5.5 samples/pixel yet resolves edge blocks at 16.

    Memory note: the base wave materializes H*W*base_spp rays in one
    dispatch (grouped-sample layout, see module docstring); a 1M-pixel
    frame at the default 4 spp is the same ray count as uniform SSAA 2x.
    """
    from raytracer_tpu.models.clusters import ClusterSet
    from raytracer_tpu.models.whitted import _tile_block_shape
    from raytracer_tpu.ops.camera import camera_vectors
    from raytracer_tpu.ops.tiling import divides

    if base_spp < 2:
        raise ValueError("adaptive sampling needs base_spp >= 2 "
                         "(variance of one sample is identically zero)")
    if engine == "auto":
        if isinstance(bvh, ClusterSet):
            engine = "cluster"
        elif bvh is not None and meta.n_tris + meta.n_spheres > 64:
            engine = "bvh"
        else:
            engine = "brute"
    bh, bw = _tile_block_shape()
    tile = bh * bw
    rows, cols, inv, _pad = _tile_pixel_coords(cam.height, cam.width, bh, bw)
    nblk = len(rows) // tile
    # refinement unit: whole blocks (must mirror _adaptive_jit's p_sel;
    # sub-block selection measured a wash — see comment there)
    p_sel = tile
    nsel = len(rows) // p_sel
    k = min(nsel, max(1, round(refine_frac * nsel))) if extra_spp > 0 else 0
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    if extra_spp > 0 and rounds > extra_spp:
        raise ValueError(
            f"rounds={rounds} exceeds extra_spp={extra_spp}: each round "
            "needs at least one sample (the budget is split EXACTLY — "
            "no round is silently inflated)")
    # exact split of the extra budget: earlier rounds take the remainder
    per_round = tuple(
        extra_spp // rounds + (1 if i < extra_spp % rounds else 0)
        for i in range(rounds)
    ) if extra_spp > 0 else ()
    per_round = tuple(x for x in per_round if x > 0)
    reshape_blocks = (bh, bw) if divides(cam.height, cam.width, bh, bw) \
        else None
    img, score = _adaptive_jit(
        data, meta, jnp.asarray(camera_vectors(cam)), cam.height, cam.width,
        jnp.asarray(rows, jnp.float32), jnp.asarray(cols, jnp.float32),
        None if inv is None else jnp.asarray(inv),
        jax.random.PRNGKey(seed), bvh, engine, bfc, base_spp, per_round,
        k, tile, reshape_blocks, relaxed=relaxed,
    )
    r = cam.height * cam.width
    extra_total = k * p_sel * sum(per_round)
    stats = {
        "blocks": nblk,
        "refine_units": nsel,
        "refine_unit_px": p_sel,
        "refined_blocks": k,
        "rounds": len(per_round),
        "base_spp": base_spp,
        "extra_spp_per_round": per_round,
        "total_samples": len(rows) * base_spp + extra_total,
        "mean_spp": (len(rows) * base_spp + extra_total) / r,
    }
    return img, stats
