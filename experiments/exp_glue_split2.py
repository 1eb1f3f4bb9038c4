"""Glue vs kernel cost, measured INSIDE one jit (lax.scan over 16
perturbed iterations) so the axon tunnel's ~40ms per-dispatch floor
cancels.  Variants on the horse 176-row-band light-0 shadow wavefront:

  glue    — tile_cluster_mask + _compact + bundle layout only
  kernel  — production shadow planes kernel only (precomputed shortlist)
  full    — production cluster_shadow (glue + kernel + dense spheres)
  k_t128  — kernel at tile=128 (with its own glue, t128 shortlist)
"""
import sys, os, json, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from raytracer_tpu.utils.compile_cache import enable
enable()
from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters, CLUSTER
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.ops.camera import camera_vectors, eye_rays_band
from raytracer_tpu.ops.cluster_trace import (
    MAX_TRI_LIST, TPB, _compact, _shadow_kernel, build_shadow_planes,
    cluster_closest_hit, cluster_shadow, tile_cluster_mask,
)
from raytracer_tpu.ops.tiling import block_permutation

ITERS = 16


def scan_wrap(fn):
    """jit(sum over ITERS perturbed invocations of fn(origin, dirs))."""
    @jax.jit
    def many(o, d):
        def step(acc, i):
            out = fn(o + i * 1e-7, d)
            return acc + jnp.sum(out.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(
            step, jnp.float32(0),
            jnp.arange(1, ITERS + 1, dtype=jnp.float32))
        return acc
    return many


def timeit(fn, o, d, blocks=3, reps=2):
    out = float(fn(o, d))  # compile + sync
    best = np.inf
    for _ in range(blocks):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(o, d)
        out.block_until_ready()
        float(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best / ITERS


def make_glue(cmin, cmax, tile):
    def glue(origin, dirs):
        r0 = origin.shape[0]
        pad = (-r0) % (tile * TPB)
        if pad:
            origin = jnp.concatenate(
                [origin, jnp.broadcast_to(origin[-1:], (pad, 3))], 0)
            dirs = jnp.concatenate(
                [dirs, jnp.broadcast_to(dirs[-1:], (pad, 3))], 0)
        r = origin.shape[0]
        ones = jnp.ones((r,), jnp.float32)
        thit = tile_cluster_mask(origin, dirs, None, cmin, cmax, ones, tile)
        tw, tl, te, tc = _compact(*thit, MAX_TRI_LIST)
        return tw.sum() + tl.sum() + tc.sum()
    return glue


def make_full(cset, planes, lp0, tile):
    def full(origin, dirs):
        # production path (tile fixed at module TILE=256); only valid there
        return cluster_shadow(cset, planes, origin, dirs, lp0, active=None)
    return full


def make_kernel_only(cset, planes, lp, tile):
    """Glue recomputed (cheap constant across variants) + kernel at
    the given tile size; variant A/B deltas isolate the kernel."""
    pt = planes.shape[1]
    ct = pt // CLUSTER
    sph_dat = cset.sph_dat

    def call(origin, dirs):
        r0 = origin.shape[0]
        pad = (-r0) % (tile * TPB)
        if pad:
            origin = jnp.concatenate(
                [origin, jnp.broadcast_to(origin[-1:], (pad, 3))], 0)
            dirs = jnp.concatenate(
                [dirs, jnp.broadcast_to(dirs[-1:], (pad, 3))], 0)
        r = origin.shape[0]
        nt = r // tile
        ones = jnp.ones((r,), jnp.float32)
        thit = tile_cluster_mask(origin, dirs, None, cmin := cset.tri_cmin,
                                 cset.tri_cmax, ones, tile)
        tw, tl, te, tc = _compact(*thit, MAX_TRI_LIST)
        wt = tw.shape[0] // nt
        sw = jnp.zeros((nt,), jnp.int32)
        sl = jnp.zeros((nt * 8,), jnp.int32)
        sc = jnp.zeros((nt,), jnp.int32)
        bundle = jnp.concatenate([origin.T, jnp.zeros((1, r), jnp.float32)])

        def kern(tw_ref, tl_ref, tc_ref, sw_ref, sl_ref, sc_ref, lp_ref,
                 b_ref, pln_ref, sph_ref, found_out, fnd, acc):
            base = pl.program_id(0) * TPB

            def subtile(p, _):
                i = base + p
                lo = pl.multiple_of(p * tile, tile)
                bnd = b_ref[:, pl.ds(lo, tile)].T
                ox, oy, oz = bnd[:, 0:1], bnd[:, 1:2], bnd[:, 2:3]
                acc[:] = jnp.full((tile, CLUSTER), -jnp.inf, jnp.float32)

                def tri_body(k):
                    s = pl.multiple_of(k * CLUSTER, CLUSTER)
                    row = lambda j: pln_ref[j, pl.ds(s, CLUSTER)][None, :]
                    u0 = ox * row(0) + (oy * row(1) + (oz * row(2) + row(3)))
                    v1 = ox * row(4) + (oy * row(5) + (oz * row(6) + row(7)))
                    v2 = ox * row(8) + (oy * row(9) + (oz * row(10) + row(11)))
                    v3 = ox * row(12) + (oy * row(13) + (oz * row(14) + row(15)))
                    m = jnp.minimum(jnp.minimum(u0, v1), jnp.minimum(v2, v3))
                    acc[:] = jnp.maximum(acc[:], m)

                from raytracer_tpu.ops.cluster_trace import _visit_clusters
                _visit_clusters(i, tw_ref, tl_ref, tc_ref, ct, MAX_TRI_LIST,
                                wt, tri_body)
                found_out[p, :] = jnp.any(acc[:] >= 0.0, axis=1).astype(
                    jnp.int32)
                return 0

            jax.lax.fori_loop(0, TPB, subtile, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=(nt // TPB,),
            in_specs=[
                pl.BlockSpec((4, TPB * tile), lambda i, *_: (0, i)),
                pl.BlockSpec((16, pt), lambda i, *_: (0, 0)),
                pl.BlockSpec((4, sph_dat.shape[1]), lambda i, *_: (0, 0)),
            ],
            out_specs=pl.BlockSpec((TPB, tile), lambda i, *_: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((tile, 1), jnp.int32),
                pltpu.VMEM((tile, CLUSTER), jnp.float32),
            ],
        )
        found = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nt, tile), jnp.int32),
        )(tw, tl, tc, sw, sl, sc, lp, bundle, planes, sph_dat)
        return found
    return call


def main():
    data, meta = load_scene("/root/reference/inputs/horse_and_mug.xml")
    bvh = build_bvh(data, meta)
    cset = jax.device_put(build_clusters(data, meta, bvh))
    data = jax.device_put(data)
    cam = meta.cameras[0]
    rows = 176
    origin, dirs = eye_rays_band(jnp.asarray(camera_vectors(cam)),
                                 cam.width, cam.height, jnp.float32(272),
                                 rows)
    perm, inv = block_permutation(rows, cam.width, 16, 16)
    dirs = jnp.asarray(dirs)[jnp.asarray(perm)]
    hit, t, normal, mat, point, offset, prim = jax.jit(
        lambda d: cluster_closest_hit(cset, jnp.asarray(origin), d,
                                      meta.shadow_eps, shared_origin=True)
    )(dirs)
    lp0 = data.light_pos[0]
    sd0 = lp0[None] - offset
    planes = jax.block_until_ready(
        jax.jit(lambda: build_shadow_planes(cset, lp0))())
    offset = jax.block_until_ready(offset)
    lp = jnp.asarray(lp0).reshape(3)

    variants = {
        "glue_t256": scan_wrap(make_glue(cset.tri_cmin, cset.tri_cmax, 256)),
        "kernel_t256": scan_wrap(make_kernel_only(cset, planes, lp, 256)),
        "kernel_t128": scan_wrap(make_kernel_only(cset, planes, lp, 128)),
        "full_prod": scan_wrap(make_full(cset, planes, lp0, 256)),
    }
    for name, fn in variants.items():
        ms = timeit(fn, offset, sd0) * 1e3
        print(json.dumps({"variant": name, "ms_per_iter": round(ms, 2)}),
              flush=True)


main()
