"""TILE=64 shadow kernel via a rays-on-SUBLANES bundle.

TILE=64 was 'impossible' with the (4, R) lane-major bundle (Mosaic
requires dynamic LANE slices to be 128-aligned), but a (R, 4) bundle
slices the SUBLANE axis, which only needs 8-alignment — 64-ray subtiles
are legal.  Pair work at t64 is -13.5% vs t128 (r2_shadow_tile stats).
Cost: (TILE,CLUSTER)=(64,128) halves vreg count per op, but the 16
(1,128) row broadcasts cost relatively more.  Measure it.

Variants on the 176-row horse band light-0 shadow wave:
  prod_t128 — production cluster_shadow (TILE=128 lane-major bundle)
  t64_sub   — 64-ray subtiles, sublane-major bundle
  t128_sub  — 128-ray subtiles, sublane-major bundle (isolates layout)
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
    MAX_TRI_LIST, _compact, _visit_clusters, build_shadow_planes,
    cluster_closest_hit, cluster_shadow, tile_cluster_mask,
)
from raytracer_tpu.ops.tiling import block_permutation

ITERS = 16
TPB = 16


def make_call(cset, planes, tile):
    pt = planes.shape[1]
    ct = pt // CLUSTER

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
        thit = tile_cluster_mask(origin, dirs, None, cset.tri_cmin,
                                 cset.tri_cmax, ones, tile)
        tw, tl, _, tc = _compact(*thit, MAX_TRI_LIST)
        wt = tw.shape[0] // nt
        # rays on SUBLANES: (R, 4) bundle [ox oy oz pad]
        bundle = jnp.concatenate(
            [origin, jnp.zeros((r, 1), jnp.float32)], axis=1)

        def kern(tw_ref, tl_ref, tc_ref, b_ref, pln_ref, found_out, acc):
            base = pl.program_id(0) * TPB

            def subtile(p, _):
                i = base + p
                lo = pl.multiple_of(p * tile, tile)
                bnd = b_ref[pl.ds(lo, tile), :]      # (tile, 4) sublane slice
                ox, oy, oz = bnd[:, 0:1], bnd[:, 1:2], bnd[:, 2:3]
                acc[:] = jnp.full((tile, CLUSTER), -jnp.inf, jnp.float32)

                def body(k):
                    s = pl.multiple_of(k * CLUSTER, CLUSTER)
                    row = lambda j: pln_ref[j, pl.ds(s, CLUSTER)][None, :]
                    u0 = ox * row(0) + (oy * row(1) + (oz * row(2) + row(3)))
                    v1 = ox * row(4) + (oy * row(5) + (oz * row(6) + row(7)))
                    v2 = ox * row(8) + (oy * row(9) + (oz * row(10)
                                                       + row(11)))
                    v3 = ox * row(12) + (oy * row(13) + (oz * row(14)
                                                         + row(15)))
                    m = jnp.minimum(jnp.minimum(u0, v1), jnp.minimum(v2, v3))
                    acc[:] = jnp.maximum(acc[:], m)

                _visit_clusters(i, tw_ref, tl_ref, tc_ref, ct, MAX_TRI_LIST,
                                wt, body)
                found_out[pl.ds(lo, tile), 0] = jnp.any(
                    acc[:] >= 0.0, axis=1, keepdims=True
                ).astype(jnp.int32)[:, 0]
                return 0

            jax.lax.fori_loop(0, TPB, subtile, 0)

        blk = TPB * tile
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nt // TPB,),
            in_specs=[
                pl.BlockSpec((blk, 4), lambda i, *_: (i, 0)),
                pl.BlockSpec((16, pt), lambda i, *_: (0, 0)),
            ],
            out_specs=pl.BlockSpec((blk, 1), lambda i, *_: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((tile, CLUSTER), jnp.float32),
            ],
        )
        found = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((r, 1), jnp.int32),
        )(tw, tl, tc, bundle, planes)
        return found.reshape(r)[:r0]
    return call


def scan_wrap(fn):
    @jax.jit
    def many(o, d):
        def step(acc, i):
            out = fn(o + i * 1e-7, d)
            return acc + jnp.sum(out.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0),
                              jnp.arange(1, ITERS + 1, dtype=jnp.float32))
        return acc
    return many


def timeit(fn, o, d, blocks=3):
    float(fn(o, d))
    best = np.inf
    for _ in range(blocks):
        t0 = time.perf_counter()
        out = fn(o, d)
        float(out)
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


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
    perm, inv = block_permutation(rows, cam.width, 8, 16)
    dirs = jnp.asarray(dirs)[jnp.asarray(perm)]
    h0 = jax.jit(lambda d: cluster_closest_hit(
        cset, jnp.asarray(origin), d, meta.shadow_eps,
        shared_origin=True))(dirs)
    off0 = jax.block_until_ready(h0[5])
    lp0 = data.light_pos[0]
    planes = jax.block_until_ready(
        jax.jit(lambda: build_shadow_planes(cset, lp0))())
    sd0 = jax.block_until_ready(lp0[None] - off0)

    prod = jax.jit(lambda o, d: cluster_shadow(cset, planes, o,
                                               lp0[None] - o, lp0))
    fns = {"prod_t128": scan_wrap(lambda o, d: cluster_shadow(
               cset, planes, o, lp0[None] - o, lp0))}
    ref = np.asarray(jax.block_until_ready(prod(off0, sd0)))
    for tile in (128, 64):
        f = make_call(cset, planes, tile)
        out = np.asarray(jax.block_until_ready(jax.jit(f)(off0, sd0)))
        agree = float((out != 0).astype(bool).mean() ==
                      0) if False else float(((out != 0) == ref).mean())
        fns[f"t{tile}_sub"] = scan_wrap(f)
        print(json.dumps({"variant": f"t{tile}_sub",
                          "agree_vs_prod": round(agree, 6)}), flush=True)
    for name, fn in fns.items():
        ms = timeit(fn, off0, sd0) * 1e3
        print(json.dumps({"variant": name, "ms": round(ms, 2)}), flush=True)


main()
