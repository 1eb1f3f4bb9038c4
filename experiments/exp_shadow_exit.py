"""Grouped early-exit in the shadow planes kernel: every G triangle-
cluster visits, fold acc -> fnd and stop the walk once every lane is
occluded.  The accumulator form removed the per-visit exit (its lane
reduction serialized the pipeline); a grouped check amortizes the
reduction over G visits while keeping most of the exit benefit.

Variants G in {0 (=never, production), 2, 4, 8} on the horse bounce-0
shadow wave (both lights, 1.04M segments each), in-graph scan timing.
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
    MAX_TRI_LIST, TILE, TPB, _compact, build_shadow_planes,
    cluster_closest_hit, tile_cluster_mask,
)
from raytracer_tpu.ops.tiling import block_permutation

ITERS = 16


def make_call(cset, planes, lp, group):
    pt = planes.shape[1]
    ct = pt // CLUSTER
    sph_dat = cset.sph_dat

    def call(origin, dirs):
        r0 = origin.shape[0]
        pad = (-r0) % (TILE * TPB)
        if pad:
            origin = jnp.concatenate(
                [origin, jnp.broadcast_to(origin[-1:], (pad, 3))], 0)
            dirs = jnp.concatenate(
                [dirs, jnp.broadcast_to(dirs[-1:], (pad, 3))], 0)
        r = origin.shape[0]
        nt = r // TILE
        ones = jnp.ones((r,), jnp.float32)
        thit = tile_cluster_mask(origin, dirs, None, cset.tri_cmin,
                                 cset.tri_cmax, ones, TILE)
        tw, tl, te, tc = _compact(*thit, MAX_TRI_LIST)
        wt = tw.shape[0] // nt
        bundle = jnp.concatenate([origin.T, jnp.zeros((1, r), jnp.float32)])

        def kern(tw_ref, tl_ref, tc_ref, b_ref, pln_ref, found_out, acc):
            base = pl.program_id(0) * TPB

            def subtile(p, _):
                i = base + p
                lo = pl.multiple_of(p * TILE, TILE)
                bnd = b_ref[:, pl.ds(lo, TILE)].T
                ox, oy, oz = bnd[:, 0:1], bnd[:, 1:2], bnd[:, 2:3]
                acc[:] = jnp.full((TILE, CLUSTER), -jnp.inf, jnp.float32)

                def body(k):
                    s = pl.multiple_of(k * CLUSTER, CLUSTER)
                    row = lambda j: pln_ref[j, pl.ds(s, CLUSTER)][None, :]
                    u0 = ox * row(0) + (oy * row(1) + (oz * row(2) + row(3)))
                    v1 = ox * row(4) + (oy * row(5) + (oz * row(6) + row(7)))
                    v2 = ox * row(8) + (oy * row(9) + (oz * row(10) + row(11)))
                    v3 = ox * row(12) + (oy * row(13) + (oz * row(14)
                                                         + row(15)))
                    m = jnp.minimum(jnp.minimum(u0, v1), jnp.minimum(v2, v3))
                    acc[:] = jnp.maximum(acc[:], m)

                n = tc_ref[i]

                @pl.when(n <= MAX_TRI_LIST)
                def _():
                    if group == 0:
                        def from_list(k, _):
                            body(tl_ref[i * MAX_TRI_LIST + k])
                            return 0
                        jax.lax.fori_loop(0, n, from_list, 0)
                    else:
                        def cond(carry):
                            k, done = carry
                            return (k < n) & ~done

                        def step(carry):
                            k, done = carry
                            for g in range(group):
                                @pl.when(k + g < n)
                                def _():
                                    body(tl_ref[i * MAX_TRI_LIST + k + g])
                            occ = jnp.all(
                                jnp.any(acc[:] >= 0.0, axis=1))  # all rays occluded
                            return k + group, occ

                        jax.lax.while_loop(cond, step, (0, False))

                @pl.when(n > MAX_TRI_LIST)
                def _():
                    def from_bits(k, _):
                        bit = (tw_ref[i * wt + (k >> 5)] >> (k & 31)) & 1

                        @pl.when(bit != 0)
                        def _():
                            body(k)
                        return 0
                    jax.lax.fori_loop(0, ct, from_bits, 0)

                found_out[p, :] = jnp.any(acc[:] >= 0.0, axis=1).astype(
                    jnp.int32)
                return 0

            jax.lax.fori_loop(0, TPB, subtile, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nt // TPB,),
            in_specs=[
                pl.BlockSpec((4, TPB * TILE), lambda i, *_: (0, i)),
                pl.BlockSpec((16, pt), lambda i, *_: (0, 0)),
            ],
            out_specs=pl.BlockSpec((TPB, TILE), lambda i, *_: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((TILE, CLUSTER), jnp.float32),
            ],
        )
        found = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nt, TILE), jnp.int32),
        )(tw, tl, tc, bundle, planes)
        return found.reshape(r)[:r0]
    return call


def scan_wrap(fn):
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
    rows = 176  # central band: shortlists stay SMEM-resident unsegmented
    origin, dirs = eye_rays_band(jnp.asarray(camera_vectors(cam)),
                                 cam.width, cam.height, jnp.float32(272),
                                 rows)
    perm, inv = block_permutation(rows, cam.width, 8, 16)
    dirs = jnp.asarray(dirs)[jnp.asarray(perm)]
    origin0 = jnp.asarray(origin, jnp.float32)
    fhit0, t0_, n0, m0, p0, off0, prim0 = jax.jit(
        lambda d: cluster_closest_hit(cset, origin0, d, meta.shadow_eps,
                                      shared_origin=True))(dirs)
    off0 = jax.block_until_ready(off0)
    lp0 = data.light_pos[0]
    planes = jax.block_until_ready(
        jax.jit(lambda: build_shadow_planes(cset, lp0))())
    lp = jnp.asarray(lp0).reshape(3)
    sd0 = jax.block_until_ready(lp0[None] - off0)

    ref = None
    for g in (0, 2, 4, 8):
        f = scan_wrap(make_call(cset, planes, lp, g))
        single = make_call(cset, planes, lp, g)
        out = np.asarray(jax.jit(single)(off0, sd0))
        if ref is None:
            ref = out
        ms = timeit(f, off0, sd0) * 1e3
        print(json.dumps({"group": g, "ms": round(ms, 2),
                          "agree": float((out == ref).mean())}), flush=True)


main()
