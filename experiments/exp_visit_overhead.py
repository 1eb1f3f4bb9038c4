"""Dissect per-visit fixed overhead in the shadow (planes) kernel.

Variants of a sphere-free shadow kernel on the horse_and_mug light-0
shadow wavefront (1.04M segments):

  rows16  — production form: 16 dynamic (1, C) row loads   + full test
  blk16   — ONE dynamic (16, C) block load, static row slices + full test
  rows4   — only rows 0:4 loaded, u0-only accumulate (timing floor probe)
  blk4    — block-load version of rows4

The (rows16 - rows4) delta is the cost of 12 FMA-rows + loads; the rows4
time bounds the loop + accumulate + load-address overhead.  tile sweep
re-run with the winning load mode at tile in {128, 256}.
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
    MAX_TRI_LIST, TPB, _compact, _visit_clusters, build_shadow_planes,
    cluster_closest_hit, tile_cluster_mask,
)
from raytracer_tpu.ops.tiling import block_permutation


def _kernel(tw_ref, tl_ref, tc_ref, b_ref, pln_ref, found_out, fnd, acc,
            *, ct, wt, tile, mode, nrows):
    base = pl.program_id(0) * TPB

    def subtile(p, _):
        i = base + p
        lo = pl.multiple_of(p * tile, tile)
        bnd = b_ref[:, pl.ds(lo, tile)].T
        ox, oy, oz = bnd[:, 0:1], bnd[:, 1:2], bnd[:, 2:3]
        acc[:] = jnp.full((tile, CLUSTER), -jnp.inf, jnp.float32)

        def tri_body(k):
            s = pl.multiple_of(k * CLUSTER, CLUSTER)
            if mode == "blk":
                blk = pln_ref[0:nrows, pl.ds(s, CLUSTER)]
                row = lambda j: blk[j:j + 1, :]
            else:
                row = lambda j: pln_ref[j, pl.ds(s, CLUSTER)][None, :]
            u0 = ox * row(0) + (oy * row(1) + (oz * row(2) + row(3)))
            if nrows >= 16:
                v1 = ox * row(4) + (oy * row(5) + (oz * row(6) + row(7)))
                v2 = ox * row(8) + (oy * row(9) + (oz * row(10) + row(11)))
                v3 = ox * row(12) + (oy * row(13) + (oz * row(14) + row(15)))
                m = jnp.minimum(jnp.minimum(u0, v1), jnp.minimum(v2, v3))
            else:
                m = u0
            acc[:] = jnp.maximum(acc[:], m)

        _visit_clusters(i, tw_ref, tl_ref, tc_ref, ct, MAX_TRI_LIST, wt,
                        tri_body)
        found_out[p, :] = jnp.any(acc[:] >= 0.0, axis=1).astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, TPB, subtile, 0)


def build_call(origin, dirs, planes, cmin, cmax, tile, mode, nrows):
    r0 = origin.shape[0]
    pad = (-r0) % (tile * TPB)
    if pad:
        origin = jnp.concatenate(
            [origin, jnp.broadcast_to(origin[-1:], (pad, 3))], 0)
        dirs = jnp.concatenate(
            [dirs, jnp.broadcast_to(dirs[-1:], (pad, 3))], 0)
    r = origin.shape[0]
    nt = r // tile
    pt = planes.shape[1]
    ct = pt // CLUSTER
    ones = jnp.ones((r,), jnp.float32)
    thit = tile_cluster_mask(origin, dirs, None, cmin, cmax, ones, tile)
    tw, tl, _, tc = _compact(*thit, MAX_TRI_LIST)
    wt = tw.shape[0] // nt
    kernel = functools.partial(_kernel, ct=ct, wt=wt, tile=tile, mode=mode,
                               nrows=nrows)
    bundle = jnp.concatenate([origin.T, jnp.zeros((1, r), jnp.float32)])
    blk = TPB * tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nt // TPB,),
        in_specs=[
            pl.BlockSpec((4, blk), lambda i, *_: (0, i)),
            pl.BlockSpec((16, pt), lambda i, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TPB, tile), lambda i, *_: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((tile, 1), jnp.int32),
            pltpu.VMEM((tile, CLUSTER), jnp.float32),
        ],
    )
    found = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt, tile), jnp.int32),
    )(tw, tl, tc, bundle, planes)
    n_visits = jnp.minimum(tc, MAX_TRI_LIST).sum()
    return found.reshape(r)[:r0], n_visits


@functools.partial(jax.jit, static_argnames=("tile",))
def _count_visits(origin, dirs, cmin, cmax, tile):
    r0 = origin.shape[0]
    pad = (-r0) % (tile * TPB)
    if pad:
        origin = jnp.concatenate(
            [origin, jnp.broadcast_to(origin[-1:], (pad, 3))], 0)
        dirs = jnp.concatenate(
            [dirs, jnp.broadcast_to(dirs[-1:], (pad, 3))], 0)
    ones = jnp.ones((origin.shape[0],), jnp.float32)
    thit = tile_cluster_mask(origin, dirs, None, cmin, cmax, ones, tile)
    counts = thit[0].sum(1)
    return jnp.minimum(counts, MAX_TRI_LIST).sum()


def count_visits(origin, dirs, cmin, cmax, tile):
    return int(_count_visits(origin, dirs, cmin, cmax, tile))


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def block_mean(fn, n=5):
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    s = 0.0
    for o in outs:
        s += sync(o)
    return (time.perf_counter() - t0) / n


def main():
    data, meta = load_scene("/root/reference/inputs/horse_and_mug.xml")
    bvh = build_bvh(data, meta)
    cset = jax.device_put(build_clusters(data, meta, bvh))
    data = jax.device_put(data)
    cam = meta.cameras[0]
    # central 176-row band: keeps every variant's SMEM shortlist resident
    # without per-call segmentation (tile=128 doubles the tile count)
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
    planes = jax.jit(lambda: build_shadow_planes(cset, lp0))()
    planes = jax.block_until_ready(planes)
    offset = jax.block_until_ready(offset)

    fns = {}
    ref_out = None
    for tile in (256, 128):
        for mode in ("rows", "blk"):
            for nrows in (16, 4):
                key = f"t{tile}_{mode}{nrows}"
                f = jax.jit(lambda o, d, tile=tile, mode=mode, nrows=nrows:
                            build_call(o, d, planes, cset.tri_cmin,
                                       cset.tri_cmax, tile, mode, nrows)[0])
                out = jax.block_until_ready(f(offset, sd0))
                nv = count_visits(offset, sd0, cset.tri_cmin,
                                  cset.tri_cmax, tile)
                if tile == 256 and mode == "rows" and nrows == 16:
                    ref_out = np.asarray(out)
                agree = float((np.asarray(out) == ref_out).mean()) \
                    if (nrows == 16 and ref_out is not None) else -1.0
                fns[key] = (f, nv, agree)

    # interleaved timing blocks
    results = {k: [] for k in fns}
    for _ in range(3):
        for k, (f, nv, agree) in fns.items():
            results[k].append(block_mean(lambda f=f: f(offset, sd0)))
    for k, (f, nv, agree) in fns.items():
        ms = min(results[k]) * 1e3
        print(json.dumps({
            "variant": k, "ms": round(ms, 2), "visits": nv,
            "us_per_visit": round(ms * 1e3 / nv, 3),
            "agree": round(agree, 6),
        }), flush=True)


main()
