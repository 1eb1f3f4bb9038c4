"""Split the shadow call's cost: phase-1 glue (tile_cluster_mask +
_compact + bundle layout) vs the Pallas kernel itself, on the horse
light-0 shadow wavefront at full frame (1.04M segments) and on the
176-row central band (0.25M)."""
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

TILE = 256


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def block_mean(fn, n=8):
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    s = 0.0
    for o in outs:
        s += sync(o)
    return (time.perf_counter() - t0) / n


def tmin(fn, blocks=3):
    sync(fn())
    return min(block_mean(fn) for _ in range(blocks))


@functools.partial(jax.jit, static_argnames=())
def glue(origin, dirs, cmin, cmax):
    r0 = origin.shape[0]
    pad = (-r0) % (TILE * TPB)
    if pad:
        origin = jnp.concatenate(
            [origin, jnp.broadcast_to(origin[-1:], (pad, 3))], 0)
        dirs = jnp.concatenate(
            [dirs, jnp.broadcast_to(dirs[-1:], (pad, 3))], 0)
    r = origin.shape[0]
    ones = jnp.ones((r,), jnp.float32)
    thit = tile_cluster_mask(origin, dirs, None, cmin, cmax, ones, TILE)
    tw, tl, te, tc = _compact(*thit, MAX_TRI_LIST)
    bundle = jnp.concatenate([origin.T, jnp.zeros((1, r), jnp.float32)])
    return tw, tl, tc, bundle


@functools.partial(jax.jit, static_argnames=("ct",))
def kernel_only(tw, tl, tc, bundle, planes, lp, sph_dat, ct):
    r = bundle.shape[1]
    nt = r // TILE
    pt = planes.shape[1]
    wt = tw.shape[0] // nt
    # empty sphere shortlist (horse's 2 spheres ride the dense path)
    cs_boxes = 4  # sph_dat cluster count
    sw = jnp.zeros((nt * 1,), jnp.int32)
    sl = jnp.zeros((nt * 8,), jnp.int32)
    sc = jnp.zeros((nt,), jnp.int32)
    kernel = functools.partial(
        _shadow_kernel, n_sph=0, ct=ct, cs=sph_dat.shape[1] // CLUSTER,
        wt=wt, ws=1, early_exit=True,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(nt // TPB,),
        in_specs=[
            pl.BlockSpec((4, TPB * TILE), lambda i, *_: (0, i)),
            pl.BlockSpec((16, pt), lambda i, *_: (0, 0)),
            pl.BlockSpec((4, sph_dat.shape[1]), lambda i, *_: (0, 0)),
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
    )(tw, tl, tc, sw, sl, sc, lp, bundle, planes, sph_dat)
    return found


def run(tag, row0, rows):
    data, meta = load_scene("/root/reference/inputs/horse_and_mug.xml")
    bvh = build_bvh(data, meta)
    cset = jax.device_put(build_clusters(data, meta, bvh))
    data = jax.device_put(data)
    cam = meta.cameras[0]
    origin, dirs = eye_rays_band(jnp.asarray(camera_vectors(cam)),
                                 cam.width, cam.height, jnp.float32(row0),
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
    ct = planes.shape[1] // CLUSTER

    g = jax.jit(lambda o, d: glue(o, d, cset.tri_cmin, cset.tri_cmax))
    tw, tl, tc, bundle = jax.block_until_ready(g(offset, sd0))
    k = jax.jit(lambda tw, tl, tc, b: kernel_only(
        tw, tl, tc, b, planes, lp, cset.sph_dat, ct))
    jax.block_until_ready(k(tw, tl, tc, bundle))
    prod = jax.jit(lambda o, d: cluster_shadow(
        cset, planes, o, d, lp0, active=None))
    jax.block_until_ready(prod(offset, sd0))

    ms_glue = tmin(lambda: g(offset, sd0)[1]) * 1e3
    ms_kern = tmin(lambda: k(tw, tl, tc, bundle)) * 1e3
    ms_prod = tmin(lambda: prod(offset, sd0)) * 1e3
    nv = int(jnp.minimum(tc, MAX_TRI_LIST).sum())
    print(json.dumps({
        "tag": tag, "rays": int(offset.shape[0]),
        "glue_ms": round(ms_glue, 2), "kernel_ms": round(ms_kern, 2),
        "prod_ms": round(ms_prod, 2), "visits": nv,
        "kern_us_per_visit": round(ms_kern * 1e3 / nv, 3),
    }), flush=True)


run("band176", 272, 176)
run("full720", 0, 720)
