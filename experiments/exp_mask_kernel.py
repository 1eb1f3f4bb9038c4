"""Pallas kernel for the exact per-ray cluster mask vs the fused-XLA jnp
version: per-call cost on horse_and_mug-sized waves (1.04M rays, 247
clusters), with and without inactive-tile skipping.

Layout: rays on sublanes (TILE per subtile) x clusters on lanes (Cpad),
the same pair pattern as the main kernels.  Per-ray reciprocals and o*inv
are precomputed on the XLA side into an (8, R) bundle
[oix oiy oiz thi ix iy iz pad]; thi folds the active mask (-inf when
inactive) and the t window (+inf for closest waves, 1.0 for shadow
segments).  A scalar-prefetched per-tile any-active count lets the kernel
skip fully-inactive tiles entirely (bounce-2 waves are 10% active).
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
    cluster_closest_hit, ray_cluster_mask, _pad_rays, _BIG, TILE, TPB,
)
from raytracer_tpu.ops.shade import reflection_rays, Hit
from raytracer_tpu.ops.tiling import block_permutation


def _mask_kernel(act_ref, box_ref, b_ref, hit_out, ent_out, *, skip: bool):
    base = pl.program_id(0) * TPB

    def subtile(p, _):
        i = base + p

        def compute():
            lo = pl.multiple_of(p * TILE, TILE)
            b = b_ref[:, pl.ds(lo, TILE)].T          # (TILE, 8)
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

        if skip:
            @pl.when(act_ref[i] != 0)
            def _():
                compute()

            @pl.when(act_ref[i] == 0)
            def _():
                hit_out[p, :] = jnp.zeros((hit_out.shape[1],), jnp.int32)
                ent_out[p, :] = jnp.full((ent_out.shape[1],), jnp.inf,
                                         jnp.float32)
        else:
            compute()
        return 0

    jax.lax.fori_loop(0, TPB, subtile, 0)


@functools.partial(jax.jit, static_argnames=("skip",))
def mask_pallas(origin, dirs, active, cmin, cmax, t_hi, skip=True):
    r = dirs.shape[0]
    nt = r // TILE
    inv = jnp.where(
        dirs != 0.0,
        jnp.clip(1.0 / jnp.where(dirs != 0.0, dirs, 1.0), -_BIG, _BIG),
        _BIG,
    )
    oi = origin * inv
    thi = jnp.full((r,), jnp.inf) if t_hi is None else t_hi
    if active is not None:
        thi = jnp.where(active, thi, -jnp.inf)
        act = active.reshape(nt, TILE).any(1).astype(jnp.int32)
    else:
        act = jnp.ones((nt,), jnp.int32)
    c = cmin.shape[0]
    cpad = -(-c // 128) * 128
    box = jnp.full((8, cpad), _BIG, jnp.float32)
    box = box.at[0:3, :c].set(cmin.T).at[4:7, :c].set(-_BIG)
    box = box.at[4:7, :c].set(cmax.T)
    bundle = jnp.concatenate([
        oi.T, thi[None], inv.T, jnp.zeros((1, r), jnp.float32)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt // TPB,),
        in_specs=[
            pl.BlockSpec((8, cpad), lambda i, *_: (0, 0)),
            pl.BlockSpec((8, TPB * TILE), lambda i, *_: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((TPB, cpad), lambda i, *_: (i, 0)),
            pl.BlockSpec((TPB, cpad), lambda i, *_: (i, 0)),
        ],
    )
    hit, ent = pl.pallas_call(
        functools.partial(_mask_kernel, skip=skip),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nt, cpad), jnp.int32),
            jax.ShapeDtypeStruct((nt, cpad), jnp.float32),
        ],
    )(act, box, bundle)
    return hit[:, :c] != 0, ent[:, :c]


def timeit(fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    n = 16
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    s = float(jnp.sum(out[1][jnp.isfinite(out[1])]))
    return (time.perf_counter() - t0) / n * 1e3, s


def main():
    data, meta = load_scene("/root/reference/inputs/horse_and_mug.xml")
    bvh = build_bvh(data, meta)
    cset = jax.device_put(build_clusters(data, meta, bvh))
    data = jax.device_put(data)
    cam = meta.cameras[0]
    origin, dirs = eye_rays_band(jnp.asarray(camera_vectors(cam)),
                                 cam.width, cam.height, jnp.float32(0),
                                 cam.height)
    perm, inv_p = block_permutation(cam.height, cam.width, 8, 16)
    dirs = jnp.asarray(dirs)[jnp.asarray(perm)]
    origin0 = jnp.asarray(origin, jnp.float32)
    eps = meta.shadow_eps

    fhit0, t0_, n0, m0, p0, off0, prim0 = jax.jit(
        lambda d: cluster_closest_hit(cset, origin0, d, eps,
                                      shared_origin=True))(dirs)
    hh0 = Hit(hit=fhit0, t=t0_, normal=n0, mat=m0, point=p0, offset=off0)
    ro1, rd1, _, is_m1 = jax.jit(lambda d: reflection_rays(data, d, hh0))(dirs)
    fhit1, t1_, n1, m1, p1, off1, prim1 = jax.jit(
        lambda o, d: cluster_closest_hit(cset, o, d, eps, active=is_m1)
    )(ro1, rd1)
    hh1 = Hit(hit=fhit1 & is_m1, t=t1_, normal=n1, mat=m1, point=p1,
              offset=off1)
    ro2, rd2, _, m2raw = jax.jit(lambda d: reflection_rays(data, d, hh1))(rd1)
    is_m2 = m2raw & is_m1

    waves = {
        "sh0": (off0, jnp.asarray(data.light_pos[0])[None] - off0, fhit0,
                jnp.ones((dirs.shape[0],), jnp.float32)),
        "c1": (ro1, rd1, is_m1, None),
        "c2": (ro2, rd2, is_m2, None),
    }
    f_jnp = jax.jit(lambda o, d, a, t: ray_cluster_mask(
        o, d, a, cset.tri_cmin, cset.tri_cmax, t, TILE))
    for name, (o, d, a, t) in waves.items():
        r, o, d, a, t = _pad_rays(o, d, a, t)
        hj, ej = f_jnp(o, d, a, t)
        for skip in (False, True):
            hp, ep = mask_pallas(o, d, a, cset.tri_cmin, cset.tri_cmax, t,
                                 skip=skip)
            same = bool(jnp.array_equal(hj, hp))
            ms_p, _ = timeit(lambda *x: mask_pallas(*x, skip=skip),
                             o, d, a, cset.tri_cmin, cset.tri_cmax, t)
            print(json.dumps({"wave": name, "skip": skip,
                              "pallas_ms": round(ms_p, 2),
                              "mask_equal": same}), flush=True)
        ms_j, _ = timeit(f_jnp, o, d, a, t)
        print(json.dumps({"wave": name, "jnp_ms": round(ms_j, 2)}),
              flush=True)


main()
