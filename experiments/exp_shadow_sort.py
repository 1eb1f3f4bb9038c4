"""Experiment: does sorting shadow rays by source-point locality tighten
per-tile cluster shortlists enough to pay for the sort?

Round-1 finding (memory): reorder via gather costs ~40 ms/bounce (TPU XLA
gather is near-scalar).  Hypothesis: lax.sort with the ray payload as extra
operands rides the vectorized sorting network and avoids gathers.

Measures on horse_and_mug (real chip):
  1. candidates/tile histogram: unsorted vs sorted-by-morton(source point)
  2. any-hit kernel time: unsorted vs sorted
  3. sort-with-payload cost alone
Prints JSON lines.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.ops.camera import eye_rays
from raytracer_tpu.ops.cluster_trace import (
    TILE, cluster_any, cluster_closest_hit, tile_cluster_mask, _pad_rays,
)
from raytracer_tpu.ops.tiling import block_permutation
from raytracer_tpu.ops.shade import normalize


def sync(x):
    return float(jnp.sum(x))


def timeit(fn, n=6):
    """Slope timing: n chained dispatches, one sync (axon block is phantom)."""
    outs = [fn() for _ in range(n)]
    _ = sync(sum(jnp.sum(o) if o.dtype != bool else jnp.sum(o.astype(jnp.int32)) for o in [outs[-1]]))
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    _ = sync(sum(jnp.sum(o.astype(jnp.float32)) for o in outs))
    return (time.perf_counter() - t0) / n


def main():
    from raytracer_tpu.utils.compile_cache import enable
    enable()
    for treelet in (False, True):
        run_variant(treelet)


def run_variant(treelet):
    data, meta = load_scene("/root/reference/inputs/horse_and_mug.xml")
    bvh = build_bvh(data, meta)
    cset = jax.device_put(build_clusters(data, meta, bvh, treelet=treelet))
    print(json.dumps({"treelet": treelet,
                      "Ct": int(cset.tri_cmin.shape[0])}), flush=True)
    data = jax.device_put(data)
    cam = meta.cameras[0]
    origin, dirs = eye_rays(cam)
    perm, inv = block_permutation(cam.height, cam.width, 16, 16)
    dirs = dirs[jnp.asarray(perm)]
    r = dirs.shape[0]
    print(json.dumps({"rays": r}), flush=True)

    # closest hit -> real per-bounce shadow wavefront
    @jax.jit
    def make_shadow(origin, dirs):
        hit, t, normal, mat, point, offset, prim = cluster_closest_hit(
            cset, origin, dirs, meta.shadow_eps
        )
        nl = meta.n_lights
        lp = data.light_pos[:nl]
        to_off = lp[None, :, :] - offset[:, None, :]
        sdir_real = normalize(lp[None, :, :] - point[:, None, :])
        cos_theta = jnp.einsum("rlk,rk->rl", sdir_real, normal)
        relevant = cos_theta >= -1.8e-4
        org = jnp.broadcast_to(offset[:, None, :], (r, nl, 3))
        org = org.transpose(1, 0, 2).reshape(nl * r, 3)
        sd = to_off.transpose(1, 0, 2).reshape(nl * r, 3)
        mask = (hit[:, None] & relevant).T.reshape(nl * r)
        return org, sd, mask, offset

    org, sd, mask, offset = jax.block_until_ready(make_shadow(origin, dirs))
    t_max = jnp.ones((org.shape[0],), jnp.float32)
    print(json.dumps({"shadow_rays": int(org.shape[0]),
                      "active_frac": float(jnp.mean(mask.astype(jnp.float32)))}),
          flush=True)

    # --- candidate stats helper
    def cand_stats(o, d, act, label):
        rr, o2, d2, a2, tm = _pad_rays(o, d, act, t_max)
        hitm, _ = tile_cluster_mask(o2, d2, a2, cset.tri_cmin, cset.tri_cmax,
                                    tm, TILE)
        counts = np.asarray(hitm.sum(1))
        print(json.dumps({
            "stat": label, "tiles": int(counts.size),
            "mean_cand": float(counts.mean()),
            "p50": float(np.percentile(counts, 50)),
            "p90": float(np.percentile(counts, 90)),
            "max": int(counts.max()),
            "total_visits": int(counts.sum()),
        }), flush=True)

    cand_stats(org, sd, mask, "unsorted")

    # --- morton sort of the shadow wavefront (sort-with-payload, no gather)
    lo = jnp.minimum(cset.tri_cmin.min(0), cset.sph_cmin.min(0))
    hi = jnp.maximum(cset.tri_cmax.max(0), cset.sph_cmax.max(0))

    def morton_key(p, msk, light_id):
        q = jnp.clip((p - lo) / (hi - lo), 0.0, 1.0)
        g = (q * 1023).astype(jnp.int32)  # 10 bits/axis

        def spread(x):
            x = (x | (x << 16)) & 0x030000FF
            x = (x | (x << 8)) & 0x0300F00F
            x = (x | (x << 4)) & 0x030C30C3
            x = (x | (x << 2)) & 0x09249249
            return x
        key = spread(g[:, 0]) | (spread(g[:, 1]) << 1) | (spread(g[:, 2]) << 2)
        # inactive rays to the back; lights kept in separate segments
        key = jnp.where(msk, key, jnp.int32(2**30 - 1))
        return key + light_id * jnp.int32(2**30)

    nl = meta.n_lights

    @jax.jit
    def sort_shadow(org, sd, mask, offset):
        src = jnp.tile(offset, (nl, 1))
        light_id = jnp.repeat(jnp.arange(nl, dtype=jnp.int32), r)
        key = morton_key(src, mask, light_id)
        idx = jnp.arange(org.shape[0], dtype=jnp.int32)
        ks, ox, oy, oz, dx, dy, dz, ms, ix = jax.lax.sort(
            (key, org[:, 0], org[:, 1], org[:, 2],
             sd[:, 0], sd[:, 1], sd[:, 2], mask, idx),
            num_keys=1,
        )
        o2 = jnp.stack([ox, oy, oz], -1)
        d2 = jnp.stack([dx, dy, dz], -1)
        return o2, d2, ms, ix

    o_s, d_s, m_s, ix = jax.block_until_ready(sort_shadow(org, sd, mask, offset))
    cand_stats(o_s, d_s, m_s, "morton_sorted")

    # --- timings
    t_sort = timeit(lambda: sort_shadow(org, sd, mask, offset)[0])
    print(json.dumps({"time": "sort_with_payload_ms", "ms": t_sort * 1e3}),
          flush=True)

    t_any_uns = timeit(lambda: cluster_any(data, cset, org, sd, t_max, mask))
    print(json.dumps({"time": "anyhit_unsorted_ms", "ms": t_any_uns * 1e3}),
          flush=True)

    t_any_srt = timeit(lambda: cluster_any(data, cset, o_s, d_s, t_max, m_s))
    print(json.dumps({"time": "anyhit_sorted_ms", "ms": t_any_srt * 1e3}),
          flush=True)

    # unsort cost: sort (ix, occ) by ix
    occ = cluster_any(data, cset, o_s, d_s, t_max, m_s)

    @jax.jit
    def unsort(ix, occ):
        _, o = jax.lax.sort((ix, occ.astype(jnp.int32)), num_keys=1)
        return o

    t_unsort = timeit(lambda: unsort(ix, occ))
    print(json.dumps({"time": "unsort_ms", "ms": t_unsort * 1e3}), flush=True)

    # sanity: sorted+unsorted == unsorted path
    occ_ref = cluster_any(data, cset, org, sd, t_max, mask)
    occ_back = unsort(ix, occ)
    agree = bool(jnp.all(jnp.where(mask, occ_ref, False) ==
                         jnp.where(mask, occ_back.astype(bool), False)))
    print(json.dumps({"check": "sorted_occ_matches", "ok": agree}), flush=True)


if __name__ == "__main__":
    main()
