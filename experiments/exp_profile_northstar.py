"""North-star confrontation: PROFILER evidence for where horse_and_mug's
frame time goes and what the chip can theoretically issue (VERDICT
round-3 item 4 — replace scan-timing inference with a jax.profiler
capture + a measured VPU speed-of-light probe, then revise or affirm
BASELINE.json's 1e9 rays/s/chip target with numbers).

Outputs (JSON lines):
  1. per-op device time for a steady-state horse_and_mug frame, from the
     xplane capture (top ops, grouped),
  2. a Pallas VPU speed-of-light probe: a pure chained-FMA kernel over
     VMEM-resident vregs -> achieved f32 lane-ops/s ceiling,
  3. the frame's visited-pair count (from the actual shortlists) ->
     implied pair-work at the probe ceiling vs the measured frame ->
     vector-issue occupancy of the visit kernels,
  4. the arithmetic for the 1e9 target: rays/s at the probe ceiling
     given the measured pairs/ray and ops/pair.
"""
import sys, os, json, time, glob, functools
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from raytracer_tpu.utils.compile_cache import enable
enable()
from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters, CLUSTER
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.models import whitted
from raytracer_tpu.ops import cluster_trace as ct

TRACE_DIR = "/tmp/northstar_trace"


def vpu_probe(chain=256, streams=8, rows=256, iters=20):
    """Pure VPU f32 FMA issue-rate probe: (8*rows, 128) block, `streams`
    INDEPENDENT accumulator chains of `chain` FMAs each (a single
    dependent chain measures FMA latency, not issue rate) — the
    achievable f32 lane-op ceiling with zero memory traffic."""
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        accs = [x * (1.0 + 1e-7 * k) + 0.3 for k in range(streams)]
        for _ in range(chain - 1):
            accs = [a * 1.0000001 + x for a in accs]
        out = accs[0]
        for a in accs[1:]:
            out = out + a
        o_ref[...] = out

    x = jnp.ones((8 * rows, 128), jnp.float32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )

    @jax.jit
    def many(x):
        def step(acc, _):
            return acc + jnp.sum(f(x)) * 1e-30, None
        acc, _ = jax.lax.scan(step, jnp.float32(0), None, length=iters)
        return acc

    float(many(x))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(x))
        best = min(best, time.perf_counter() - t0)
    lane_ops = 2.0 * chain * streams * x.size * iters  # FMA = mul+add
    return lane_ops / best


def frame_pairs(data, meta, cset, cam):
    """Visited (ray, primitive-slot) pairs per frame from the ACTUAL
    shortlists: walk the wavefront like whitted.render_rays and sum
    hit-mask counts x TILE x CLUSTER per wave (+ the dense small-sphere
    R x n_sph work)."""
    from raytracer_tpu.ops.camera import camera_vectors, eye_rays_band
    from raytracer_tpu.ops.cluster_trace import (
        TILE, build_shadow_planes, cluster_closest_hit, ray_cluster_mask,
        tile_cluster_mask,
    )
    from raytracer_tpu.ops.shade import Hit, reflection_rays
    from raytracer_tpu.ops.tiling import block_permutation

    origin, dirs = eye_rays_band(jnp.asarray(camera_vectors(cam)),
                                 cam.width, cam.height, jnp.float32(0),
                                 cam.height)
    perm, _ = block_permutation(cam.height, cam.width, 8, 16)
    dirs = jnp.asarray(dirs)[jnp.asarray(perm)]
    pad = (-dirs.shape[0]) % (TILE * 8)  # mask path needs tile*TPB
    if pad:
        dirs = jnp.concatenate(
            [dirs, jnp.broadcast_to(dirs[-1:], (pad, 3))], 0)
    origin0 = jnp.asarray(origin, jnp.float32)
    r = dirs.shape[0]
    eps = meta.shadow_eps
    pairs = 0.0
    waves = []

    def mask_pairs(o, d, act, mask_fn, t_hi=None):
        hit, _ = mask_fn(jnp.broadcast_to(o, d.shape), d, act,
                         cset.tri_cmin, cset.tri_cmax, t_hi, TILE)
        return float(jnp.sum(hit.astype(jnp.float32))) * TILE * CLUSTER

    # eye wave (interval mask, like production)
    p = mask_pairs(origin0, dirs, None, tile_cluster_mask)
    pairs += p; waves.append(("c0", p))
    fhit, t_, n_, m_, p_, off, prim = jax.jit(
        lambda d: cluster_closest_hit(cset, origin0, d, eps,
                                      shared_origin=True))(dirs)
    hh = Hit(hit=fhit, t=t_, normal=n_, mat=m_, point=p_, offset=off)
    act = None
    dcur = dirs
    lp = data.light_pos
    for b in range(meta.max_depth + 1):
        # shadow waves at this bounce (per light, from offset points)
        for l in range(meta.n_lights):
            seg = lp[l][None] - hh.offset
            m = hh.hit if act is None else (hh.hit & act)
            # shadow masks trace from the offset point: origin per-ray
            hit, _ = ray_cluster_mask(hh.offset, seg, m, cset.tri_cmin,
                                      cset.tri_cmax, jnp.ones((r,)), TILE)
            p = float(jnp.sum(hit.astype(jnp.float32))) * TILE * CLUSTER
            pairs += p; waves.append((f"sh{b}l{l}", p))
        if b == meta.max_depth:
            break
        o2, d2, _, is_m = jax.jit(
            lambda dd, h: reflection_rays(data, dd, h))(dcur, hh)
        act = is_m if act is None else (act & is_m)
        if float(jnp.sum(act.astype(jnp.float32))) == 0:
            break
        hit, _ = ray_cluster_mask(o2, d2, act, cset.tri_cmin,
                                  cset.tri_cmax, None, TILE)
        p = float(jnp.sum(hit.astype(jnp.float32))) * TILE * CLUSTER
        pairs += p; waves.append((f"c{b + 1}", p))
        fh, tt, nn, mm, pp, oo, pr = jax.jit(
            lambda o_, d_, a: cluster_closest_hit(cset, o_, d_, eps,
                                                  active=a))(o2, d2, act)
        hh = Hit(hit=fh & act, t=tt, normal=nn, mat=mm, point=pp, offset=oo)
        dcur = d2
    # dense small-sphere tests ride every closest wave
    n_waves_closest = sum(1 for w, _ in waves if w.startswith("c"))
    pairs += float(r * cset.n_sph * n_waves_closest)
    return pairs, waves


def main():
    data, meta = load_scene("/root/reference/inputs/horse_and_mug.xml")
    cset = jax.device_put(build_clusters(data, meta, build_bvh(data, meta)))
    data = jax.device_put(data)
    cam = meta.cameras[0]

    def frame():
        return whitted.render_camera(data, meta, cam, bvh=cset,
                                     engine="cluster", chunk=1 << 21)

    for _ in range(3):
        float(jnp.sum(frame()))
    n = 4
    t0 = time.perf_counter()
    s = float(sum(jnp.sum(frame()) for _ in range(n)))
    assert s == s
    frame_s = (time.perf_counter() - t0) / n
    print(json.dumps({"frame_ms": round(frame_s * 1e3, 1),
                      "mrays_per_s": round(
                          cam.width * cam.height / frame_s / 1e6, 2)}),
          flush=True)

    # 1. profiler capture of 4 steady-state frames
    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        s = float(sum(jnp.sum(frame()) for _ in range(n)))
        assert s == s
    xplanes = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    print(json.dumps({"xplane_files": xplanes}), flush=True)
    if xplanes:
        try:
            # parse the raw xplane directly (the tensorboard plugin's
            # converter API is version-broken in this image); aggregate
            # per-op device time on the TPU "XLA Ops" line over the 4
            # captured frames
            import collections

            from tensorflow.tsl.profiler.protobuf import xplane_pb2

            xs = xplane_pb2.XSpace()
            xs.ParseFromString(open(xplanes[0], "rb").read())
            tpu = [p for p in xs.planes if p.name == "/device:TPU:0"][0]
            emeta = {m.id: m.name for m in tpu.event_metadata.values()}
            for line in tpu.lines:
                if line.name != "XLA Ops":
                    continue
                agg = collections.Counter()
                for e in line.events:
                    agg[emeta.get(e.metadata_id, "?")] += e.duration_ps
                top = [
                    {"op": name.split(" = ")[0], "ms_per_frame":
                     round(ps / 1e9 / n, 2)}
                    for name, ps in agg.most_common(16)
                ]
                print(json.dumps({"top_ops": top}), flush=True)
        except Exception as e:
            print(json.dumps({"op_stats_error": repr(e)}), flush=True)

    # 2. VPU speed-of-light probe
    ceiling = vpu_probe()
    print(json.dumps({"vpu_probe_lane_ops_per_s": f"{ceiling:.3e}"}),
          flush=True)

    # 3. visited pairs per frame
    pairs, waves = frame_pairs(data, meta, cset, cam)
    print(json.dumps({"visited_pairs_per_frame": f"{pairs:.3e}",
                      "waves": [(w, f"{p:.2e}") for w, p in waves]}),
          flush=True)

    # 4. the target arithmetic
    rays = cam.width * cam.height
    ops_per_pair = 22.0  # Wald tri eval in-kernel (models/clusters.py)
    kernel_floor_s = pairs * ops_per_pair / ceiling
    print(json.dumps({
        "ops_per_pair_assumed": ops_per_pair,
        "kernel_floor_ms_at_probe_ceiling": round(kernel_floor_s * 1e3, 2),
        "frame_ms_measured": round(frame_s * 1e3, 1),
        "visit_issue_occupancy_bound": round(kernel_floor_s / frame_s, 3),
        "mrays_per_s_at_ceiling_current_pairs": round(
            rays / kernel_floor_s / 1e6, 1),
        "pairs_per_primary_ray": round(pairs / rays, 1),
    }), flush=True)


main()
