"""Scalability envelope (VERDICT round-4 item 4): sweep scene size until
something breaks, recording accel BUILD time (the reference records its
build: 0.08 s at 31.6k tris, bvh.h:29-32), frame time, and which
mechanism engages/fails first (hierarchical mask, cluster-axis
segmentation, SMEM shortlist budget, host build memory).

Terrain (triangle-heavy): 0.5M -> 2M -> 4M -> 8M tris.
Sphere field (marbles at scale): 20k -> 100k -> 500k -> 1M spheres.
Rendered at 512^2, cluster engine, one real chip.
"""
import sys, os, json, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from raytracer_tpu.utils.compile_cache import enable
enable()
from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters, CLUSTER
from raytracer_tpu.models.whitted import render_camera
from raytracer_tpu.ops import cluster_trace as ct
from raytracer_tpu.utils.synth import sphere_field, terrain_scene


def run(kind, maker, size):
    row = {"kind": kind, "size": size}
    try:
        t0 = time.perf_counter()
        data, meta = maker(size)
        row["n_prims"] = meta.n_tris + meta.n_spheres
        t1 = time.perf_counter()
        bvh = build_bvh(data, meta)
        t2 = time.perf_counter()
        cset = build_clusters(data, meta, bvh)
        t3 = time.perf_counter()
        row["bvh_build_s"] = round(t2 - t1, 3)
        row["cluster_build_s"] = round(t3 - t2, 3)
        ctp = -(-cset.tri_cmin.shape[0] // 128) * 128
        csp = -(-cset.sph_cmin.shape[0] // 128) * 128
        row["cluster_cols_tri"] = int(ctp)
        row["cluster_cols_sph"] = int(csp)
        row["hier_mask"] = bool(max(ctp, csp) > ct._SUPER_MIN_CPAD)
        # segmentation applies to the TRIANGLE slot axis only; the
        # sphere table rides whole (4 rows x Ps) into every kernel
        row["tri_segments"] = int(-(-cset.tri_dat.shape[1]
                                    // ct.SEG_SLOTS))
        row["sphere_slots_whole"] = int(cset.sph_dat.shape[1])
        row["accel_hbm_mb"] = round(sum(
            np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(cset)
        ) / 1e6, 1)
        cset = jax.device_put(cset)
        data = jax.device_put(data)
        cam = meta.cameras[0]

        def frame():
            return render_camera(data, meta, cam, bvh=cset,
                                 engine="cluster", chunk=1 << 21)

        t4 = time.perf_counter()
        float(jnp.sum(frame()))
        row["first_frame_s"] = round(time.perf_counter() - t4, 2)
        reps = 3
        t5 = time.perf_counter()
        s = float(sum(jnp.sum(frame()) for _ in range(reps)))
        assert s == s, "NaN frame"
        dt = (time.perf_counter() - t5) / reps
        row["frame_ms"] = round(dt * 1e3, 1)
        row["mrays_per_s"] = round(cam.width * cam.height / dt / 1e6, 2)
        row["ok"] = True
    except Exception as e:  # noqa: BLE001 — the wall IS the datum
        row["ok"] = False
        row["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        traceback.print_exc(limit=3, file=sys.stderr)
    print(json.dumps(row), flush=True)
    return row.get("ok", False)


def run_retry(kind, maker, size, tries=2):
    """Retry once: the axon remote-compile endpoint can fail transiently
    (HTTP 500); a wall is only a wall if it reproduces."""
    for t in range(tries):
        if run(kind, maker, size):
            return True
        if t + 1 < tries:
            print(json.dumps({"kind": kind, "size": size,
                              "retrying": t + 2}), flush=True)
            time.sleep(30)
    return False


def terrain_of(cells):
    return terrain_scene(cells=cells, res=512)


def spheres_of(n):
    return sphere_field(n_spheres=n, res=512)


sizes_t = [int(s) for s in os.environ.get(
    "ENVELOPE_TERRAIN", "500,707,1000,1414,2000").split(",") if s]
sizes_s = [int(s) for s in os.environ.get(
    "ENVELOPE_SPHERES", "20000,100000,250000,500000,1000000").split(",")
    if s]
for cells in sizes_t:
    if not run_retry("terrain", terrain_of, cells):
        break
for n in sizes_s:
    if not run_retry("sphere_field", spheres_of, n):
        break
