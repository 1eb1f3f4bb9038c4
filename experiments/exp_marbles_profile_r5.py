"""Round-5 marbles decomposition: per-op xplane capture of the current
254.6 ms frame (post dense-sphere passes), to target VERDICT item 2.

Aggregates per-op device time over 4 steady frames on the TPU "XLA Ops"
line, grouping by op-name prefix into: closest kernels, shadow kernels,
mask kernels, sort (compaction), fusions/glue.
"""
import sys, os, json, time, glob, collections
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from raytracer_tpu.utils.compile_cache import enable
enable()
from raytracer_tpu.models.bvh import build_bvh
from raytracer_tpu.models.clusters import build_clusters
from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.models import whitted

TRACE_DIR = "/tmp/marbles_trace_r5"


def main():
    data, meta = load_scene("/root/reference/inputs/marbles.xml")
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

    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        s = float(sum(jnp.sum(frame()) for _ in range(n)))
        assert s == s
    xplanes = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
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
            agg[emeta.get(e.metadata_id, "?").split(" = ")[0]] \
                += e.duration_ps
        top = [{"op": name, "ms_per_frame": round(ps / 1e9 / n, 2)}
               for name, ps in agg.most_common(24)]
        print(json.dumps({"top_ops": top}), flush=True)
        groups = collections.Counter()
        for name, ps in agg.items():
            ms = ps / 1e9 / n
            key = ("sort" if "sort" in name
                   else "shadow_kernel" if "shadow" in name
                   else "closest_kernel" if "closest" in name
                   else "mask_kernel" if "mask" in name
                   else "fusion_glue" if "fusion" in name
                   else "other")
            groups[key] += ms
        print(json.dumps({"groups_ms_per_frame":
                          {k: round(v, 2) for k, v in
                           groups.most_common()}}), flush=True)


main()
