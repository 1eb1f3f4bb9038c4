"""Warm render server: ``python -m raytracer_tpu.serve [options]``.

The reference is a one-shot CLI whose entire cost is the render
(0.45 s, /root/reference/raytracer.cpp:487-525).  A jit-compiled TPU
renderer inverts that profile: the first render of a (scene-shape,
resolution) pays tens of seconds of XLA compilation, every later one
runs at device speed.  The serving answer is a RESIDENT process: scenes,
acceleration structures, and compiled executables stay warm across
requests, so a render farm / preview loop / parameter sweep pays
compilation once per shape instead of once per invocation (the
persistent compile cache in utils/compile_cache.py additionally
de-duplicates across processes).

Protocol: JSON lines.  Requests arrive one per line on stdin (or a TCP
socket with --port), responses leave one per line on stdout (or the
socket).  Request fields:

    {"scene": "path/to/scene.xml",        # required
     "out_dir": ".",                      # where images are written
     "ssaa": 1, "ssaa_mode": "parity",    # like the CLI flags
     "engine": "auto", "bfc": false,
     "format": "ppm",                     # ppm | png | exr
     "tone": "none",                      # none|gamma|reinhard|aces (ldr)
     "camera": null,                      # index, or null = all cameras
     "relaxed_parity": false,             # sqrt/div-free sphere occlusion
     "id": "anything"}                    # echoed back, optional

The server renders on ALL local devices by default (--mesh auto; the
ray axis of every band is shard_map'ed like the render CLI, output
bitwise-identical to single-device).

Commands: {"cmd": "ping"} -> {"ok": true, "pong": ...};
{"cmd": "stats"} -> cache/occupancy info; {"cmd": "shutdown"} ends the
loop.  Responses: {"ok": true, "id": ..., "images": [...],
"render_s": ..., "mrays_per_s": ...} or {"ok": false, "error": "..."}.

Scene + accel caching is keyed on (realpath, mtime): editing a scene
file invalidates its entry, re-requesting reuses device-resident
structures (and XLA's jit cache keeps the compiled render for any
previously seen resolution).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Optional

import numpy as np


class RenderServer:
    """In-process render service with scene/accel caching.

    Separable from the I/O loop so tests (and library users) can drive
    it directly: ``RenderServer().handle({"scene": ...})``.
    """

    def __init__(self, max_scenes: int = 8, mesh: str = "auto"):
        import jax

        from raytracer_tpu.utils.compile_cache import enable

        enable()
        self.max_scenes = max_scenes
        self._scenes = {}  # (path, mtime) -> (data, meta, accel), LRU order
        self.renders = 0
        # device mesh: like the render CLI, all local chips by default
        # (the reference's hardware_concurrency() analog)
        del jax  # devices queried inside mesh_from_arg
        from raytracer_tpu.parallel.mesh import mesh_from_arg

        self.mesh = mesh_from_arg(mesh)

    # -- scene/accel cache ------------------------------------------------
    def _load(self, scene_path: str, engine: str):
        import jax

        from raytracer_tpu.models.bvh import build_bvh
        from raytracer_tpu.models.clusters import build_clusters
        from raytracer_tpu.models.scene import load_scene

        path = os.path.realpath(scene_path)
        key = (path, os.stat(path).st_mtime, engine)
        if key in self._scenes:
            val = self._scenes.pop(key)
            self._scenes[key] = val  # refresh LRU position
            return val
        sharding = None
        if self.mesh is not None:
            from raytracer_tpu.parallel.mesh import replicated

            sharding = replicated(self.mesh)
        put = (jax.device_put if sharding is None
               else lambda x: jax.device_put(x, sharding))
        data, meta = load_scene(path)
        data = put(data)
        accel = None
        if engine != "brute":
            bvh = build_bvh(data, meta)
            accel = put(
                bvh if engine == "bvh" else build_clusters(data, meta, bvh)
            )
        self._scenes[key] = (data, meta, accel)
        while len(self._scenes) > self.max_scenes:
            self._scenes.pop(next(iter(self._scenes)))
        return data, meta, accel

    # -- request handling --------------------------------------------------
    def handle(self, req: dict) -> dict:
        cmd = req.get("cmd")
        if cmd == "ping":
            return {"ok": True, "pong": time.time()}
        if cmd == "stats":
            return {
                "ok": True,
                "scenes_cached": len(self._scenes),
                "renders": self.renders,
            }
        if cmd == "shutdown":
            return {"ok": True, "shutdown": True}
        try:
            return self._render(req)
        except Exception as e:  # noqa: BLE001 — a server reports, not dies
            return {"ok": False, "id": req.get("id"),
                    "error": f"{type(e).__name__}: {e}"}

    def _render(self, req: dict) -> dict:
        from raytracer_tpu.pipeline import render_one_camera, write_image

        scene = req["scene"]
        engine = req.get("engine", "auto")
        fmt = req.get("format", "ppm")
        out_dir = req.get("out_dir", ".")
        ssaa = int(req.get("ssaa", 1))
        cam_idx = req.get("camera")
        os.makedirs(out_dir, exist_ok=True)

        data, meta, accel = self._load(scene, engine)
        cams = meta.cameras if cam_idx is None else [meta.cameras[cam_idx]]
        images = []
        rays = 0
        adaptive_stats = None
        t0 = time.perf_counter()
        for cam in cams:
            img, adaptive_stats = render_one_camera(
                data, meta, cam, accel, engine=engine, ssaa=ssaa,
                ssaa_mode=req.get("ssaa_mode", "parity"),
                bfc=bool(req.get("bfc", False)),
                chunk=int(req.get("chunk", 1 << 22)),
                tone=req.get("tone", "none"), hdr=fmt == "exr",
                seed=int(req.get("seed", 0)),
                adaptive_frac=float(req.get("adaptive_frac", 0.125)),
                adaptive_extra=req.get("adaptive_extra"),
                adaptive_rounds=int(req.get("adaptive_rounds", 1)),
                mesh=self.mesh,
                relaxed=bool(req.get("relaxed_parity", False)),
            )
            images.append(write_image(out_dir, cam.image_name, img, fmt))
            rcam = cam.scaled(ssaa) if ssaa > 1 else cam
            rays += rcam.width * rcam.height
        dt = time.perf_counter() - t0
        self.renders += len(cams)
        resp = {
            "ok": True,
            "id": req.get("id"),
            "images": images,
            "render_s": round(dt, 4),
            "mrays_per_s": round(rays / dt / 1e6, 3),
        }
        if adaptive_stats is not None:
            resp["adaptive"] = adaptive_stats
        return resp


def _serve_stream(server: RenderServer, rfile, wfile) -> bool:
    """Pump one JSON-lines stream.  Returns True if shutdown requested."""
    for line in rfile:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
        except json.JSONDecodeError as e:
            resp = {"ok": False, "error": f"bad json: {e}"}
        else:
            resp = server.handle(req)
        wfile.write(json.dumps(resp) + "\n")
        wfile.flush()
        if resp.get("shutdown"):
            return True
    return False


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(
        description="raytracer_tpu render server (JSON lines)")
    ap.add_argument("--port", type=int, default=None,
                    help="listen on TCP 127.0.0.1:PORT instead of stdin")
    ap.add_argument("--max-scenes", type=int, default=8,
                    help="scene/accel LRU cache capacity")
    ap.add_argument("--mesh", default="auto", metavar="auto|N",
                    help="device mesh size: 'auto' (default) shards every "
                         "render over all local devices (1 = single)")
    ap.add_argument("--warmup", metavar="SCENE", default=None,
                    help="render this scene once at startup (to /tmp) so "
                         "the first request is already compiled")
    args = ap.parse_args(argv)

    server = RenderServer(max_scenes=args.max_scenes, mesh=args.mesh)
    if args.warmup:
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            r = server.handle({"scene": args.warmup, "out_dir": td})
            print(json.dumps({"warmup": r.get("ok"),
                              "render_s": r.get("render_s")}),
                  file=sys.stderr, flush=True)

    if args.port is None:
        print(json.dumps({"ready": True}), flush=True)
        _serve_stream(server, sys.stdin, sys.stdout)
        return

    import socket

    sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    sock.bind(("127.0.0.1", args.port))
    sock.listen(4)
    print(json.dumps({"ready": True, "port": sock.getsockname()[1]}),
          flush=True)
    try:
        while True:
            conn, _ = sock.accept()
            with conn:
                rfile = conn.makefile("r", encoding="utf-8")
                wfile = conn.makefile("w", encoding="utf-8")
                try:
                    if _serve_stream(server, rfile, wfile):
                        break
                except OSError as e:
                    # a client dropping mid-stream (BrokenPipe /
                    # ConnectionReset) must never kill the warm server —
                    # its whole value is the resident compiled state
                    print(json.dumps({"client_error": str(e)}),
                          file=sys.stderr, flush=True)
    finally:
        sock.close()


if __name__ == "__main__":
    main()
