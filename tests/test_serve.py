"""Render-server tests (raytracer_tpu/serve.py): in-process request
handling, scene/accel caching, error reporting, and the JSON-lines
stdin protocol in a real subprocess."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from raytracer_tpu.serve import RenderServer
from raytracer_tpu.utils.ppm import read_ppm

SIMPLE = "/root/reference/inputs/simple.xml"
CORNELL = "/root/reference/inputs/cornellbox.xml"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def server():
    return RenderServer(max_scenes=2)


def test_ping_and_stats(server):
    assert server.handle({"cmd": "ping"})["ok"]
    st = server.handle({"cmd": "stats"})
    assert st["ok"] and "scenes_cached" in st


def test_render_matches_cli_path(server, tmp_path):
    r = server.handle({"scene": SIMPLE, "out_dir": str(tmp_path),
                       "ssaa": 1, "id": "req-1"})
    assert r["ok"], r
    assert r["id"] == "req-1"
    assert len(r["images"]) == 1
    img = read_ppm(r["images"][0])
    gold = read_ppm("/root/reference/outputs/simple.ppm")
    diff = np.abs(img.astype(int) - gold.astype(int))
    assert diff.max() <= 1  # the reference binary itself is within +-1 here


def test_scene_cache_reuse_and_lru(server, tmp_path):
    n0 = server.handle({"cmd": "stats"})["scenes_cached"]
    server.handle({"scene": SIMPLE, "out_dir": str(tmp_path)})
    assert server.handle({"cmd": "stats"})["scenes_cached"] == max(n0, 1)
    # a different engine is a different cache entry
    server.handle({"scene": SIMPLE, "out_dir": str(tmp_path),
                   "engine": "brute"})
    assert server.handle({"cmd": "stats"})["scenes_cached"] == 2
    # capacity 2: a third entry evicts the oldest
    server.handle({"scene": CORNELL, "out_dir": str(tmp_path),
                   "camera": 0})
    assert server.handle({"cmd": "stats"})["scenes_cached"] == 2


def test_camera_index(server, tmp_path):
    r = server.handle({"scene": CORNELL, "out_dir": str(tmp_path),
                       "camera": 1})
    assert r["ok"], r
    assert len(r["images"]) == 1


def test_error_reported_not_raised(server, tmp_path):
    r = server.handle({"scene": "/nonexistent.xml",
                       "out_dir": str(tmp_path), "id": 7})
    assert not r["ok"]
    assert r["id"] == 7
    assert "error" in r


def test_tone_request(server, tmp_path):
    r = server.handle({"scene": SIMPLE, "out_dir": str(tmp_path),
                       "format": "png", "tone": "aces"})
    assert r["ok"], r
    assert r["images"][0].endswith(".png")
    assert os.path.getsize(r["images"][0]) > 0


def test_stdin_protocol_subprocess(tmp_path):
    reqs = "\n".join([
        json.dumps({"cmd": "ping"}),
        json.dumps({"scene": SIMPLE, "out_dir": str(tmp_path),
                    "ssaa": 1, "id": "sub"}),
        json.dumps({"cmd": "shutdown"}),
    ]) + "\n"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu'); "
         "from raytracer_tpu.serve import main; main([])"],
        input=reqs, capture_output=True, text=True, timeout=600, env=env,
    )
    lines = [json.loads(l) for l in out.stdout.strip().splitlines()]
    assert lines[0] == {"ready": True}
    assert lines[1]["ok"] and "pong" in lines[1]
    assert lines[2]["ok"] and lines[2]["id"] == "sub", lines[2]
    assert lines[3]["ok"] and lines[3]["shutdown"]
    assert os.path.exists(os.path.join(str(tmp_path), "simple.ppm"))


def test_bad_ssaa_mode_rejected(server, tmp_path):
    """Typos must produce an error response, not a silently different
    render (code-review finding: 'pairty' used to render as mean SSAA)."""
    r = server.handle({"scene": SIMPLE, "out_dir": str(tmp_path),
                       "ssaa": 2, "ssaa_mode": "pairty"})
    assert not r["ok"] and "ssaa_mode" in r["error"]


def test_adaptive_via_server(server, tmp_path):
    r = server.handle({"scene": SIMPLE, "out_dir": str(tmp_path),
                       "ssaa_mode": "adaptive", "ssaa": 2,
                       "adaptive_rounds": 2, "engine": "brute"})
    assert r["ok"], r
    assert r["adaptive"]["rounds"] == 2


def test_server_mesh_matches_single_device(reference_inputs, tmp_path):
    """--mesh auto (the default, 8 devices under conftest) must produce
    bitwise the same image as a single-device server."""
    import numpy as np

    from raytracer_tpu.serve import RenderServer
    from raytracer_tpu.utils.ppm import read_ppm

    req = {"scene": f"{reference_inputs}/simple_shading.xml", "ssaa": 1,
           "engine": "cluster"}
    r1 = RenderServer(mesh="1").handle(
        dict(req, out_dir=str(tmp_path / "one")))
    rn = RenderServer(mesh="auto").handle(
        dict(req, out_dir=str(tmp_path / "mesh")))
    assert r1["ok"] and rn["ok"], (r1, rn)
    a = read_ppm(str(tmp_path / "one" / "simple_shading.ppm"))
    b = read_ppm(str(tmp_path / "mesh" / "simple_shading.ppm"))
    np.testing.assert_array_equal(a, b)
