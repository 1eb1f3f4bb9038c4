"""Inverse-rendering CLI smoke test (VERDICT round-3 item 6).

Renders a ground-truth image from simple.xml, perturbs the scene's
diffuse albedo in a copied XML, then drives ``python -m
raytracer_tpu.train`` to recover it from the target — the same task as
tests/test_grad.py::test_inverse_rendering_recovers_diffuse, but through
the product CLI (sharded train step over the conftest's 8-device CPU
mesh, checkpoint write, recovered render output).
"""

import re

import numpy as np

from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.models.whitted import render_camera
from raytracer_tpu.ops.image import quantize
from raytracer_tpu.utils.ppm import read_ppm, write_ppm


def test_train_cli_recovers_diffuse(reference_inputs, tmp_path, capsys):
    import dataclasses

    from raytracer_tpu.train import main

    # ground-truth target at 100x100 (downscale 8 of 800x800)
    data, meta = load_scene(f"{reference_inputs}/simple.xml")
    cam = dataclasses.replace(meta.cameras[0], width=100, height=100)
    target = np.asarray(quantize(render_camera(data, meta, cam,
                                               engine="brute")))
    tpath = str(tmp_path / "target.ppm")
    write_ppm(tpath, target)

    # perturb the (single) material's diffuse albedo in a copied XML
    xml = open(f"{reference_inputs}/simple.xml").read()
    xml2, n = re.subn(r"<DiffuseReflectance>[^<]*</DiffuseReflectance>",
                      "<DiffuseReflectance>0.3 0.3 0.35</DiffuseReflectance>",
                      xml)
    assert n >= 1
    spath = str(tmp_path / "perturbed.xml")
    open(spath, "w").write(xml2)

    ckpt = str(tmp_path / "state.npz")
    out = str(tmp_path / "recovered.ppm")
    main([spath, "--target", tpath, "--downscale", "8",
          "--fields", "mat_diffuse", "--engine", "brute",
          "--steps", "60", "--lr", "3e-2", "--checkpoint", ckpt,
          "--out", out, "--log-every", "30"])
    text = capsys.readouterr().out
    losses = [float(m) for m in re.findall(r"loss (\d+\.\d+)", text)]
    assert losses[-1] < losses[0] * 0.05, losses
    assert (tmp_path / "state.npz").exists()
    recovered = read_ppm(out)
    # the recovered render should be close to the target (quantization +
    # residual optimization error only)
    err = np.abs(recovered.astype(int) - target.astype(int))
    assert np.mean(err) < 3.0, np.mean(err)


def test_train_cli_batch_mode_exr_target(reference_inputs, tmp_path, capsys):
    """Minibatch steps (--batch) + a linear-float EXR target (no LDR
    clamp in the loss) still recover the albedo through the CLI."""
    import dataclasses
    import re as _re

    from raytracer_tpu.train import main
    from raytracer_tpu.utils.exr import write_exr

    data, meta = load_scene(f"{reference_inputs}/simple.xml")
    cam = dataclasses.replace(meta.cameras[0], width=100, height=100)
    target = np.asarray(render_camera(data, meta, cam, engine="brute"))
    tpath = str(tmp_path / "target.exr")
    write_exr(tpath, target.astype(np.float32))

    xml = open(f"{reference_inputs}/simple.xml").read()
    xml2 = re.sub(r"<DiffuseReflectance>[^<]*</DiffuseReflectance>",
                  "<DiffuseReflectance>0.4 0.35 0.3</DiffuseReflectance>",
                  xml)
    spath = str(tmp_path / "perturbed.xml")
    open(spath, "w").write(xml2)

    main([spath, "--target", tpath, "--downscale", "8",
          "--fields", "mat_diffuse", "--engine", "brute",
          "--steps", "80", "--lr", "5e-2", "--batch", "2048",
          "--log-every", "40", "--seed", "3"])
    text = capsys.readouterr().out
    losses = [float(m) for m in _re.findall(r"loss (\d+\.\d+)", text)]
    # minibatch loss is noisy; require an order-of-magnitude drop
    assert losses[-1] < losses[0] * 0.1, losses
