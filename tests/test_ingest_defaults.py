"""XML ingest defaults and tolerance (parser.cpp:24-57 semantics)."""

import textwrap

from raytracer_tpu.models.scene import load_scene
from raytracer_tpu.utils.xml_ingest import parse_xml


def _write(tmp_path, body: str) -> str:
    p = tmp_path / "scene.xml"
    p.write_text(textwrap.dedent(body))
    return str(p)


MINIMAL = """\
    <Scene>
        <Cameras>
            <Camera id="1">
                <Position>0 0 0</Position>
                <Gaze>0 0 -1</Gaze>
                <Up>0 1 0</Up>
                <NearPlane>-1 1 -1 1</NearPlane>
                <NearDistance>1</NearDistance>
                <ImageResolution>8 8</ImageResolution>
                <ImageName>out.ppm</ImageName>
            </Camera>
        </Cameras>
        <Lights>
            <AmbientLight>10 10 10</AmbientLight>
        </Lights>
        <Materials>
            <Material id="1">
                <DiffuseReflectance>1 0 0</DiffuseReflectance>
            </Material>
        </Materials>
        <VertexData>
            0 0 -5
            1 0 -5
            0 1 -5
        </VertexData>
        <Objects>
            <Triangle id="1">
                <Material>1</Material>
                <Indices>1 2 3</Indices>
            </Triangle>
        </Objects>
    </Scene>
"""


def test_scene_level_defaults(tmp_path):
    parsed = parse_xml(_write(tmp_path, MINIMAL))
    assert parsed["background"] == [0, 0, 0]          # parser.cpp:24-34
    assert parsed["shadow_eps"] == 0.001              # parser.cpp:36-46
    assert parsed["max_depth"] == 0                   # parser.cpp:48-57
    assert parsed["point_lights"] == []
    assert parsed["spheres"] == []


def test_material_defaults(tmp_path):
    parsed = parse_xml(_write(tmp_path, MINIMAL))
    (mat,) = parsed["materials"]
    assert mat["ambient"] == [0, 0, 0]
    assert mat["mirror"] == [0, 0, 0]
    assert mat["is_mirror"] is False


def test_minimal_scene_renders(tmp_path):
    import numpy as np

    from raytracer_tpu.models.whitted import render_camera

    data, meta = load_scene(_write(tmp_path, MINIMAL))
    img = np.asarray(render_camera(data, meta, meta.cameras[0], engine="brute"))
    assert img.shape == (8, 8, 3)
    assert np.isfinite(img).all()
