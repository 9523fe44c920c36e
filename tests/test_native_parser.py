"""Parity: the native C++ parser must produce exactly the Python parser's
AST (same values, same defaults, same semantic passes) and matching error
behavior on the strictness cases."""

import math

import pytest

from loltracer_tpu.lol import LolSyntaxError, parse_scene, parse_scene_file
from loltracer_tpu.lol.native import (
    native_available,
    parse_scene_file_native,
    parse_scene_native,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native parser not buildable"
)


@pytest.mark.parametrize(
    "name", ["scene.lol", "scene2.lol", "scene3.lol", "scene4.lol"]
)
def test_examples_parity(examples_dir, name):
    path = str(examples_dir / name)
    py = parse_scene_file(path)
    cc = parse_scene_file_native(path)
    assert py.materials == cc.materials
    assert py.ambient_color == cc.ambient_color
    assert py.lights == cc.lights
    assert py.objects == cc.objects
    assert py.camera.point == cc.camera.point
    for a, b in zip(py.camera.direction, cc.camera.direction):
        assert a == pytest.approx(b, abs=1e-12)
    assert py.camera.fov == pytest.approx(cc.camera.fov, abs=1e-12)


@pytest.mark.parametrize(
    "text",
    [
        "materials { { shininess = 1-2 } } scene { plane { y = 0 } }",
        "materials { { shininess = 1 } } scene { plane { y = 0 } } $",
        "materials { { bogus = 1 } } scene { plane { y = 0 } }",
        "materials { { radius = 1 } } scene { plane { y = 0 } }",
        "materials { { shininess = (1,2) } } scene { plane { y = 0 } }",
        "materials { { shininess = 1 } } scene { sphere { material = #5 } }",
        "materials { { shininess = 1 } } scene { camera { direction = (0,0,0) } }",
        "materials { { shininess = 1 } } scene { smooth_union { smoothness = 1 } }",
    ],
)
def test_error_parity(text):
    with pytest.raises(LolSyntaxError):
        parse_scene(text)
    with pytest.raises(LolSyntaxError):
        parse_scene_native(text)


def test_error_line_number():
    text = "materials {\n  { shininess = 1 }\n}\nscene {\n  plane { y = &0 }\n}"
    with pytest.raises(LolSyntaxError, match="line 5"):
        parse_scene_native(text)


def test_default_camera_parity():
    text = "materials { { shininess = 1 } } scene { plane { y = 0 } }"
    py, cc = parse_scene(text), parse_scene_native(text)
    assert cc.camera.direction == (0.0, 0.0, 1.0)
    assert cc.camera.fov == pytest.approx(math.pi / 2)
    assert py.camera == cc.camera
