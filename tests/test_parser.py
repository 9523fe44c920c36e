"""Parser tests: the four reference example scenes parse to the expected ASTs
(fixture values cross-checked against examples/*.lol and the reference's
semantic passes in scene.c), plus strictness error cases."""

import math

import pytest

from loltracer_tpu.lol import (
    Box,
    Camera,
    Light,
    LolSyntaxError,
    Material,
    Plane,
    SmoothUnion,
    Sphere,
    parse_scene,
    parse_scene_file,
)


def test_scene1(examples_dir):
    s = parse_scene_file(str(examples_dir / "scene.lol"))
    assert len(s.materials) == 5
    assert s.materials[0] == Material(4.0, (0, 0, 0), (0, 0, 0), (0, 0, 0))
    assert s.materials[2].shininess == 50.0
    assert s.materials[2].diffuse == (0.0, 0.2, 0.0)
    assert s.ambient_color == (0.03, 0.03, 0.03)
    assert s.camera.point == (0.0, 0.0, 0.0)
    assert s.camera.direction == (0.0, 0.0, -1.0)
    assert s.camera.fov == pytest.approx(150.0 / 180.0 * math.pi)
    assert len(s.lights) == 1
    assert s.lights[0] == Light((-2, 10, -1), (4, 4, 4), (4, 4, 4))
    assert len(s.objects) == 4
    assert s.objects[0] == Sphere(point=(0, 1, -6), radius=1.0, material=1)
    assert s.objects[1] == Sphere(point=(-1, 0.5, -3), radius=1.0, material=2)
    assert s.objects[2] == Box(
        point=(2, 2, -10), point2=(2, 2, 2), radius=0.6, material=3
    )
    assert s.objects[3] == Plane(y=-1.0, material=4)
    assert s.validate_materials()


def test_scene2(examples_dir):
    s = parse_scene_file(str(examples_dir / "scene2.lol"))
    assert len(s.materials) == 3
    assert len(s.lights) == 2
    assert [type(o) for o in s.objects] == [Sphere, Sphere, Sphere, Plane]
    assert s.camera.fov == pytest.approx(math.pi / 2)


def test_scene3_nested_smooth_union(examples_dir):
    s = parse_scene_file(str(examples_dir / "scene3.lol"))
    assert len(s.objects) == 2
    su = s.objects[0]
    assert isinstance(su, SmoothUnion)
    assert su.smoothness == 4.0
    assert su.material == 1
    assert su.a == Sphere(point=(0, 0, -4), radius=4.0, material=0)
    assert su.b == Sphere(point=(0, 0, -12), radius=4.0, material=0)
    assert s.objects[1] == Plane(y=-4.0, material=2)
    # camera point is non-origin here
    assert s.camera.point == (0.0, 1.0, 3.0)


def test_scene4_deep_csg(examples_dir):
    s = parse_scene_file(str(examples_dir / "scene4.lol"))
    su = s.objects[0]
    assert isinstance(su, SmoothUnion)
    assert isinstance(su.a, SmoothUnion)
    assert isinstance(su.b, SmoothUnion)
    assert isinstance(su.b.b, SmoothUnion)
    # 5 sphere leaves in the CSG tree (2 + 1 + 2 across the nested unions)
    def leaves(o):
        if isinstance(o, SmoothUnion):
            return leaves(o.a) + leaves(o.b)
        return [o]

    assert len(leaves(su)) == 5
    assert all(isinstance(l, Sphere) for l in leaves(su))
    # tilted camera direction is normalized (scene.c:173)
    d = s.camera.direction
    assert math.sqrt(sum(c * c for c in d)) == pytest.approx(1.0)
    raw = (0.3, -0.7, -1.0)
    n = math.sqrt(sum(c * c for c in raw))
    for got, want in zip(d, raw):
        assert got == pytest.approx(want / n)


MINIMAL = """
materials {
    { shininess = 1, diffuse = (0.1, 0.2, 0.3) }
}
scene {
    sphere { point = (0, 0, -5), radius = 1, material = #0 }
}
"""


def test_minimal_scene_defaults():
    s = parse_scene(MINIMAL)
    # no camera block -> scene_new defaults (scene.c:51-55)
    assert s.camera == Camera(
        point=(0, 0, 0), direction=(0, 0, 1), fov=math.pi / 2
    )
    assert s.ambient_color == (0.0, 0.0, 0.0)
    # unspecified material slots default to zero (memset, scene.c:118)
    assert s.materials[0].specular == (0.0, 0.0, 0.0)


def test_keyword_aliases():
    s = parse_scene(
        """
materials { { shininess = 1 } }
scene {
    point-light { point = (0,1,0), diffuse-intensity = (1,1,1),
                  specular-intensity = (2,2,2) },
    smooth-union { smoothness = 1,
        a = sphere { radius = 1 }, b = sphere { radius = 2 } }
}
"""
    )
    assert len(s.lights) == 1
    assert s.lights[0].specular_intensity == (2.0, 2.0, 2.0)
    assert isinstance(s.objects[0], SmoothUnion)


@pytest.mark.parametrize(
    "text,msg",
    [
        ("materials { { shininess = 1-2 } } scene { plane { y = 0 } }", "found"),
        ("materials { { shininess = 1 } } scene { plane { y = 0 } } $", "unexpected character"),
        ("materials { { bogus = 1 } } scene { plane { y = 0 } }", "unknown keyword"),
        ("materials { { radius = 1 } } scene { plane { y = 0 } }", "unknown material property"),
        ("materials { { shininess = (1,2) } } scene { plane { y = 0 } }", "expects a number"),
        ("materials { { diffuse = 1 } } scene { plane { y = 0 } }", "expects a 3-component"),
        ("materials { { shininess = 1 } } scene { sphere { material = #5 } }", "out of range"),
        ("materials { { shininess = 1 } } scene { camera { direction = (0,0,0) } }", "non-zero"),
        ("materials { { shininess = 1 } } scene { smooth_union { smoothness = 1 } }", "requires both"),
    ],
)
def test_errors(text, msg):
    with pytest.raises(LolSyntaxError, match=msg):
        parse_scene(text)


def test_error_reports_line_number():
    text = "materials {\n  { shininess = 1 }\n}\nscene {\n  wat { y = 0 }\n}"
    with pytest.raises(LolSyntaxError, match="line 5"):
        parse_scene(text)


def test_duplicate_property_last_wins():
    s = parse_scene(
        "materials { { shininess = 1, shininess = 9 } }"
        " scene { plane { y = 0, y = 3 } }"
    )
    assert s.materials[0].shininess == 9.0
    assert s.objects[0].y == 3.0


def test_negative_and_fractional_numbers():
    s = parse_scene(
        "materials { { shininess = -4.5 } } scene { plane { y = -.25 } }"
    )
    assert s.materials[0].shininess == -4.5
    assert s.objects[0].y == -0.25
