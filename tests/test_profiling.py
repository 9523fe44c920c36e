"""Observability: march step counts must reflect actual convergence."""

import numpy as np

from loltracer_tpu.config import RenderConfig
from loltracer_tpu.lol import parse_scene_file
from loltracer_tpu.scene import build_scene
from loltracer_tpu.utils.profiling import march_step_counts, march_step_stats


def test_step_counts_bounded_and_varied(examples_dir):
    scene = build_scene(parse_scene_file(str(examples_dir / "scene.lol")))
    steps = march_step_counts(scene.structure, scene.params, 24, 32)
    assert steps.shape == (24, 32)
    assert steps.min() >= 1
    assert steps.max() <= 256
    # the scene has sky, spheres and a near-plane: step counts must differ
    assert steps.max() > steps.min()


def test_stats_summary(examples_dir):
    scene = build_scene(parse_scene_file(str(examples_dir / "scene3.lol")))
    stats = march_step_stats(scene.structure, scene.params, 16, 128)
    assert 1 <= stats["mean_steps"] <= 256
    assert stats["p50_steps"] <= stats["p99_steps"] <= stats["max_steps"]
    assert stats["tile_waste"] >= 1.0


def test_max_steps_config_respected(examples_dir):
    scene = build_scene(parse_scene_file(str(examples_dir / "scene.lol")))
    cfg = RenderConfig(max_steps=16)
    steps = march_step_counts(scene.structure, scene.params, 12, 16, cfg)
    assert steps.max() <= 16
