"""Checkpoint atomicity and validation (opt/inverse.py; SURVEY §5.3/§5.4:
the restart story depends on the checkpoint file surviving a host death
mid-write, and on refusing to resume mismatched or corrupt state)."""

import dataclasses
import os
import pickle

import numpy as np
import pytest

from loltracer_tpu.lol import parse_scene_file
from loltracer_tpu.opt.inverse import (
    CKPT_VERSION,
    load_checkpoint,
    save_checkpoint,
    structure_fingerprint,
)
from loltracer_tpu.scene import build_scene


@pytest.fixture(scope="module")
def scene(examples_dir):
    return build_scene(parse_scene_file(str(examples_dir / "scene3.lol")))


def _save(path, scene, step=5):
    save_checkpoint(path, step, scene.params, {"adam": np.arange(3)},
                    scene.structure)


def test_roundtrip(scene, tmp_path):
    path = str(tmp_path / "a.ckpt")
    _save(path, scene, step=7)
    step, params, opt_state = load_checkpoint(path, scene.structure)
    assert step == 7
    np.testing.assert_array_equal(
        params.sphere_point, np.asarray(scene.params.sphere_point)
    )
    np.testing.assert_array_equal(opt_state["adam"], np.arange(3))


def test_mid_write_death_preserves_previous(scene, tmp_path, monkeypatch):
    """Kill the writer after the temp file is partially written but before
    the atomic rename: the previous checkpoint must still load intact."""
    path = str(tmp_path / "a.ckpt")
    _save(path, scene, step=3)
    before = open(path, "rb").read()

    real_replace = os.replace

    def dying_replace(src, dst):
        # simulate the host dying between write and publish: leave the
        # (possibly partial) temp file on disk, never touch `dst`
        raise RuntimeError("host died mid-checkpoint")

    monkeypatch.setattr(os, "replace", dying_replace)
    with pytest.raises(RuntimeError):
        _save(path, scene, step=4)
    monkeypatch.setattr(os, "replace", real_replace)

    assert open(path, "rb").read() == before
    step, _, _ = load_checkpoint(path, scene.structure)
    assert step == 3


def test_truncated_file_raises_not_garbage(scene, tmp_path):
    """A truncated pickle (the failure mode the atomic writer prevents, if
    produced by an older writer or disk corruption) raises a clear error
    instead of returning partial state or crashing opaquely."""
    path = str(tmp_path / "a.ckpt")
    _save(path, scene, step=3)
    blob = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(blob[: len(blob) // 2])
    with pytest.raises(ValueError, match="corrupt or truncated"):
        load_checkpoint(path, scene.structure)


def test_structure_mismatch_refused(scene, tmp_path):
    path = str(tmp_path / "a.ckpt")
    _save(path, scene)
    other = dataclasses.replace(scene.structure, num_lights=99)
    assert structure_fingerprint(other) != structure_fingerprint(
        scene.structure
    )
    with pytest.raises(ValueError, match="different scene structure"):
        load_checkpoint(path, other)


def test_version_mismatch_refused(scene, tmp_path):
    path = str(tmp_path / "a.ckpt")
    _save(path, scene)
    with open(path, "rb") as f:
        state = pickle.load(f)
    state["version"] = CKPT_VERSION + 1
    with open(path, "wb") as f:
        pickle.dump(state, f)
    with pytest.raises(ValueError, match="format version"):
        load_checkpoint(path, scene.structure)


def test_missing_file_returns_none(tmp_path):
    assert load_checkpoint(str(tmp_path / "nope.ckpt")) is None
