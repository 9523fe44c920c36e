"""Inverse rendering (BASELINE config 4 capability): recover scene parameters
from a target image with Adam. Appearance parameters are strongly observable
and recover tightly; image-plane positions recover via the soft-coverage
silhouette gradients (cfg.antialias); depth is weakly observable at test
resolutions and is not asserted."""

import dataclasses as dc
import os

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from loltracer_tpu.config import RenderConfig
from loltracer_tpu.lol import parse_scene_file
from loltracer_tpu.opt import fit_scene, load_checkpoint, masked_optimizer
from loltracer_tpu.render.jnp_renderer import make_renderer, render_image
from loltracer_tpu.scene import build_scene

pytestmark = pytest.mark.slow  # optimization loops; run with `pytest -m slow`

H, W = 24, 32
CFG_AA = RenderConfig(antialias=True)


@pytest.fixture(scope="module")
def scene(examples_dir):
    return build_scene(parse_scene_file(str(examples_dir / "scene.lol")))


@pytest.fixture(scope="module")
def target(scene):
    return make_renderer(scene.structure, H, W, CFG_AA)(scene.params)


def _optimize(scene, target, params, fields, lr, steps):
    loss_j = jax.jit(
        lambda p: jnp.mean(
            (render_image(scene.structure, p, H, W, CFG_AA) - target) ** 2
        )
    )
    gfun = jax.jit(jax.grad(loss_j))
    opt = masked_optimizer(optax.adam(lr), params, fields)
    ost = opt.init(params)
    first = float(loss_j(params))
    for _ in range(steps):
        g = gfun(params)
        u, ost = opt.update(g, ost, params)
        params = optax.apply_updates(params, u)
    return params, first, float(loss_j(params))


def test_appearance_recovery(scene, target):
    perturbed = dc.replace(
        scene.params,
        mat_diffuse=scene.params.mat_diffuse * np.float32(0.4),
        light_diffuse=scene.params.light_diffuse * np.float32(1.6),
    )
    params, first, last = _optimize(
        scene, target, perturbed, ("mat_diffuse", "light_diffuse"), 1e-2, 60
    )
    assert last < first * 0.15, (first, last)


def test_position_recovery_xy(scene, target):
    sp = np.array(scene.params.sphere_point)
    sp[0, 0] += 0.25
    sp[0, 1] -= 0.20
    perturbed = dc.replace(scene.params, sphere_point=jnp.asarray(sp))
    params, first, last = _optimize(
        scene, target, perturbed, ("sphere_point",), 2e-2, 60
    )
    got = np.asarray(params.sphere_point)[0]
    want = np.asarray(scene.params.sphere_point)[0]
    assert abs(got[0] - want[0]) < 0.08, (got, want)
    assert abs(got[1] - want[1]) < 0.08, (got, want)


def test_fit_scene_api_with_checkpoint(scene, target, tmp_path):
    ckpt = str(tmp_path / "fit.ckpt")
    perturbed = dc.replace(
        scene.params, mat_diffuse=scene.params.mat_diffuse * np.float32(0.5)
    )
    result = fit_scene(
        scene.structure,
        perturbed,
        target,
        steps=6,
        learning_rate=5e-3,
        trainable=("mat_diffuse",),
        cfg=CFG_AA,
        checkpoint_path=ckpt,
        checkpoint_every=3,
    )
    assert result.losses.shape == (6,)
    assert os.path.exists(ckpt)
    step, params, _ = load_checkpoint(ckpt)
    assert step == 6
    # resume continues from the checkpointed step (renders 0 new steps if
    # steps == checkpointed step)
    result2 = fit_scene(
        scene.structure,
        perturbed,
        target,
        steps=6,
        learning_rate=5e-3,
        trainable=("mat_diffuse",),
        cfg=CFG_AA,
        checkpoint_path=ckpt,
    )
    assert result2.losses.shape == (0,)
