"""Gradient correctness (BASELINE gate): reverse-mode AD of the renderer vs
float64 central differences of the golden tracer, on all four example scenes.

Methodology:
- AD gradients are computed in float64 (x64 mode) so AD-vs-FD differences
  measure *math*, not fp32 roundoff.
- Finite differences run the golden tracer with a much tighter march epsilon
  (1e-8, 4096 steps) so the march's convergence slack doesn't pollute the
  quotient; the AD side keeps the production epsilon — hit points agree to
  O(epsilon) and so do gradients.
- The loss is a weighted mean over a small image. Central steps are small
  (1e-4) so silhouette coverage flips (which IFT gradients intentionally do
  not model) are rare; coordinates whose FD is polluted by a flip are
  detected by comparing forward/backward one-sided differences and skipped.
"""

import dataclasses

import numpy as np
import pytest

import jax

from loltracer_tpu.config import RenderConfig
from loltracer_tpu.golden.tracer import render_golden
from loltracer_tpu.lol import parse_scene_file
from loltracer_tpu.render.jnp_renderer import render_image
from loltracer_tpu.scene import Scene, SceneParams, build_scene, params_astype

H, W = 12, 16
CFG = RenderConfig()
CFG_GOLD = RenderConfig(epsilon=1e-8, max_steps=4096)

# (field, index) coordinates to check per scene; chosen to cover every
# parameter family the reference exposes in the DSL.
COORDS = [
    ("sphere_point", (0, 1)),
    ("sphere_radius", (0,)),
    ("light_point", (0, 0)),
    ("light_diffuse", (0, 1)),
    ("mat_diffuse", (1, 0)),
    ("mat_shininess", (1,)),
    ("ambient_color", (0,)),
    ("cam_point", (2,)),
    ("cam_fov", ()),
    ("plane_y", (0,)),
    ("smooth_k", (0,)),
    ("box_radius", (0,)),
]

# fixed weights decorrelate the loss from any single pixel
_RNG = np.random.default_rng(7)
WEIGHTS = _RNG.uniform(0.5, 1.5, size=(H, W, 3))


def _loss_weights():
    return WEIGHTS


def _golden_loss(scene64: Scene, params: SceneParams) -> float:
    img = render_golden(
        dataclasses.replace(scene64, params=params), W, H, CFG_GOLD
    )
    return float(np.mean(WEIGHTS * img))


def _fd(scene64: Scene, field: str, idx, h=1e-4):
    """Central difference, with one-sided cross-check to detect silhouette
    coverage flips. Returns (fd, trustworthy)."""
    base = scene64.params

    def shifted(delta):
        arrays = {
            f.name: np.array(getattr(base, f.name), dtype=np.float64)
            for f in dataclasses.fields(SceneParams)
        }
        arrays[field][idx] += delta
        return SceneParams(**arrays)

    lp = _golden_loss(scene64, shifted(+h))
    lm = _golden_loss(scene64, shifted(-h))
    l0 = _golden_loss(scene64, shifted(0.0))
    central = (lp - lm) / (2 * h)
    fwd = (lp - l0) / h
    bwd = (l0 - lm) / h
    # a coverage flip makes one one-sided quotient wildly different
    spread = abs(fwd - bwd)
    scale = max(abs(central), abs(fwd), abs(bwd), 1e-6)
    return central, spread <= 0.2 * scale + 1e-6


@pytest.fixture(scope="module")
def scenes(examples_dir):
    out = {}
    for name in ["scene.lol", "scene2.lol", "scene3.lol", "scene4.lol"]:
        out[name] = build_scene(
            parse_scene_file(str(examples_dir / name)), dtype=np.float64
        )
    return out


@pytest.mark.parametrize(
    "name", ["scene.lol", "scene2.lol", "scene3.lol", "scene4.lol"]
)
def test_gradcheck(scenes, name):
    scene = scenes[name]
    weights = _loss_weights()

    with jax.enable_x64(True):
        params64 = params_astype(scene.params, np.float64)

        def loss(params):
            img = render_image(scene.structure, params, H, W, CFG, dtype=np.float64)
            return (weights * img).mean()

        grads = jax.grad(loss)(params64)

    checked = 0
    skipped = []
    for field, idx in COORDS:
        arr = getattr(scene.params, field)
        if arr.size == 0 or (idx and idx[0] >= arr.shape[0]):
            continue  # scene has no primitive of this type
        ad = float(np.asarray(getattr(grads, field))[idx])
        fd, ok = _fd(scene, field, idx)
        if not ok:
            skipped.append((field, idx))
            continue
        # 5%: interior (IFT) gradients deliberately exclude silhouette
        # coverage terms; parameters that move every silhouette at once
        # (camera, fov) accumulate a few percent of FD mass from coverage
        # shifts at this resolution. Edge-sampling reparameterization is
        # future work (PAPERS.md, reparameterized SDF rendering).
        tol = 5e-2 * max(abs(fd), abs(ad)) + 2e-4
        assert abs(ad - fd) <= tol, (
            f"{name} d/d {field}{idx}: AD={ad:.6g} FD={fd:.6g}"
        )
        checked += 1

    # the check must actually exercise a healthy number of coordinates
    assert checked >= 6, f"only {checked} coords checked (skipped {skipped})"
