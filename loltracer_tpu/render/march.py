"""Sphere-trace march: masked batched loop + differentiable hit distance.

Forward semantics mirror naive_renderer.c:46-69: up to `max_steps`
iterations, each evaluating the full scene SDF at p = ro + t*rd and
accumulating t += d, stopping when d < epsilon or t > max_dist; the hit id is
the argmin id from the *last* SDF evaluation (i.e. at the pre-accumulation
t), and id becomes 0 (miss) when the final t >= max_dist.

On TPU the per-ray `break` becomes lane masking: a single
`lax.while_loop` runs until every ray in the batch is done (or max_steps),
with per-lane done flags freezing converged rays — the wavefront-divergence
model of SURVEY.md §5.7.

Differentiability: the step count is a non-differentiable function of the
scene, so reverse-mode AD through the loop is both unsupported
(while_loop) and wrong (it would differentiate the trajectory, not the hit
point). Instead we use the implicit-function theorem on the hit condition
f(ro + t*rd, theta) = 0: the marched t0 is taken as a constant and
re-attached as

    t = t0 + (corr - stop_grad(corr)),
    corr = -f(ro + sg(t0)*rd, theta) / sg(df/dt at hit)

whose *value* is exactly t0 and whose gradient w.r.t. theta, ro and rd is
the IFT derivative (cf. the reparameterized differentiable-sphere-tracing
literature, PAPERS.md Dr.Jit / reparameterized SDF rendering). Miss rays get
zero gradient. The denominator df/dt = grad f . rd is computed with one
forward-mode JVP along the ray and clamped away from zero to keep grazing-hit
gradients bounded.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from loltracer_tpu.config import RenderConfig

_MIN_DEN = 1e-2  # grazing-hit gradient guard for the IFT denominator


def march(
    sdf: Callable,
    params,
    ro,
    rd,
    cfg: RenderConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Non-differentiable masked march.

    Args:
      sdf: `sdf(params, p[..., 3]) -> dist[...]`.
      ro: ray origins broadcastable to rd's batch, [..., 3].
      rd: unit ray directions [..., 3].

    Returns:
      (t, t_query): final accumulated distance per ray and the t at which the
      final SDF evaluation happened (for hit-id lookup).
    """
    batch = jnp.broadcast_shapes(ro.shape[:-1], rd.shape[:-1])
    dtype = rd.dtype
    t0 = jnp.zeros(batch, dtype)
    done0 = jnp.zeros(batch, bool)

    def cond(carry):
        step, _, _, done = carry
        return (step < cfg.max_steps) & ~jnp.all(done)

    def body(carry):
        step, t, t_query, done = carry
        p = ro + t[..., None] * rd
        d = sdf(params, p)
        new_t = t + d
        t_query = jnp.where(done, t_query, t)
        t = jnp.where(done, t, new_t)
        done = done | (d < cfg.epsilon) | (new_t > cfg.max_dist)
        return step + 1, t, t_query, done

    _, t, t_query, _ = lax.while_loop(cond, body, (0, t0, t0, done0))
    return t, t_query


def intersect(
    sdf: Callable,
    sdf_with_id: Callable,
    params,
    ro,
    rd,
    cfg: RenderConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable intersection: returns (t [...], id [...] int32).

    The value of t is bitwise the marched distance; its gradient is the IFT
    hit-point derivative (zero for miss rays). id follows
    naive_renderer.c:53-68: the argmin id at the last march query point,
    zeroed when t >= max_dist.
    """
    sg = lax.stop_gradient
    t0, t_query = sg(march(sdf, params, ro, rd, cfg))

    # hit id from one extra (non-differentiable) evaluation at the final
    # query point — replaces per-step argmin tracking.
    _, obj_id = sdf_with_id(
        sg(params), sg(ro) + t_query[..., None] * sg(rd)
    )
    obj_id = jnp.where(t0 >= cfg.max_dist, 0, obj_id)

    # IFT re-attachment.
    fval = sdf(params, ro + t0[..., None] * rd)
    _, den = jax.jvp(
        lambda t: sdf(sg(params), sg(ro) + t[..., None] * sg(rd)),
        (t0,),
        (jnp.ones_like(t0),),
    )
    den = sg(den)
    den = jnp.where(
        jnp.abs(den) < _MIN_DEN, jnp.where(den < 0, -_MIN_DEN, _MIN_DEN), den
    )
    hit = t0 < cfg.max_dist
    corr = jnp.where(hit, -fval / den, 0.0)
    t = t0 + (corr - sg(corr))
    return t, obj_id
