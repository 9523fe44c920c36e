"""Shared small vector helpers for the render pipeline."""

from __future__ import annotations

import jax.numpy as jnp

# Guard for normalizing near-zero vectors. The reference divides by zero and
# produces NaNs in these (measure-zero) configurations — e.g. the tetrahedron
# normal estimate at an SDF saddle point inside a smooth-union blend
# (naive_renderer.c:124 via v3normalize, vec.h:54-59). We clamp the squared
# norm instead: vectors with |v| > 1e-15 are untouched in float32, and exact
# zeros normalize to the zero vector with finite gradients (a documented
# divergence that also keeps fused XLA backward passes NaN-free).
_EPS2 = 1e-30


def normalize(v):
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return v / jnp.sqrt(jnp.maximum(n2, _EPS2))


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.stack(
        [
            a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
            a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
            a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
        ],
        axis=-1,
    )
