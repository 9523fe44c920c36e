"""Rendering backends: vectorized jnp reference path and Pallas TPU kernels."""

from loltracer_tpu.render.jnp_renderer import render_image, make_renderer

__all__ = ["render_image", "make_renderer"]
