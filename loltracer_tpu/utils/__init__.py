"""Utilities: image I/O, profiling helpers."""

from loltracer_tpu.utils.image import image_to_u8, write_png, write_npy

__all__ = ["image_to_u8", "write_png", "write_npy"]
