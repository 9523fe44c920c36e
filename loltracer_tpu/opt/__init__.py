"""Inverse rendering: recover scene parameters from target images."""

from loltracer_tpu.opt.inverse import (
    FitResult,
    default_project,
    fit_scene,
    load_checkpoint,
    masked_optimizer,
    save_checkpoint,
    trainable_mask,
)

__all__ = [
    "fit_scene",
    "FitResult",
    "trainable_mask",
    "masked_optimizer",
    "default_project",
    "save_checkpoint",
    "load_checkpoint",
]
