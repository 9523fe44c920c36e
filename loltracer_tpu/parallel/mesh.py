"""Device mesh construction.

The reference's "distribution" is one process with N worker threads pulling
scanlines off an atomic counter and meeting at two semaphore barriers per
frame (main.c:145-149,189-194; naive_renderer.c:216). The TPU replacement is
SPMD over a jax.sharding.Mesh: rows are statically sharded over the
'devices' axis (tiles big enough to average out per-ray march divergence
replace dynamic stealing), barriers come free from program structure, and the
only cross-device traffic is the scene-gradient psum in backward
(SURVEY.md §5.8).

For multi-host slices call `jax.distributed.initialize()` before
`make_mesh()`; jax.devices() then spans all hosts and rows shard across the
full slice, with XLA routing the gradient all-reduce over ICI within a host
and DCN across hosts.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXIS = "devices"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    n_devices: Optional[int] = None,
) -> Mesh:
    """A 1-D mesh over the given (default: all) devices.

    `n_devices` truncates, which is how tests build small meshes out of the
    8 faked CPU devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            # fall back to (possibly faked) host CPU devices — e.g. under
            # --xla_force_host_platform_device_count with a TPU plugin that
            # ignores JAX_PLATFORMS (this image's axon tunnel does)
            try:
                cpus = jax.devices("cpu")
            except RuntimeError:
                cpus = []
            if len(cpus) >= n_devices:
                devices = cpus
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devices)}"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))
