"""Single source of truth for march-backend resolution.

Round 1 had two independent resolvers (jnp_renderer._select_march keyed off
jax.config.jax_default_device, parallel.sharded._resolve_backend keyed off
mesh devices) which drifted and caused a hotfix. This module is now the only
place "auto" is interpreted.

Resolution rules:

- An explicit backend ("jnp" / "pallas" / "pallas-interpret") always wins.
- "auto" with a mesh resolves from the mesh's devices — the mesh is where a
  shard_map actually runs, and can disagree with the global default (this
  image's axon TPU-tunnel plugin registers itself even under
  JAX_PLATFORMS=cpu, so default_backend() claims "tpu" while tests run on
  faked CPU devices).
- "auto" without a mesh resolves from the pinned default device if any,
  else jax.default_backend().
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh


def resolve_march_backend(backend: str, mesh: Optional[Mesh] = None) -> str:
    """Map "auto" to "pallas" (TPU) or "jnp" (anything else); pass explicit
    choices through unchanged."""
    if backend != "auto":
        return backend
    if mesh is not None:
        platform = mesh.devices.flat[0].platform
    else:
        dev = jax.config.jax_default_device
        platform = dev.platform if dev is not None else jax.default_backend()
    return "pallas" if platform == "tpu" else "jnp"
