"""Persistent XLA compilation cache.

Scene-renderer graphs (256-step march while_loop + 128-step shadow scan,
forward and backward) take minutes to compile through the axon TPU tunnel
and tens of seconds on CPU. One compile per (scene structure, image shape)
is the design — the cache makes that one-time across processes.
"""

from __future__ import annotations

import os
import pathlib


def enable_cache(path: str | None = None) -> None:
    import jax

    if path is None:
        path = os.environ.get(
            "LOLTRACER_CACHE",
            str(pathlib.Path.home() / ".cache" / "loltracer_tpu" / "xla"),
        )
    pathlib.Path(path).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
