"""Test configuration: run JAX on CPU with 8 faked devices so sharding tests
exercise a multi-device mesh without TPU hardware (the standard JAX substitute
for a fake distributed backend; see SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# tests may build N-device meshes out of the faked CPU devices; production
# launches must NOT get this fallback silently (parallel/mesh.py make_mesh)
os.environ.setdefault("LOLTRACE_CPU_FALLBACK", "1")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import jax
import pytest

# Persist XLA executables across test runs; render-graph compiles on CPU take
# tens of seconds and dominate suite time otherwise.
_CACHE_DIR = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# This image ships an `axon` TPU-tunnel plugin that ignores JAX_PLATFORMS and
# would silently route every op over the network to the one real TPU chip;
# tests must run on local CPU (with the 8 faked devices above).
jax.config.update("jax_default_device", jax.devices("cpu")[0])

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"


@pytest.fixture(scope="session")
def examples_dir() -> pathlib.Path:
    return EXAMPLES


@pytest.fixture(
    scope="session", params=["scene.lol", "scene2.lol", "scene3.lol", "scene4.lol"]
)
def example_path(request) -> pathlib.Path:
    return EXAMPLES / request.param
