"""Multi-device / multi-host distribution: device meshes, pixel-sharded
rendering, and gradient all-reduce."""

from loltracer_tpu.parallel.distributed import maybe_initialize, process_info
from loltracer_tpu.parallel.mesh import make_mesh, make_mesh_2d
from loltracer_tpu.parallel.sharded import (
    make_sharded_renderer,
    make_sharded_train_step,
)

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "make_sharded_renderer",
    "make_sharded_train_step",
    "maybe_initialize",
    "process_info",
]
