"""Multi-device / multi-host distribution: device meshes, pixel-sharded
rendering, and gradient all-reduce."""

from loltracer_tpu.parallel.mesh import make_mesh
from loltracer_tpu.parallel.sharded import (
    make_sharded_renderer,
    make_sharded_train_step,
)

__all__ = ["make_mesh", "make_sharded_renderer", "make_sharded_train_step"]
