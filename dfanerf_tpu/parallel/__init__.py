"""Multi-chip parallelism: device mesh setup and ray-sharded training.

The reference has no distributed machinery at all (SURVEY.md §2.4) — this
layer is the TPU-native capability that replaces "buy a bigger GPU": the
per-step ray batch is sharded across chips over a 1-D mesh, every chip
evaluates both fields on its ray shard, and gradients are psum'd over ICI."""

from dfanerf_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_train_step,
    replicate_state,
)

__all__ = ["make_mesh", "make_sharded_train_step", "replicate_state"]
