"""Training: jitted train step, staged optimizers, signal encoding,
checkpointing, and the host-side loop."""

from dfanerf_tpu.train.state import TrainState, init_train_state
from dfanerf_tpu.train.step import make_train_step, dataset_to_device
from dfanerf_tpu.train.loop import train_loop

__all__ = [
    "TrainState",
    "init_train_state",
    "make_train_step",
    "dataset_to_device",
    "train_loop",
]
