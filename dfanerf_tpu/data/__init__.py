"""Data layer: dataset manifest contract, device-resident frame cache,
ray/pixel samplers, and synthetic scenes for tests and benchmarks."""

from dfanerf_tpu.data.dataset import FrameDataset, load_audface_dataset
from dfanerf_tpu.data.synthetic import make_synthetic_dataset

__all__ = ["FrameDataset", "load_audface_dataset", "make_synthetic_dataset"]
