"""Pallas TPU kernels and their XLA fallbacks: the fused volume-rendering
decoder kernel (the framework's hot path) and packed-weight utilities."""

from dfanerf_tpu.ops.pack import pack_field_weights
from dfanerf_tpu.ops.fused_render import fused_render_rays

__all__ = ["pack_field_weights", "fused_render_rays"]
