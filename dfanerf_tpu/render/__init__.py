"""Rendering: the shared head+torso ray-batch forward and the tiled
full-frame renderer."""

from dfanerf_tpu.render.fields import render_ray_batch
from dfanerf_tpu.render.renderer import make_frame_renderer

__all__ = ["render_ray_batch", "make_frame_renderer"]
