"""Pure-function math core: every function here is jittable, shape-static,
and free of I/O or Python-level data-dependent control flow."""

from dfanerf_tpu.core.posenc import (
    sincos_posenc,
    nerf_embedder,
    nerf_embed_dim,
)
from dfanerf_tpu.core.rays import get_rays, ndc_rays
from dfanerf_tpu.core.sampling import stratified_z_vals, sample_pdf
from dfanerf_tpu.core.compositing import (
    calc_volume_weights,
    composite_fields,
    volume_render,
)
from dfanerf_tpu.core.geometry import (
    euler2rot,
    rot_to_euler,
    pose_to_euler_trans,
    rot_trans_pts,
    proj_pts,
    forward_transform,
)

__all__ = [
    "sincos_posenc",
    "nerf_embedder",
    "nerf_embed_dim",
    "get_rays",
    "ndc_rays",
    "stratified_z_vals",
    "sample_pdf",
    "calc_volume_weights",
    "composite_fields",
    "volume_render",
    "euler2rot",
    "rot_to_euler",
    "pose_to_euler_trans",
    "rot_trans_pts",
    "proj_pts",
    "forward_transform",
]
