"""Pinhole-camera ray generation.

Semantics match the reference ``get_rays`` (run_nerf_helpers.py:449-465)
including its conventions:

- pixel grid built with 'xy' indexing (the reference builds an 'ij' meshgrid
  of (W-range, H-range) and transposes both — equivalent to 'xy');
- camera looks down -z, y is flipped: dir = [(i-cx)/f, -(j-cy)/f, -1];
- rays are rotated into world frame with rays_d = R @ dir where R = c2w[:3,:3];
- ray directions are NOT normalized (compositing multiplies distances by
  ||rays_d||, so this matters — see core/compositing.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def get_rays(
    H: int,
    W: int,
    focal: float,
    c2w: jnp.ndarray,
    cx: Optional[float] = None,
    cy: Optional[float] = None,
    stride: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generate camera rays for every pixel.

    Args:
        H, W: image size (static Python ints).
        focal: focal length in pixels.
        c2w: [3, 4] or [4, 4] camera-to-world matrix.
        cx, cy: principal point; defaults to W/2, H/2.
        stride: subsampling stride (reference's ``--stride`` test option);
            produces a (H//stride, W//stride) grid of every stride-th pixel
            coordinate via linspace over the full range.

    Returns:
        rays_o, rays_d: each [H//stride, W//stride, 3]; rays_d unnormalized.
    """
    if cx is None:
        cx = W * 0.5
    if cy is None:
        cy = H * 0.5
    # linspace(0, W-1, W//stride) matches the reference's subsampled grid
    # (run_nerf_helpers.py:451): for stride=1 this is arange(W).
    i = jnp.linspace(0.0, W - 1, W // stride, dtype=jnp.float32)  # column coords
    j = jnp.linspace(0.0, H - 1, H // stride, dtype=jnp.float32)  # row coords
    ii, jj = jnp.meshgrid(i, j, indexing="xy")  # each [H', W']
    dirs = jnp.stack(
        [(ii - cx) / focal, -(jj - cy) / focal, -jnp.ones_like(ii)], axis=-1
    )  # [H', W', 3]
    # tiny 3x3 rotation: force full fp32 (TPU default matmul precision is
    # bf16, which would put ~1e-3 error on every ray direction)
    rays_d = jnp.einsum(
        "...j,ij->...i", dirs, c2w[:3, :3], precision=jax.lax.Precision.HIGHEST
    )
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def rays_for_pixels(
    coords_yx: jnp.ndarray,
    focal: float,
    c2w: jnp.ndarray,
    cx: float,
    cy: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rays for an explicit set of (row, col) pixel coordinates.

    TPU-native alternative to building the full [H, W] ray grid and gathering:
    for training we only need N_rand rays, so generate exactly those. Matches
    get_rays(...)[select_coords] in the reference train loop
    (run_nerf_com_trainExpLater.py:831-836).

    Args:
        coords_yx: [N, 2] float or int (row=y, col=x) pixel coordinates.
        c2w: [3,4] or [4,4].
    Returns:
        rays_o, rays_d: each [N, 3].
    """
    y = coords_yx[..., 0].astype(jnp.float32)
    x = coords_yx[..., 1].astype(jnp.float32)
    dirs = jnp.stack([(x - cx) / focal, -(y - cy) / focal, -jnp.ones_like(x)], axis=-1)
    rays_d = jnp.einsum(
        "...j,ij->...i", dirs, c2w[:3, :3], precision=jax.lax.Precision.HIGHEST
    )
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def ndc_rays(
    H: int,
    W: int,
    focal: float,
    near: float,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shift rays to the near plane and project to NDC space.

    Parity with run_nerf_helpers.py:484-503 (kept for vanilla-NeRF/LLFF
    compatibility; the talking-head pipeline does not use NDC).
    """
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2]
    )
    d1 = -1.0 / (H / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2]
    )
    d2 = -2.0 * near / rays_o[..., 2]

    return jnp.stack([o0, o1, o2], axis=-1), jnp.stack([d0, d1, d2], axis=-1)
