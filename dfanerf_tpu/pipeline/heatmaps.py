"""Heatmap decoding for the landmark networks.

Re-design of lib/core/inference.py: argmax decode with the quarter-pixel
gradient-sign refinement (predToKeypoints) and the Gaussian-modulation
smoothing pass (gaussian_modulation_torch) — all jnp, fully batched.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def get_max_preds(heatmaps: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[N, H, W, K] -> coords [N, K, 2] (x, y) and maxvals [N, K, 1].

    Matches inference.py:20-49 including zeroing coords where max <= 0.
    """
    n, h, w, k = heatmaps.shape
    flat = heatmaps.transpose(0, 3, 1, 2).reshape(n, k, -1)
    idx = jnp.argmax(flat, axis=2)
    maxvals = jnp.max(flat, axis=2, keepdims=True)
    x = (idx % w).astype(jnp.float32)
    y = jnp.floor(idx.astype(jnp.float32) / w)
    preds = jnp.stack([x, y], axis=-1)
    mask = (maxvals > 0.0).astype(jnp.float32)
    return preds * mask, maxvals


def quarter_offset_refine(heatmaps: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Quarter-pixel refinement toward the local gradient sign
    (predToKeypoints post_process, inference.py:93-113)."""
    n, h, w, k = heatmaps.shape
    hm = heatmaps.transpose(0, 3, 1, 2)  # [N, K, H, W]
    px = jnp.floor(coords[..., 0] + 0.5).astype(jnp.int32)
    py = jnp.floor(coords[..., 1] + 0.5).astype(jnp.int32)
    pxc = jnp.clip(px, 1, w - 2)
    pyc = jnp.clip(py, 1, h - 2)

    def gather(dy, dx):
        return jnp.take_along_axis(
            hm.reshape(n, k, -1),
            ((pyc + dy) * w + (pxc + dx))[..., None],
            axis=2,
        )[..., 0]

    diff_x = gather(0, 1) - gather(0, -1)
    diff_y = gather(1, 0) - gather(-1, 0)
    valid = (
        (px > 1) & (px < w - 1) & (py > 1) & (py < h - 1)
    ).astype(jnp.float32)
    offset = jnp.stack([jnp.sign(diff_x), jnp.sign(diff_y)], axis=-1) * 0.25
    return coords + offset * valid[..., None]


def gaussian_modulation(
    heatmaps: jnp.ndarray, sigma: float, eps: float = 1e-8
) -> jnp.ndarray:
    """Depthwise Gaussian blur then rescale each map back to its original
    peak and clamp negatives (inference.py:52-89).

    heatmaps: [N, H, W, K].
    """
    size = int(2 * (sigma * 3) + 1)
    x = jnp.arange(size, dtype=heatmaps.dtype)
    x0 = size // 2
    g1 = jnp.exp(-((x - x0) ** 2 + (x[:, None] - x0) ** 2) / (2 * sigma ** 2))
    k = heatmaps.shape[-1]
    kernel = jnp.broadcast_to(g1[:, :, None, None], (size, size, 1, k))
    if size % 2 == 0:
        pad = [(size // 2, size // 2 - 1)] * 2
    else:
        pad = [(size // 2, size // 2)] * 2
    orig_max = jnp.max(heatmaps, axis=(1, 2), keepdims=True)
    out = jax.lax.conv_general_dilated(
        heatmaps, kernel, (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=k,
    )
    mx = jnp.max(out, axis=(1, 2), keepdims=True)
    mn = jnp.min(out, axis=(1, 2), keepdims=True)
    out = (out - mn) / (mx - mn + eps) * orig_max
    return jnp.maximum(out, 0.0)


def decode_heatmaps(
    heatmaps: jnp.ndarray, sigma: float = 1.5, modulate: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full decode (modulate -> argmax -> quarter refine) in heatmap pixel
    coordinates. Returns coords [N, K, 2] and scores [N, K, 1]."""
    if modulate:
        heatmaps = gaussian_modulation(heatmaps, sigma)
    coords, maxvals = get_max_preds(heatmaps)
    coords = quarter_offset_refine(heatmaps, coords)
    return coords, maxvals
