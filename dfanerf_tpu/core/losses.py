"""Loss and metric helpers (run_nerf_helpers.py:11-17, 506-532)."""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def img2mse(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((x - y) ** 2)


def mse2psnr(mse: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def to8b(x) -> "np.ndarray":
    import numpy as np

    return (255 * np.clip(np.asarray(x), 0, 1)).astype(np.uint8)


def cal_lap_loss(
    tensors: Sequence[jnp.ndarray], weights: Sequence[float]
) -> jnp.ndarray:
    """Temporal-Laplacian smoothness loss: mean squared response of the
    [-0.5, 1, -0.5] kernel along each tensor's last axis
    (run_nerf_helpers.py:506-515 / face_tracking util)."""
    kern = jnp.array([-0.5, 1.0, -0.5])
    total = 0.0
    for t, w in zip(tensors, weights):
        x = t.reshape(-1, t.shape[-1])
        # conv1d 'valid' with the (symmetric) kernel
        out = (
            -0.5 * x[:, :-2] + 1.0 * x[:, 1:-1] - 0.5 * x[:, 2:]
        )
        total = total + jnp.mean(out ** 2) * w
    return total


def dct_basis(k: int, n: int) -> jnp.ndarray:
    """Orthonormal DCT-II basis row k of length n (run_nerf_helpers.py:
    518-524)."""
    basis = jnp.cos(jnp.pi * (jnp.arange(n) + 0.5) * k / n)
    scale = math.sqrt(1.0 / n) if k == 0 else math.sqrt(2.0 / n)
    return basis * scale


def dct_space(k: int, n: int) -> jnp.ndarray:
    """First k DCT basis rows [k, n] (DCTSpace)."""
    return jnp.stack([dct_basis(i, n) for i in range(k)])


def dct_null_space(k: int, n: int) -> jnp.ndarray:
    """DCT rows k..n — the high-frequency complement (DCTNullSpace)."""
    return jnp.stack([dct_basis(i, n) for i in range(k, n)])
