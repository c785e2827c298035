"""Positional encodings.

Two distinct sin/cos encodings are load-bearing in DFA-NeRF and they are NOT
interchangeable (reference: NeRFs/DFANeRF/decoder.py:257-275 vs
run_nerf_helpers.py:21-70):

1. ``sincos_posenc`` — the GIRAFFE-style decoder encoding: the input is first
   divided by ``downscale`` and multiplied by pi, frequencies are 2**i for
   i in [0, L), the input itself is NOT included, and per frequency the
   layout is [sin(f*x), cos(f*x)] concatenated over frequencies.
   Output dim = 2 * L * d.

2. ``nerf_embedder`` — the original-NeRF ``Embedder`` used for the torso pose
   signal: the raw input IS included, frequencies are 2**linspace(0, m-1, m)
   (log-sampled), no pi factor, layout [x, sin(f0*x), cos(f0*x), sin(f1*x),
   ...]. Output dim = d * (1 + 2 * m).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def sincos_posenc(p: jnp.ndarray, n_freqs: int, downscale: float = 1.0) -> jnp.ndarray:
    """GIRAFFE-style positional encoding (decoder.py:257-275 semantics).

    Args:
        p: [..., d] points (or normalized view directions).
        n_freqs: number of octaves L.
        downscale: divide input by this before encoding (``downscale_p_by``).

    Returns:
        [..., 2 * L * d] encoding, per-frequency layout [sin, cos].
    """
    p = p / downscale
    # [..., L, 1] * [..., 1, d] -> [..., L, d]
    freqs = (2.0 ** jnp.arange(n_freqs, dtype=p.dtype)) * math.pi
    scaled = p[..., None, :] * freqs[:, None]
    enc = jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=-1)
    return enc.reshape(*p.shape[:-1], 2 * n_freqs * p.shape[-1])


def gauss_B_matrices(
    gauss_dim_pos: int = 10, gauss_dim_view: int = 4, gauss_std: float = 4.0
):
    """The reference's fixed Gaussian projection matrices.

    decoder.py:189-199 seeds the legacy numpy global RNG with 42 and draws
    B_pos = std * randn(1, 3*gauss_dim_pos, 3) then B_view = std *
    randn(1, 3*gauss_dim_view, 3) IN THAT ORDER — the matrices are
    deterministic constants of the config, not trainable parameters (torch
    buffers created at construction). Returns (B_pos [3*gp, 3],
    B_view [3*gv, 3]) fp32.
    """
    import numpy as np

    rs = np.random.RandomState(42)
    b_pos = (gauss_std * rs.randn(1, gauss_dim_pos * 3, 3)).astype(np.float32)
    b_view = (gauss_std * rs.randn(1, gauss_dim_view * 3, 3)).astype(np.float32)
    return jnp.asarray(b_pos[0]), jnp.asarray(b_view[0])


def gauss_posenc(p: jnp.ndarray, B: jnp.ndarray, downscale: float = 1.0) -> jnp.ndarray:
    """Gaussian (random-Fourier-feature) positional encoding.

    The decoder's ``positional_encoding='gauss'`` mode (decoder.py:257-269
    ``transform_points``): proj = B @ (pi * p / downscale) computed per
    point, output = [sin(proj), cos(proj)] concatenated on the last axis.

    Args:
        p: [..., 3] points (or view directions).
        B: [m, 3] projection matrix (``gauss_B_matrices``).
        downscale: ``downscale_p_by``.

    Returns:
        [..., 2 * m] encoding.
    """
    proj = (p / downscale * math.pi) @ B.T
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def nerf_embed_dim(multires: int, input_dims: int = 3, include_input: bool = True) -> int:
    """Output dimension of ``nerf_embedder``."""
    return input_dims * ((1 if include_input else 0) + 2 * multires)


def nerf_embedder(
    x: jnp.ndarray,
    multires: int,
    include_input: bool = True,
    log_sampling: bool = True,
) -> jnp.ndarray:
    """Original-NeRF ``Embedder`` encoding (run_nerf_helpers.py:21-70 semantics).

    Layout: [x?, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...] with
    f_k = 2**linspace(0, multires-1, multires) when log-sampled.

    Args:
        x: [..., d] input.
        multires: number of frequency bands m.
    Returns:
        [..., d * (include_input + 2m)]
    """
    if log_sampling:
        freqs = 2.0 ** jnp.linspace(0.0, multires - 1, multires, dtype=x.dtype)
    else:
        freqs = jnp.linspace(1.0, 2.0 ** (multires - 1), multires, dtype=x.dtype)
    scaled = x[..., None, :] * freqs[:, None]  # [..., m, d]
    sin = jnp.sin(scaled)
    cos = jnp.cos(scaled)
    # interleave per frequency: [sin_k, cos_k] blocks of width d
    sc = jnp.concatenate([sin[..., None, :], cos[..., None, :]], axis=-2)
    sc = sc.reshape(*x.shape[:-1], 2 * multires * x.shape[-1])
    if include_input:
        return jnp.concatenate([x, sc], axis=-1)
    return sc


def et_embed(et: jnp.ndarray, multires: int = 3) -> jnp.ndarray:
    """Pose-signal embedding: PE(euler) ++ PE(translation).

    Matches run_nerf_com_trainExpLater.py:103-104 — the 6-dim euler+trans
    vector is split 3/3 and each half embedded with the NeRF embedder
    (multires=3 → 21 dims each → 42 total = ``dim_et_embed``).

    Args:
        et: [..., 6] concatenated (euler, translation).
    Returns:
        [..., 2 * nerf_embed_dim(multires)] — 42 for multires=3.
    """
    return jnp.concatenate(
        [nerf_embedder(et[..., :3], multires), nerf_embedder(et[..., 3:], multires)],
        axis=-1,
    )
