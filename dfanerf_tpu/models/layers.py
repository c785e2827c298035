"""Minimal functional NN primitives with PyTorch-compatible initialization.

Weight convention: linear weights are stored [in, out] (natural ``x @ w``
for MXU-friendly row-major batches). PyTorch stores [out, in]; the
checkpoint converter transposes (compat/torch_ckpt.py).

Init parity: ``torch.nn.Linear`` / ``Conv1d`` default to kaiming-uniform
with a=sqrt(5), which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
weight and bias — matching this is required for the "within 0.1 dB of the
reference" training-parity target.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp


Params = Dict[str, jnp.ndarray]


def init_linear(key: jax.Array, d_in: int, d_out: int, dtype=jnp.float32) -> Params:
    """U(-1/sqrt(d_in), 1/sqrt(d_in)) for weight and bias (torch default)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    return {
        "w": jax.random.uniform(kw, (d_in, d_out), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (d_out,), dtype, -bound, bound),
    }


def linear(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ params["w"] + params["b"]


def init_conv1d(
    key: jax.Array, c_in: int, c_out: int, kernel: int, dtype=jnp.float32
) -> Params:
    """torch.nn.Conv1d default init; weight stored [k, c_in, c_out]
    (HIO layout for lax.conv_general_dilated)."""
    kw, kb = jax.random.split(key)
    fan_in = c_in * kernel
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": jax.random.uniform(kw, (kernel, c_in, c_out), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (c_out,), dtype, -bound, bound),
    }


def conv1d(
    params: Params, x: jnp.ndarray, stride: int = 1, padding: int = 0
) -> jnp.ndarray:
    """1-D convolution over [N, L, C_in] -> [N, L', C_out].

    Channel-last layout (TPU-friendly: the contraction hits the MXU as a
    [N*L', k*C_in] x [k*C_in, C_out] matmul after im2col by XLA).
    """
    return jax.lax.conv_general_dilated(
        x,
        params["w"],
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    ) + params["b"]


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.02) -> jnp.ndarray:
    """LeakyReLU with the reference's 0.02 slope default."""
    return jnp.where(x >= 0, x, negative_slope * x)
