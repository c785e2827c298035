"""Conditioning-signal encoders: audio, expression, and temporal attention.

Re-designs of (reference: NeRFs/DFANeRF/run_nerf_helpers.py):
- ``AudioNet_W2L`` (:165-178) — MLP over wav2exp 512-d features.
- ``AudioNet``     (:109-141) — strided 1-D CNN over DeepSpeech windows.
- ``ExpressionEnc`` (:182-193) — MLP over 64-d disentangled expression codes.
- ``AudioAttNet``  (:210-240) — tiny temporal-attention smoother over a
  fixed window (4 audio frames / 8 pose frames in the shipped config).

All are small; they run once per frame, not per sample, so plain XLA is the
right tool — their outputs become per-frame constants folded into the hot
decoder pass.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from dfanerf_tpu.models.layers import (
    conv1d,
    init_conv1d,
    init_linear,
    leaky_relu,
    linear,
)

Params = Dict[str, Any]


# --- AudioNet_W2L: 512 -> 256 -> 128 -> 64 MLP, LeakyReLU(0.02) -------------


def init_audionet_w2l(key: jax.Array) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "fc1": init_linear(k1, 512, 256),
        "fc2": init_linear(k2, 256, 128),
        "fc3": init_linear(k3, 128, 64),
    }


def apply_audionet_w2l(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: [..., 512] wav2exp features -> [..., 64]."""
    x = leaky_relu(linear(params["fc1"], x))
    x = leaky_relu(linear(params["fc2"], x))
    return linear(params["fc3"], x)


# --- ExpressionEnc: 64 -> 32 -> 32 MLP ---------------------------------------


def init_expression_enc(key: jax.Array) -> Params:
    k1, k2 = jax.random.split(key)
    return {"fc1": init_linear(k1, 64, 32), "fc2": init_linear(k2, 32, 32)}


def apply_expression_enc(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: [..., 64] disentangled expression codes -> [..., 32]."""
    return linear(params["fc2"], leaky_relu(linear(params["fc1"], x)))


# --- ExpressionEncHalf: 64 -> 32 -> 64 MLP -----------------------------------
# (run_nerf_helpers.py:196-207 — identity-width variant used by half-signal
# experiments; unused by the shipped trainer but part of the API surface)


def init_expression_enc_half(key: jax.Array) -> Params:
    k1, k2 = jax.random.split(key)
    return {"fc1": init_linear(k1, 64, 32), "fc2": init_linear(k2, 32, 64)}


def apply_expression_enc_half(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: [..., 64] expression codes -> [..., 64]."""
    return linear(params["fc2"], leaky_relu(linear(params["fc1"], x)))


# --- AudioNet (DeepSpeech path): Conv1d 29->32->32->64->64 stride 2 ----------


def init_audionet_ds(key: jax.Array, dim_aud: int = 76, win_size: int = 16) -> Params:
    keys = jax.random.split(key, 6)
    return {
        "conv1": init_conv1d(keys[0], 29, 32, 3),
        "conv2": init_conv1d(keys[1], 32, 32, 3),
        "conv3": init_conv1d(keys[2], 32, 64, 3),
        "conv4": init_conv1d(keys[3], 64, 64, 3),
        "fc1": init_linear(keys[4], 64, 64),
        "fc2": init_linear(keys[5], 64, dim_aud),
    }


def apply_audionet_ds(params: Params, x: jnp.ndarray, win_size: int = 16) -> jnp.ndarray:
    """x: [N, 16, 29] DeepSpeech windows -> [N, dim_aud].

    The reference center-crops the window to ``win_size`` around index 8
    then runs the strided conv stack over the temporal axis.
    """
    half_w = win_size // 2
    x = x[:, 8 - half_w : 8 + half_w, :]  # [N, win, 29] (channel-last)
    x = leaky_relu(conv1d(params["conv1"], x, stride=2, padding=1))
    x = leaky_relu(conv1d(params["conv2"], x, stride=2, padding=1))
    x = leaky_relu(conv1d(params["conv3"], x, stride=2, padding=1))
    x = leaky_relu(conv1d(params["conv4"], x, stride=2, padding=1))  # [N, 1, 64]
    x = x[:, 0, :]
    x = leaky_relu(linear(params["fc1"], x))
    return linear(params["fc2"], x)


# --- AudioAttNet: temporal attention over a fixed smoothing window ----------


def init_audio_attnet(key: jax.Array, dim_aud: int = 96, seq_len: int = 8) -> Params:
    keys = jax.random.split(key, 6)
    return {
        "conv1": init_conv1d(keys[0], dim_aud, 16, 3),
        "conv2": init_conv1d(keys[1], 16, 8, 3),
        "conv3": init_conv1d(keys[2], 8, 4, 3),
        "conv4": init_conv1d(keys[3], 4, 2, 3),
        "conv5": init_conv1d(keys[4], 2, 1, 3),
        "att_fc": init_linear(keys[5], seq_len, seq_len),
    }


def apply_audio_attnet(
    params: Params, x: jnp.ndarray, dim_aud: int
) -> jnp.ndarray:
    """x: [seq_len, D] window of per-frame features -> [D] smoothed feature.

    Attention logits come from the first ``dim_aud`` channels only
    (run_nerf_helpers.py:235 — with the shipped config dim_aud == D so this
    is the full feature), squashed to one channel by the conv stack, mapped
    through a Linear+softmax over the window, and used to average the RAW
    window features.
    """
    seq_len = x.shape[0]
    y = x[None, :, :dim_aud]  # [1, seq_len, dim_aud] channel-last
    y = leaky_relu(conv1d(params["conv1"], y, padding=1))
    y = leaky_relu(conv1d(params["conv2"], y, padding=1))
    y = leaky_relu(conv1d(params["conv3"], y, padding=1))
    y = leaky_relu(conv1d(params["conv4"], y, padding=1))
    y = leaky_relu(conv1d(params["conv5"], y, padding=1))  # [1, seq_len, 1]
    logits = linear(params["att_fc"], y.reshape(1, seq_len))  # [1, seq_len]
    att = jax.nn.softmax(logits, axis=1).reshape(seq_len, 1)
    return jnp.sum(att * x, axis=0)
