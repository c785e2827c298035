"""wav2exp audio encoder: Wav2Lip-style mel -> 512-d per-frame features.

Re-design of data_util/wav2exp/models/audioEnc.py:25-51 (Conv2d+BatchNorm2d
blocks, some residual) + the per-frame mel windowing of test_w2l_audio.py:
28-112. Feature extraction is fully batched: every frame's [80, 16] mel
window goes through the conv stack in one jitted call (the reference runs a
DataLoader of batch-64 chunks).

Layout: NHWC (TPU conv-friendly); the converter transposes torch's
NCHW/OIHW weights. BatchNorm runs in inference mode off the checkpoint's
running statistics.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from dfanerf_tpu.pipeline.audio.frontend import Wav2ExpHParams, melspectrogram

Params = Dict[str, Any]

# (cin, cout, kernel, stride(h,w), padding, residual) per block —
# audioEnc.py:29-45; input [B, 80, 16, 1]
ENCODER_SPEC = (
    (1, 32, 3, (1, 1), 1, False),
    (32, 32, 3, (1, 1), 1, True),
    (32, 32, 3, (1, 1), 1, True),
    (32, 64, 3, (3, 1), 1, False),
    (64, 64, 3, (1, 1), 1, True),
    (64, 64, 3, (1, 1), 1, True),
    (64, 128, 3, (3, 3), 1, False),
    (128, 128, 3, (1, 1), 1, True),
    (128, 128, 3, (1, 1), 1, True),
    (128, 256, 3, (3, 2), 1, False),
    (256, 256, 3, (1, 1), 1, True),
    (256, 512, 3, (1, 1), 0, False),
    (512, 512, 1, (1, 1), 0, False),
)


def init_audio_encoder(key: jax.Array) -> Params:
    blocks = []
    keys = jax.random.split(key, len(ENCODER_SPEC))
    for k, (cin, cout, ks, _, _, _) in zip(keys, ENCODER_SPEC):
        bound = 1.0 / np.sqrt(cin * ks * ks)
        kw, kb = jax.random.split(k)
        blocks.append(
            {
                "w": jax.random.uniform(kw, (ks, ks, cin, cout), jnp.float32, -bound, bound),
                "b": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound),
                "bn": {
                    "gamma": jnp.ones((cout,)),
                    "beta": jnp.zeros((cout,)),
                    "mean": jnp.zeros((cout,)),
                    "var": jnp.ones((cout,)),
                },
            }
        )
    return {"blocks": blocks}


def _conv_bn(block, x, stride, padding):
    y = jax.lax.conv_general_dilated(
        x, block["w"], window_strides=stride,
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + block["b"]
    bn = block["bn"]
    return bn["gamma"] * (y - bn["mean"]) / jnp.sqrt(bn["var"] + 1e-5) + bn["beta"]


def apply_audio_encoder(params: Params, mel: jnp.ndarray) -> jnp.ndarray:
    """mel: [B, 80, 16] windows -> [B, 512] features."""
    x = mel[..., None]  # NHWC
    for block, (cin, cout, ks, stride, pad, residual) in zip(
        params["blocks"], ENCODER_SPEC
    ):
        y = _conv_bn(block, x, stride, pad)
        if residual:
            y = y + x
        x = jax.nn.relu(y)
    return x.reshape(x.shape[0], -1)


def audio_encoder_from_torch(sd: Mapping[str, Any]) -> Params:
    """Convert the reference audio_encoder.pth state_dict. Keys follow
    ``audio_encoder.{i}.conv_block.{0,1}.*`` (Conv2d then BatchNorm2d)."""

    def np32(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().numpy()
        return np.array(x, np.float32)  # copy: never alias live torch storage

    blocks = []
    for i in range(len(ENCODER_SPEC)):
        pre = f"audio_encoder.{i}.conv_block"
        blocks.append(
            {
                "w": jnp.asarray(np32(sd[f"{pre}.0.weight"]).transpose(2, 3, 1, 0)),
                "b": jnp.asarray(np32(sd[f"{pre}.0.bias"])),
                "bn": {
                    "gamma": jnp.asarray(np32(sd[f"{pre}.1.weight"])),
                    "beta": jnp.asarray(np32(sd[f"{pre}.1.bias"])),
                    "mean": jnp.asarray(np32(sd[f"{pre}.1.running_mean"])),
                    "var": jnp.asarray(np32(sd[f"{pre}.1.running_var"])),
                },
            }
        )
    return {"blocks": blocks}


def wav2exp_features(
    params: Params, wav: jnp.ndarray, hp: Wav2ExpHParams = Wav2ExpHParams()
) -> np.ndarray:
    """wav [n] -> [N_frames, 512]: mel spectrogram, one 16-step window per
    video frame at ``hp.fps`` (start = int(80 * frame / fps), matching
    test_w2l_audio.py:61-69 with the mel's 80 steps/sec), batched encode."""
    mel = melspectrogram(wav, hp)  # [T, 80]
    t = int(mel.shape[0])
    n_frames = int((t - hp.mel_step_size) / 80.0 * hp.fps)
    starts = (80.0 * np.arange(n_frames) / float(hp.fps)).astype(np.int32)
    idx = starts[:, None] + np.arange(hp.mel_step_size)[None, :]
    windows = jnp.transpose(mel[jnp.asarray(idx)], (0, 2, 1))  # [N, 80, 16]
    out = _apply_jit(params, windows)
    return np.asarray(out)


# module-level wrapper: a fresh jax.jit(...) per call would re-trace the
# encoder on every utterance (same shapes hit this cache after the first)
_apply_jit = jax.jit(lambda params, windows: apply_audio_encoder(params,
                                                                 windows))
