"""DeepSpeech-0.1.0 feature network in JAX.

The reference extracts per-frame audio features by running Mozilla
DeepSpeech 0.1.0 as a frozen TensorFlow graph (deepspeech_features/
deepspeech_features.py:79-110) and taking the 29-way character logits.
This module reimplements that network as a pure JAX function so the same
features come from a jitted TPU program:

    input  [T, 494]  (26 MFCC x 19-context windows, stride 2 — see
                      frontend.deepspeech_input_windows)
    h1..h3 dense 2048, relu clipped to 20
    lstm   unidirectional LSTM 2048 (BasicLSTMCell, forget_bias=1)
    h5     dense 2048, relu clipped to 20
    logits dense 29

Weights are an external asset exactly like the reference's .pb (listed in
its .MISSING_LARGE_BLOBS): provide them as an .npz with keys
``h1_w h1_b h2_w h2_b h3_w h3_b lstm_kernel lstm_bias h5_w h5_b h6_w h6_b``
(the TF frozen graph's variable layout: lstm_kernel [2048+494? -> input is
h3's 2048] = [4096, 8192] gate order i,c,f,o as tf.contrib BasicLSTMCell).
``convert_deepspeech_pb.py`` guidance: load the graph with TF, pull the
constants by name, save as this npz. The feature pipeline
(``deepspeech_features_from_wav``) reproduces aud.npy end to end.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dfanerf_tpu.pipeline.audio.frontend import (
    deepspeech_input_windows,
    interpolate_features,
    mfcc,
    sliding_windows,
)

Params = Dict[str, jnp.ndarray]

N_HIDDEN = 2048
N_INPUT = 26 * 19
N_LOGITS = 29
RELU_CLIP = 20.0


def init_deepspeech(key: jax.Array, n_hidden: int = N_HIDDEN) -> Params:
    ks = jax.random.split(key, 6)

    def dense(k, i, o):
        return jax.random.normal(k, (i, o)) * (1.0 / np.sqrt(i))

    return {
        "h1_w": dense(ks[0], N_INPUT, n_hidden), "h1_b": jnp.zeros((n_hidden,)),
        "h2_w": dense(ks[1], n_hidden, n_hidden), "h2_b": jnp.zeros((n_hidden,)),
        "h3_w": dense(ks[2], n_hidden, n_hidden), "h3_b": jnp.zeros((n_hidden,)),
        "lstm_kernel": dense(ks[3], 2 * n_hidden, 4 * n_hidden),
        "lstm_bias": jnp.zeros((4 * n_hidden,)),
        "h5_w": dense(ks[4], n_hidden, n_hidden), "h5_b": jnp.zeros((n_hidden,)),
        "h6_w": dense(ks[5], n_hidden, N_LOGITS), "h6_b": jnp.zeros((N_LOGITS,)),
    }


def load_deepspeech_npz(path: str) -> Params:
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in data.files}


def _clipped_relu(x):
    return jnp.minimum(jax.nn.relu(x), RELU_CLIP)


def apply_deepspeech(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: [T, 494] -> logits [T, 29]."""
    h = _clipped_relu(x @ params["h1_w"] + params["h1_b"])
    h = _clipped_relu(h @ params["h2_w"] + params["h2_b"])
    h = _clipped_relu(h @ params["h3_w"] + params["h3_b"])

    n_hidden = params["h5_w"].shape[0]

    def lstm_step(carry, inp):
        c, hprev = carry
        z = jnp.concatenate([inp, hprev]) @ params["lstm_kernel"] + params["lstm_bias"]
        i, j, f, o = jnp.split(z, 4)
        # BasicLSTMCell: forget_bias=1.0 added to f pre-sigmoid
        c_new = jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * jnp.tanh(j)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return (c_new, h_new), h_new

    init = (jnp.zeros((n_hidden,)), jnp.zeros((n_hidden,)))
    _, hs = jax.lax.scan(lstm_step, init, h)
    h = _clipped_relu(hs @ params["h5_w"] + params["h5_b"])
    return h @ params["h6_w"] + params["h6_b"]


def deepspeech_features_from_wav(
    params: Params,
    wav: np.ndarray,
    sample_rate: int = 16000,
    video_fps: float = 25.0,
    num_frames: Optional[int] = None,
    window_size: int = 16,
) -> np.ndarray:
    """Full aud.npy pipeline: MFCC -> context windows -> network logits at
    50 fps -> linear interp to video fps -> [N, 16, 29] sliding windows
    (pure_conv_audio_to_deepspeech, deepspeech_features.py:114-184)."""
    if sample_rate != 16000:
        t_out = np.arange(int(len(wav) * 16000 / sample_rate)) / 16000.0
        t_in = np.arange(len(wav)) / float(sample_rate)
        wav = np.interp(t_out, t_in, wav)
    feats = mfcc(jnp.asarray(wav.astype(np.float32)))
    x = deepspeech_input_windows(feats)
    logits = np.asarray(jax.jit(apply_deepspeech)(params, x))
    if num_frames is None:
        num_frames = int(round(len(wav) / 16000.0 * video_fps))
    interp = interpolate_features(logits, 50.0, video_fps, num_frames)
    return sliding_windows(interp.astype(np.float32), window_size)
