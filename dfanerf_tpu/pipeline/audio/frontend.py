"""Audio DSP frontends, self-contained (jnp + numpy, no librosa/psf).

Two frontends feed the two audio paths of the reference:

1. ``melspectrogram`` — the wav2exp/Wav2Lip frontend (reference:
   data_util/wav2exp/audio.py:45-50 with hparams.py defaults): 16 kHz,
   preemphasis 0.97, centered STFT n_fft=800 hop=200 win=800 (hann),
   80 slaney-normalized mel bands (fmin 55, fmax 7600), amp->dB with a
   -100 dB floor, ref level 20 dB, symmetric normalization clipped to
   [-4, 4]. Output [T, 80] (time-major like the reference's orig_mel.T).

2. ``mfcc`` — the DeepSpeech frontend (reference: deepspeech_features/
   deepspeech_features.py:187-243 via python_speech_features defaults):
   25 ms rectangular-window frames at 10 ms hop, 512-pt FFT power spectrum,
   26 HTK-mel filters, DCT-II (ortho) keeping 26 coefficients, log-energy
   replacing c0, liftering 22.

Plus the feature-window utilities (50 fps -> video fps interpolation and
16-frame sliding windows).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Wav2ExpHParams:
    """wav2exp/hparams.py values (the shipped configuration)."""

    num_mels: int = 80
    n_fft: int = 800
    hop_size: int = 200
    win_size: int = 800
    sample_rate: int = 16000
    preemphasis: float = 0.97
    min_level_db: float = -100.0
    ref_level_db: float = 20.0
    fmin: float = 55.0
    fmax: float = 7600.0
    max_abs_value: float = 4.0
    fps: int = 25
    mel_step_size: int = 16


# --- mel filterbank construction (slaney + htk variants) --------------------


def _hz_to_mel(f, htk: bool):
    f = np.asarray(f, np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # slaney: linear below 1 kHz, log above
    f_sp = 200.0 / 3
    mel = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep, mel)


def _mel_to_hz(m, htk: bool):
    m = np.asarray(m, np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f_sp * m
    )


def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float,
    htk: bool = False, norm_slaney: bool = True,
) -> np.ndarray:
    """[n_mels, n_fft//2 + 1] triangular filterbank (librosa-compatible for
    htk=False/norm_slaney=True; python_speech_features-compatible for
    htk=True/norm_slaney=False)."""
    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel(fmin, htk), _hz_to_mel(fmax, htk), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, htk)
    fb = np.zeros((n_mels, len(fft_freqs)))
    for i in range(n_mels):
        lower = (fft_freqs - hz_pts[i]) / max(hz_pts[i + 1] - hz_pts[i], 1e-10)
        upper = (hz_pts[i + 2] - fft_freqs) / max(hz_pts[i + 2] - hz_pts[i + 1], 1e-10)
        fb[i] = np.maximum(0, np.minimum(lower, upper))
    if norm_slaney:
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        fb *= enorm[:, None]
    return fb.astype(np.float32)


# --- STFT --------------------------------------------------------------------


def preemphasize(wav: jnp.ndarray, k: float) -> jnp.ndarray:
    """y[n] = x[n] - k*x[n-1] (scipy.signal.lfilter([1,-k],[1]) semantics)."""
    return jnp.concatenate([wav[:1], wav[1:] - k * wav[:-1]])


def stft_mag(
    wav: jnp.ndarray, n_fft: int, hop: int, win_length: int, center: bool = True
) -> jnp.ndarray:
    """Magnitude STFT, librosa conventions: reflect-pad n_fft//2 when
    centered, periodic hann window. Returns [n_fft//2+1, T]."""
    if center:
        wav = jnp.pad(wav, (n_fft // 2, n_fft // 2), mode="reflect")
    n_frames = 1 + (wav.shape[0] - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = wav[idx]
    hann = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * jnp.arange(win_length) / win_length)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        hann = jnp.pad(hann, (pad, n_fft - win_length - pad))
    spec = jnp.fft.rfft(frames * hann, n=n_fft, axis=-1)
    return jnp.abs(spec).T


# --- wav2exp mel spectrogram --------------------------------------------------


def melspectrogram(wav: jnp.ndarray, hp: Wav2ExpHParams = Wav2ExpHParams()):
    """wav [n] float in [-1,1] -> [T, num_mels] normalized mel, matching
    wav2exp/audio.py melspectrogram (transposed to time-major)."""
    fb = jnp.asarray(
        mel_filterbank(hp.sample_rate, hp.n_fft, hp.num_mels, hp.fmin, hp.fmax)
    )
    mag = stft_mag(preemphasize(wav, hp.preemphasis), hp.n_fft, hp.hop_size, hp.win_size)
    mel = fb @ mag
    min_level = jnp.exp(hp.min_level_db / 20.0 * jnp.log(10.0))
    s = 20.0 * jnp.log10(jnp.maximum(min_level, mel)) - hp.ref_level_db
    # symmetric normalization with clipping
    s = jnp.clip(
        (2 * hp.max_abs_value) * ((s - hp.min_level_db) / (-hp.min_level_db))
        - hp.max_abs_value,
        -hp.max_abs_value,
        hp.max_abs_value,
    )
    return s.T


# --- DeepSpeech MFCC ----------------------------------------------------------


def mfcc(
    signal: jnp.ndarray,
    samplerate: int = 16000,
    winlen: float = 0.025,
    winstep: float = 0.01,
    numcep: int = 26,
    nfilt: int = 26,
    nfft: int = 512,
    preemph: float = 0.97,
    ceplifter: int = 22,
    append_energy: bool = True,
) -> jnp.ndarray:
    """python_speech_features.mfcc replica (defaults as the reference calls
    it with numcep=26). signal: int16-scale samples. Returns [T, numcep]."""
    signal = jnp.asarray(signal, jnp.float32)
    signal = preemphasize(signal, preemph)
    frame_len = int(round(winlen * samplerate))
    frame_step = int(round(winstep * samplerate))
    n = signal.shape[0]
    n_frames = 1 + max(0, int(np.ceil((n - frame_len) / frame_step)))
    pad = (n_frames - 1) * frame_step + frame_len - n
    signal = jnp.pad(signal, (0, max(pad, 0)))
    idx = jnp.arange(n_frames)[:, None] * frame_step + jnp.arange(frame_len)[None, :]
    frames = signal[idx]  # rectangular window (psf default winfunc)
    spec = jnp.abs(jnp.fft.rfft(frames, n=nfft, axis=-1))
    pow_spec = (spec ** 2) / nfft
    energy = jnp.sum(pow_spec, axis=-1)
    energy = jnp.where(energy == 0, jnp.finfo(jnp.float32).eps, energy)
    fb = jnp.asarray(
        mel_filterbank(samplerate, nfft, nfilt, 0.0, samplerate / 2,
                       htk=True, norm_slaney=False)
    )
    feat = pow_spec @ fb.T
    feat = jnp.where(feat == 0, jnp.finfo(jnp.float32).eps, feat)
    feat = jnp.log(feat)
    # DCT-II orthonormal over the filter axis, keep numcep
    k = jnp.arange(nfilt)
    dct_m = jnp.cos(jnp.pi * k[:, None] * (2 * k[None, :] + 1) / (2.0 * nfilt))
    scale = jnp.full((nfilt,), jnp.sqrt(2.0 / nfilt)).at[0].set(jnp.sqrt(1.0 / nfilt))
    feat = (feat @ dct_m.T) * scale
    feat = feat[:, :numcep]
    if ceplifter > 0:
        lift = 1 + (ceplifter / 2.0) * jnp.sin(jnp.pi * jnp.arange(numcep) / ceplifter)
        feat = feat * lift
    if append_energy:
        feat = feat.at[:, 0].set(jnp.log(energy))
    return feat


def deepspeech_input_windows(
    features: jnp.ndarray, num_context: int = 9
) -> jnp.ndarray:
    """MFCC [T, C] -> DeepSpeech input [T//2, (2*ctx+1)*C]: stride-2
    subsample, zero context pads, overlapping context windows, global
    mean/std normalization (deepspeech_features.py:186-242)."""
    feats = features[::2]
    t, c = feats.shape
    feats = jnp.pad(feats, ((num_context, num_context), (0, 0)))
    win = 2 * num_context + 1
    idx = jnp.arange(t)[:, None] + jnp.arange(win)[None, :]
    out = feats[idx].reshape(t, win * c)
    return (out - out.mean()) / out.std()


def interpolate_features(
    features: np.ndarray, input_rate: float, output_rate: float, output_len: int
) -> np.ndarray:
    """Linear resample along time (deepspeech_features.py:245-278)."""
    input_len = features.shape[0]
    in_t = np.arange(input_len) / float(input_rate)
    out_t = np.arange(output_len) / float(output_rate)
    return np.stack(
        [np.interp(out_t, in_t, features[:, i]) for i in range(features.shape[1])],
        axis=1,
    )


def sliding_windows(features: np.ndarray, window_size: int = 16, stride: int = 1):
    """Zero-pad half a window on both sides and emit overlapping windows —
    the aud.npy [N, 16, 29] contract (deepspeech_features.py:174-183)."""
    zero = np.zeros((window_size // 2, features.shape[1]), features.dtype)
    padded = np.concatenate([zero, features, zero], axis=0)
    return np.stack(
        [
            padded[i : i + window_size]
            for i in range(0, padded.shape[0] - window_size, stride)
        ]
    )
