"""Audio feature stack: DSP frontends (mel spectrogram, MFCC) implemented
in jnp from scratch (no librosa/python_speech_features in this image), the
wav2exp AudioEncoder, and the DeepSpeech feature network."""

from dfanerf_tpu.pipeline.audio.frontend import (
    melspectrogram,
    mfcc,
    Wav2ExpHParams,
    interpolate_features,
    sliding_windows,
)
from dfanerf_tpu.pipeline.audio.wav2exp import (
    init_audio_encoder,
    apply_audio_encoder,
    audio_encoder_from_torch,
    wav2exp_features,
)

__all__ = [
    "melspectrogram",
    "mfcc",
    "Wav2ExpHParams",
    "interpolate_features",
    "sliding_windows",
    "init_audio_encoder",
    "apply_audio_encoder",
    "audio_encoder_from_torch",
    "wav2exp_features",
]
