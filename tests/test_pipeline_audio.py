"""Audio stack tests: DSP frontend properties + encoder parity vs the
PyTorch reference architecture."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import REFERENCE_ROOT, reference_available

from dfanerf_tpu.pipeline.audio import (
    Wav2ExpHParams,
    apply_audio_encoder,
    audio_encoder_from_torch,
    init_audio_encoder,
    melspectrogram,
    mfcc,
    sliding_windows,
    wav2exp_features,
)
from dfanerf_tpu.pipeline.audio.deepspeech import (
    apply_deepspeech,
    deepspeech_features_from_wav,
    init_deepspeech,
)
from dfanerf_tpu.pipeline.audio.frontend import deepspeech_input_windows

needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


class TestFrontend:
    def test_mel_shape_and_range(self):
        wav = jnp.asarray(np.random.RandomState(0).randn(16000).astype(np.float32) * 0.1)
        mel = melspectrogram(wav)
        assert mel.shape[1] == 80
        assert mel.shape[0] == 16000 // 200 + 1  # centered STFT frames
        assert float(mel.min()) >= -4.0 and float(mel.max()) <= 4.0

    def test_mel_tone_peaks_at_right_band(self):
        hp = Wav2ExpHParams()
        t = np.arange(32000) / hp.sample_rate
        for freq, expect_low in ((200.0, True), (4000.0, False)):
            wav = jnp.asarray(np.sin(2 * np.pi * freq * t).astype(np.float32))
            mel = np.asarray(melspectrogram(wav, hp))
            band = mel.mean(0).argmax()
            assert (band < 20) == expect_low, f"{freq}Hz peaked at band {band}"

    def test_mfcc_shape(self):
        sig = jnp.asarray((np.random.RandomState(1).randn(16000) * 1000).astype(np.float32))
        out = mfcc(sig)
        assert out.shape == (1 + int(np.ceil((16000 - 400) / 160)), 26)
        assert bool(jnp.isfinite(out).all())

    def test_deepspeech_windows_contract(self):
        feats = jnp.asarray(np.random.RandomState(2).randn(100, 26).astype(np.float32))
        x = deepspeech_input_windows(feats)
        assert x.shape == (50, 19 * 26)
        np.testing.assert_allclose(float(x.mean()), 0.0, atol=1e-5)
        np.testing.assert_allclose(float(x.std()), 1.0, atol=1e-4)

    def test_sliding_windows(self):
        f = np.arange(20, dtype=np.float32).reshape(10, 2)
        w = sliding_windows(f, window_size=4)
        assert w.shape[1:] == (4, 2)
        assert (w[0][:2] == 0).all()  # zero left pad


class TestDeepSpeechNet:
    def test_logits_shape_and_pipeline(self):
        params = init_deepspeech(jax.random.PRNGKey(0), n_hidden=64)
        x = jnp.asarray(np.random.RandomState(3).randn(10, 494).astype(np.float32))
        logits = apply_deepspeech(params, x)
        assert logits.shape == (10, 29)
        wav = np.random.RandomState(4).randn(16000).astype(np.float32) * 1000
        out = deepspeech_features_from_wav(params, wav, video_fps=25.0)
        assert out.shape[1:] == (16, 29)
        assert out.shape[0] >= 24  # ~1 second at 25 fps
        assert np.isfinite(out).all()


class TestWav2Exp:
    def test_feature_extraction_shapes(self):
        params = init_audio_encoder(jax.random.PRNGKey(0))
        wav = jnp.asarray(np.random.RandomState(5).randn(24000).astype(np.float32) * 0.1)
        feats = wav2exp_features(params, wav)
        assert feats.shape[1] == 512
        assert feats.shape[0] > 20  # 1.5 s -> ~35 frames
        assert np.isfinite(feats).all()

    @needs_reference
    def test_encoder_parity_vs_torch(self):
        import sys, os

        # both reference trees expose a top-level 'models' package; drop any
        # previously-imported one (e.g. face-alignment's) before importing
        for k in [k for k in sys.modules if k == "models" or k.startswith("models.")]:
            del sys.modules[k]
        sys.path.insert(0, os.path.join(REFERENCE_ROOT, "data_util", "wav2exp"))
        import torch
        from models.audioEnc import AudioEncoder

        torch.manual_seed(0)
        net = AudioEncoder().eval()
        params = audio_encoder_from_torch(net.state_dict())
        mel = np.random.RandomState(6).randn(4, 80, 16).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.tensor(mel[:, None])).numpy()
        ours = np.asarray(apply_audio_encoder(params, jnp.asarray(mel)))
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)
