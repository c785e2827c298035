"""Model parity tests: our functional pytree modules vs the PyTorch
reference networks, weight-for-weight via the compat converters."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import add_reference_to_path, reference_available

from dfanerf_tpu.models import (
    DecoderConfig,
    apply_audio_attnet,
    apply_audionet_ds,
    apply_audionet_w2l,
    apply_decoder,
    apply_expression_enc,
    init_audio_attnet,
    init_audionet_ds,
    init_audionet_w2l,
    init_decoder,
    init_expression_enc,
)
from dfanerf_tpu.compat.torch_ckpt import (
    audio_attnet_from_torch,
    audionet_ds_from_torch,
    audionet_w2l_from_torch,
    decoder_from_torch,
    expression_enc_from_torch,
)

needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)

CFG = DecoderConfig()  # shipped train_obama.sh configuration


class TestShapes:
    def test_decoder_shapes(self):
        params = init_decoder(jax.random.PRNGKey(0), CFG)
        N = 128
        p = jax.random.normal(jax.random.PRNGKey(1), (N, 3))
        rd = jax.random.normal(jax.random.PRNGKey(2), (N, 3))
        z = jax.random.normal(jax.random.PRNGKey(3), (CFG.z_dim,))
        sig = jnp.ones((CFG.dim_signal,))
        feat, sigma = apply_decoder(params, CFG, p, rd, z, z, sig, "head")
        assert feat.shape == (N, 3) and sigma.shape == (N,)
        assert float(feat.min()) >= 0 and float(feat.max()) <= 1  # sigmoid
        sig_t = jnp.ones((CFG.dim_et_embed,))
        feat, sigma = apply_decoder(params, CFG, p, rd, z, z, sig_t, "torso")
        assert feat.shape == (N, 3) and sigma.shape == (N,)
        feat, sigma = apply_decoder(params, CFG, p, rd, z, z, None, "head_listener")
        assert feat.shape == (N, 3) and sigma.shape == (N,)

    def test_encoder_shapes(self):
        k = jax.random.PRNGKey(0)
        out = apply_audionet_w2l(init_audionet_w2l(k), jnp.ones((4, 512)))
        assert out.shape == (4, 64)
        out = apply_expression_enc(init_expression_enc(k), jnp.ones((4, 64)))
        assert out.shape == (4, 32)
        out = apply_audionet_ds(init_audionet_ds(k, dim_aud=76), jnp.ones((4, 16, 29)))
        assert out.shape == (4, 76)
        out = apply_audio_attnet(init_audio_attnet(k, 96, 8), jnp.ones((8, 96)), 96)
        assert out.shape == (96,)

    def test_decoder_jits(self):
        params = init_decoder(jax.random.PRNGKey(0), CFG)
        f = jax.jit(
            lambda pr, p, rd, z1, z2, s: apply_decoder(pr, CFG, p, rd, z1, z2, s, "head")
        )
        p = jnp.ones((64, 3))
        feat, sigma = f(params, p, p, jnp.ones((256,)), jnp.ones((256,)), jnp.ones((96,)))
        assert feat.shape == (64, 3)


@needs_reference
class TestReferenceParity:
    def _torch_decoder(self):
        add_reference_to_path()
        import torch
        from decoder import Decoder as TorchDecoder

        torch.manual_seed(0)
        dec = TorchDecoder(
            z_dim=CFG.z_dim,
            hidden_size=CFG.hidden_size,
            dim_signal=CFG.dim_signal,
            use_deformation_field=True,
            use_expression=False,
        )
        return torch, dec

    def test_decoder_head_parity(self):
        torch, dec = self._torch_decoder()
        params = decoder_from_torch(dec.state_dict())
        N = 200
        rng = np.random.RandomState(0)
        p = rng.randn(1, N, 3).astype(np.float32)
        rd = rng.randn(1, N, 3).astype(np.float32)
        z_s = rng.randn(1, CFG.z_dim).astype(np.float32)
        z_a = rng.randn(1, CFG.z_dim).astype(np.float32)
        sig = rng.randn(1, CFG.dim_signal).astype(np.float32)
        with torch.no_grad():
            ref_feat, ref_sigma = dec(
                torch.tensor(p),
                torch.tensor(rd),
                torch.tensor(z_s),
                torch.tensor(z_a),
                [torch.tensor(sig), None],
                "head",
            )
        feat, sigma = apply_decoder(
            params, CFG, jnp.asarray(p[0]), jnp.asarray(rd[0]),
            jnp.asarray(z_s[0]), jnp.asarray(z_a[0]), jnp.asarray(sig[0]), "head",
        )
        np.testing.assert_allclose(np.asarray(feat), ref_feat.numpy()[0], atol=2e-5)
        np.testing.assert_allclose(np.asarray(sigma), ref_sigma.numpy()[0], atol=2e-4)

    def test_decoder_torso_parity(self):
        torch, dec = self._torch_decoder()
        params = decoder_from_torch(dec.state_dict())
        N = 200
        rng = np.random.RandomState(1)
        p = rng.randn(1, N, 3).astype(np.float32)
        rd = rng.randn(1, N, 3).astype(np.float32)
        z_s = rng.randn(1, CFG.z_dim).astype(np.float32)
        z_a = rng.randn(1, CFG.z_dim).astype(np.float32)
        sig = rng.randn(1, CFG.dim_et_embed).astype(np.float32)
        with torch.no_grad():
            ref_feat, ref_sigma = dec(
                torch.tensor(p), torch.tensor(rd), torch.tensor(z_s),
                torch.tensor(z_a), torch.tensor(sig), "torso",
            )
        feat, sigma = apply_decoder(
            params, CFG, jnp.asarray(p[0]), jnp.asarray(rd[0]),
            jnp.asarray(z_s[0]), jnp.asarray(z_a[0]), jnp.asarray(sig[0]), "torso",
        )
        np.testing.assert_allclose(np.asarray(feat), ref_feat.numpy()[0], atol=2e-5)
        np.testing.assert_allclose(np.asarray(sigma), ref_sigma.numpy()[0], atol=2e-4)

    def test_decoder_listener_parity(self):
        torch, dec = self._torch_decoder()
        params = decoder_from_torch(dec.state_dict())
        N = 64
        rng = np.random.RandomState(2)
        p = rng.randn(1, N, 3).astype(np.float32)
        rd = rng.randn(1, N, 3).astype(np.float32)
        z_s = rng.randn(1, CFG.z_dim).astype(np.float32)
        z_a = rng.randn(1, CFG.z_dim).astype(np.float32)
        with torch.no_grad():
            ref_feat, ref_sigma = dec(
                torch.tensor(p), torch.tensor(rd), torch.tensor(z_s),
                torch.tensor(z_a), [None, None], "head",
            )
        feat, sigma = apply_decoder(
            params, CFG, jnp.asarray(p[0]), jnp.asarray(rd[0]),
            jnp.asarray(z_s[0]), jnp.asarray(z_a[0]), None, "head_listener",
        )
        np.testing.assert_allclose(np.asarray(feat), ref_feat.numpy()[0], atol=2e-5)
        np.testing.assert_allclose(np.asarray(sigma), ref_sigma.numpy()[0], atol=2e-4)

    def test_audionet_w2l_parity(self):
        add_reference_to_path()
        import torch
        from run_nerf_helpers import AudioNet_W2L

        torch.manual_seed(1)
        net = AudioNet_W2L()
        params = audionet_w2l_from_torch(net.state_dict())
        x = np.random.RandomState(5).randn(6, 512).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.tensor(x)).numpy()
        ours = np.asarray(apply_audionet_w2l(params, jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_expression_enc_parity(self):
        add_reference_to_path()
        import torch
        from run_nerf_helpers import ExpressionEnc

        torch.manual_seed(2)
        net = ExpressionEnc()
        params = expression_enc_from_torch(net.state_dict())
        x = np.random.RandomState(6).randn(6, 64).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.tensor(x)).numpy()
        ours = np.asarray(apply_expression_enc(params, jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_expression_enc_half_parity(self):
        add_reference_to_path()
        import torch
        from run_nerf_helpers import ExpressionEncHalf

        from dfanerf_tpu.models.encoders import apply_expression_enc_half

        torch.manual_seed(2)
        net = ExpressionEncHalf()
        params = expression_enc_from_torch(net.state_dict())
        x = np.random.RandomState(6).randn(6, 64).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.tensor(x)).numpy()
        ours = np.asarray(apply_expression_enc_half(params, jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_get_half_signals_parity(self):
        add_reference_to_path()
        import torch
        from run_nerf_helpers import get_half_signals

        from dfanerf_tpu.train.signals import get_half_signals as ours_fn

        rng = np.random.RandomState(3)
        sig_aud = rng.randn(96).astype(np.float32)
        sig_eye = rng.randn(96).astype(np.float32)
        ref = get_half_signals(
            8, 6, [torch.tensor(sig_aud), torch.tensor(sig_eye)]
        ).numpy()
        ours = np.asarray(ours_fn(8, 6, jnp.asarray(sig_aud), jnp.asarray(sig_eye)))
        np.testing.assert_allclose(ours, ref, atol=0)

    def test_audionet_ds_parity(self):
        add_reference_to_path()
        import torch
        from run_nerf_helpers import AudioNet

        torch.manual_seed(3)
        net = AudioNet(dim_aud=76, win_size=16)
        params = audionet_ds_from_torch(net.state_dict())
        x = np.random.RandomState(7).randn(4, 16, 29).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.tensor(x)).numpy()
        ours = np.asarray(apply_audionet_ds(params, jnp.asarray(x), win_size=16))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_audio_attnet_parity(self):
        add_reference_to_path()
        import torch
        from run_nerf_helpers import AudioAttNet

        torch.manual_seed(4)
        net = AudioAttNet(dim_aud=96, seq_len=8)
        params = audio_attnet_from_torch(net.state_dict())
        x = np.random.RandomState(8).randn(8, 96).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.tensor(x)).numpy()
        ours = np.asarray(apply_audio_attnet(params, jnp.asarray(x), 96))
        np.testing.assert_allclose(ours, ref, atol=1e-5)


@needs_reference
class TestGaussPE:
    """positional_encoding='gauss' parity (decoder.py:189-199,257-269).

    The reference constructor calls .cuda() on the B matrices, so the
    source is exec'd with those calls stripped (the test_zoo.py pattern)
    to run on CPU torch.
    """

    def _torch_gauss_decoder(self, **kw):
        import importlib.util
        import os as _os
        import types

        add_reference_to_path()
        import torch

        from conftest import REFERENCE_ROOT

        path = _os.path.join(REFERENCE_ROOT, "NeRFs", "DFANeRF", "decoder.py")
        src = open(path).read().replace(".cuda()", "")
        mod = types.ModuleType("ref_decoder_nocuda")
        exec(compile(src, path, "exec"), mod.__dict__)
        torch.manual_seed(0)
        dec = mod.Decoder(
            z_dim=CFG.z_dim,
            hidden_size=CFG.hidden_size,
            dim_signal=CFG.dim_signal,
            use_deformation_field=True,
            use_expression=False,
            positional_encoding="gauss",
            **kw,
        )
        return torch, dec

    def test_gauss_b_matrices_match_reference(self):
        """Our seed-42 construction reproduces the reference's B buffers."""
        from dfanerf_tpu.core.posenc import gauss_B_matrices

        torch, dec = self._torch_gauss_decoder()
        b_pos, b_view = gauss_B_matrices(10, 4, 4.0)
        np.testing.assert_allclose(
            np.asarray(b_pos), dec.B_pos.numpy()[0], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(b_view), dec.B_view.numpy()[0], atol=1e-6
        )

    @pytest.mark.parametrize("branch,dim_sig", [
        ("head", 96), ("torso", 42),
    ])
    def test_gauss_decoder_parity(self, branch, dim_sig):
        torch, dec = self._torch_gauss_decoder()
        cfg = DecoderConfig(positional_encoding="gauss")
        params = decoder_from_torch(dec.state_dict())
        N = 128
        rng = np.random.RandomState(5)
        p = rng.randn(1, N, 3).astype(np.float32)
        rd = rng.randn(1, N, 3).astype(np.float32)
        z_s = rng.randn(1, cfg.z_dim).astype(np.float32)
        z_a = rng.randn(1, cfg.z_dim).astype(np.float32)
        sig = rng.randn(1, dim_sig).astype(np.float32)
        sig_t = [torch.tensor(sig), None] if branch == "head" else torch.tensor(sig)
        with torch.no_grad():
            ref_feat, ref_sigma = dec(
                torch.tensor(p), torch.tensor(rd), torch.tensor(z_s),
                torch.tensor(z_a), sig_t, branch,
            )
        feat, sigma = apply_decoder(
            params, cfg, jnp.asarray(p[0]), jnp.asarray(rd[0]),
            jnp.asarray(z_s[0]), jnp.asarray(z_a[0]), jnp.asarray(sig[0]),
            branch,
        )
        np.testing.assert_allclose(np.asarray(feat), ref_feat.numpy()[0], atol=3e-5)
        np.testing.assert_allclose(np.asarray(sigma), ref_sigma.numpy()[0], atol=3e-4)

    def test_gauss_nondefault_dims(self):
        """gauss_dim_pos/view != defaults change every embed-fed layer."""
        torch, dec = self._torch_gauss_decoder(gauss_dim_pos=6, gauss_dim_view=2,
                                               gauss_std=2.0)
        cfg = DecoderConfig(positional_encoding="gauss", gauss_dim_pos=6,
                            gauss_dim_view=2, gauss_std=2.0)
        assert cfg.dim_embed == 36 and cfg.dim_embed_view == 12
        params = decoder_from_torch(dec.state_dict())
        N = 64
        rng = np.random.RandomState(6)
        p = rng.randn(1, N, 3).astype(np.float32)
        rd = rng.randn(1, N, 3).astype(np.float32)
        z_s = rng.randn(1, cfg.z_dim).astype(np.float32)
        z_a = rng.randn(1, cfg.z_dim).astype(np.float32)
        sig = rng.randn(1, cfg.dim_signal).astype(np.float32)
        with torch.no_grad():
            ref_feat, ref_sigma = dec(
                torch.tensor(p), torch.tensor(rd), torch.tensor(z_s),
                torch.tensor(z_a), [torch.tensor(sig), None], "head",
            )
        feat, sigma = apply_decoder(
            params, cfg, jnp.asarray(p[0]), jnp.asarray(rd[0]),
            jnp.asarray(z_s[0]), jnp.asarray(z_a[0]), jnp.asarray(sig[0]),
            "head",
        )
        np.testing.assert_allclose(np.asarray(feat), ref_feat.numpy()[0], atol=3e-5)
        np.testing.assert_allclose(np.asarray(sigma), ref_sigma.numpy()[0], atol=3e-4)
