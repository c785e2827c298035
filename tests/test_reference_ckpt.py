"""Full reference-checkpoint interop: build a genuine torch .tar with the
reference networks, convert with load_reference_checkpoint, and render."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import add_reference_to_path, reference_available

needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


@needs_reference
def test_tar_roundtrip_and_render(tmp_path):
    add_reference_to_path()
    import torch
    from decoder import Decoder as TorchDecoder
    from run_nerf_helpers import AudioAttNet, AudioNet_W2L, ExpressionEnc

    from dfanerf_tpu.compat import load_reference_checkpoint
    from dfanerf_tpu.config import ExperimentConfig, RenderConfig
    from dfanerf_tpu.models import DecoderConfig
    from dfanerf_tpu.render.fields import render_ray_batch
    from dfanerf_tpu.train.signals import encode_signal, encode_signal_torso

    torch.manual_seed(0)
    cfg = DecoderConfig()
    dec = TorchDecoder(z_dim=256, hidden_size=256, dim_signal=96,
                       use_deformation_field=True)
    state = {
        "global_step": 123456,
        "z_shape": torch.randn(1, 2, 256),
        "z_app": torch.randn(1, 2, 256),
        "network_decoder_state_dict": dec.state_dict(),
        "network_AudNet_state_dict": AudioNet_W2L().state_dict(),
        "network_ExpNet_state_dict": ExpressionEnc().state_dict(),
        "network_AudAttNet_state_dict": AudioAttNet(dim_aud=96, seq_len=4).state_dict(),
        "network_PoseAttNet_state_dict": AudioAttNet(dim_aud=42, seq_len=8).state_dict(),
    }
    path = str(tmp_path / "123456.tar")
    torch.save(state, path)

    ckpt = load_reference_checkpoint(path)
    assert ckpt["global_step"] == 123456
    assert ckpt["z_shape"].shape == (1, 2, 256)
    params = {
        "decoder": ckpt["decoder"],
        "audnet": ckpt["audnet"],
        "expnet": ckpt["expnet"],
        "audattnet": ckpt["audattnet"],
        "poseattnet": ckpt["poseattnet"],
    }

    # drive the full render path with the converted weights: signals from
    # fake per-frame features, both fields, bg concat
    rng = np.random.RandomState(1)
    auds = jnp.asarray(rng.randn(10, 512).astype(np.float32))
    exps = jnp.asarray(rng.randn(10, 64).astype(np.float32))
    poses = jnp.broadcast_to(jnp.eye(4), (10, 4, 4))
    sig = encode_signal(params, auds, exps, jnp.int32(3), jnp.int32(10), 4,
                        jnp.bool_(True))
    sig_t = encode_signal_torso(params, poses, jnp.int32(3), jnp.int32(10),
                                8, jnp.bool_(True))
    assert sig.shape == (96,) and sig_t.shape == (42,)

    n, S = 64, 8
    rays_o = jnp.zeros((n, 3))
    rays_d = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (n, 3))
    z_vals = jnp.broadcast_to(jnp.linspace(0.3, 0.9, S), (n, S))
    bc = jnp.full((n, 3), 0.5)
    rcfg = RenderConfig(n_samples=S)
    rgb_head, rgb_com = render_ray_batch(
        params["decoder"], cfg, rcfg,
        rays_o, rays_d, rays_o, rays_d, z_vals, sig, sig_t,
        ckpt["z_shape"][0, 0], ckpt["z_app"][0, 0],
        ckpt["z_shape"][0, 1], ckpt["z_app"][0, 1], bc,
    )
    assert bool(jnp.isfinite(rgb_head).all() and jnp.isfinite(rgb_com).all())
