"""End-to-end TRAINING parity vs a PyTorch oracle: identical converted
weights, identical ray batch, identical staged-Adam schedule -> matching
loss at step 0 and matching parameters after 5 optimizer steps.

This is the de-risker for the "within 0.1 dB of the reference" target: the
forward (decoder + signals + bg-concat + compositing + MSE losses) and the
optimizer dynamics must agree step for step; the only unavoidable
divergence left in real training is RNG stream choice."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import add_reference_to_path, reference_available

needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


@needs_reference
def test_five_step_training_parity():
    add_reference_to_path()
    import torch
    import torch.nn.functional as F
    from decoder import Decoder as TorchDecoder
    from run_nerf_helpers import AudioNet_W2L, ExpressionEnc

    from dfanerf_tpu.compat.torch_ckpt import (
        audionet_w2l_from_torch,
        decoder_from_torch,
        expression_enc_from_torch,
    )
    from dfanerf_tpu.config import RenderConfig
    from dfanerf_tpu.models import DecoderConfig
    from dfanerf_tpu.models.encoders import (
        apply_audionet_w2l,
        apply_expression_enc,
    )
    from dfanerf_tpu.render.fields import render_ray_batch
    from dfanerf_tpu.train.optim import adam_init, adam_update

    torch.manual_seed(0)
    cfg = DecoderConfig()
    rcfg = RenderConfig(n_samples=8)
    R, S = 64, 8
    LR = 5e-4

    tdec = TorchDecoder(z_dim=256, hidden_size=256, dim_signal=96,
                        use_deformation_field=True)
    taud = AudioNet_W2L()
    texp = ExpressionEnc()

    params = {
        "decoder": decoder_from_torch(tdec.state_dict()),
        "audnet": audionet_w2l_from_torch(taud.state_dict()),
        "expnet": expression_enc_from_torch(texp.state_dict()),
    }

    # one fixed batch (pre-nosmo path: per-frame signals, no smoothing)
    rng = np.random.RandomState(1)
    aud_raw = rng.randn(1, 512).astype(np.float32)
    exp_raw = rng.randn(1, 64).astype(np.float32)
    rays_o = (rng.randn(R, 3) * 0.05).astype(np.float32)
    rays_d = (rng.randn(R, 3) * 0.2 + np.array([0, 0, -1.0])).astype(np.float32)
    rays_o_t = (rng.randn(R, 3) * 0.05).astype(np.float32)
    rays_d_t = (rng.randn(R, 3) * 0.2 + np.array([0, 0, -1.0])).astype(np.float32)
    z_np = np.broadcast_to(np.linspace(0.3, 0.9, S, dtype=np.float32), (R, S)).copy()
    et = rng.randn(42).astype(np.float32)  # fixed torso signal (PE'd pose)
    z_s = rng.randn(2, 256).astype(np.float32)
    z_a = rng.randn(2, 256).astype(np.float32)
    bc = rng.rand(R, 3).astype(np.float32)
    target_head = rng.rand(R, 3).astype(np.float32)
    target_com = rng.rand(R, 3).astype(np.float32)

    # ---- torch oracle: the reference iteration, inlined (trainer module is
    # not importable without configargparse) ----
    opt_dec = torch.optim.Adam(tdec.parameters(), lr=LR, betas=(0.9, 0.999))
    opt_aud = torch.optim.Adam(taud.parameters(), lr=LR, betas=(0.9, 0.999))
    # ExpNet optimizer exists but never steps before noexp_iters

    def torch_step():
        signal = torch.cat(
            [taud(torch.tensor(aud_raw)), texp(torch.tensor(exp_raw))], dim=1
        )
        tz = torch.tensor(z_np)

        def field(pose_o, pose_d, sig, zi_s, zi_a, branch):
            pts = torch.tensor(pose_o)[:, None, :] + \
                torch.tensor(pose_d)[:, None, :] * tz[..., None]
            rd = torch.tensor(pose_d)[:, None, :].expand(R, S, 3)
            feat, sigma = tdec(
                pts.reshape(1, -1, 3), rd.reshape(1, -1, 3),
                torch.tensor(zi_s[None]), torch.tensor(zi_a[None]),
                sig, branch,
            )
            return feat.reshape(R, S, 3), sigma.reshape(R, S)

        feat_h, sig_h = field(rays_o, rays_d, [signal, None], z_s[0], z_a[0], "head")
        feat_t, sig_t = field(rays_o_t, rays_d_t, torch.tensor(et[None]),
                              z_s[1], z_a[1], "torso")
        sig_h = F.relu(sig_h)
        sig_t = F.relu(sig_t)
        feat_h = torch.cat([feat_h[:, :-1], torch.tensor(bc)[:, None, :]], dim=1)
        bump = torch.zeros(R, S)
        bump[:, -1] = 1e-6
        sig_h_headstack = sig_h + bump
        sig_t_com = sig_t.clone()
        sig_t_com[:, -1] = 0.0
        sig_t_com = sig_t_com + bump

        def weights(zv, rd, sigma):
            dists = zv[:, 1:] - zv[:, :-1]
            dists = torch.cat([dists, torch.full_like(dists[:, :1], 1e10)], 1)
            dists = dists * torch.tensor(rd).norm(dim=-1, keepdim=True)
            alpha = 1 - torch.exp(-(F.relu(sigma) + 1e-6) * dists)
            trans = torch.cumprod(
                torch.cat([torch.ones(R, 1), 1 - alpha + 1e-10], 1), 1
            )[:, :-1]
            return alpha * trans

        rgb_head = (weights(tz, rays_d, sig_h_headstack)[..., None] * feat_h).sum(1)
        ssum = sig_h + sig_t_com
        denom = ssum.clone()
        denom[denom == 0] = 1e-4
        cmix = (sig_h[..., None] * feat_h + sig_t_com[..., None] * feat_t) / denom[..., None]
        rgb_com = (weights(tz, rays_d_t, ssum)[..., None] * cmix).sum(1)
        loss = F.mse_loss(rgb_head, torch.tensor(target_head)) + \
            F.mse_loss(rgb_com, torch.tensor(target_com))
        opt_dec.zero_grad()
        opt_aud.zero_grad()
        texp.zero_grad()
        loss.backward()
        opt_dec.step()
        opt_aud.step()
        return float(loss)

    # ---- our side: same math through the framework ----
    opt = {k: adam_init(params[k]) for k in ("decoder", "audnet", "expnet")}

    def our_loss(p):
        sig = jnp.concatenate([
            apply_audionet_w2l(p["audnet"], jnp.asarray(aud_raw))[0],
            apply_expression_enc(p["expnet"], jnp.asarray(exp_raw))[0],
        ])
        rgb_head, rgb_com = render_ray_batch(
            p["decoder"], cfg, rcfg,
            jnp.asarray(rays_o), jnp.asarray(rays_d),
            jnp.asarray(rays_o_t), jnp.asarray(rays_d_t),
            jnp.asarray(z_np), sig, jnp.asarray(et),
            jnp.asarray(z_s[0]), jnp.asarray(z_a[0]),
            jnp.asarray(z_s[1]), jnp.asarray(z_a[1]),
            jnp.asarray(bc),
        )
        return (
            jnp.mean((rgb_head - jnp.asarray(target_head)) ** 2)
            + jnp.mean((rgb_com - jnp.asarray(target_com)) ** 2)
        )

    @jax.jit
    def our_step(params, opt):
        loss, grads = jax.value_and_grad(our_loss)(params)
        new_p, new_o = dict(params), dict(opt)
        for name in ("decoder", "audnet"):  # expnet gated off like the oracle
            new_p[name], new_o[name] = adam_update(
                opt[name], grads[name], params[name], LR, jnp.int32(1)
            )
        return new_p, new_o, loss

    torch_losses, our_losses = [], []
    for step in range(5):
        torch_losses.append(torch_step())
        params, opt, l = our_step(params, opt)
        our_losses.append(float(l))

    np.testing.assert_allclose(our_losses, torch_losses, rtol=1e-4, atol=1e-6)
    # parameters after 5 steps: Adam's first steps are ~lr * sign(grad), so
    # fp32 noise (~1e-7) on near-zero gradients can flip isolated weights by
    # up to ~2*lr — bound the max by lr-scale and the bulk much tighter
    final_torch = decoder_from_torch(tdec.state_dict())
    max_diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), params["decoder"], final_torch
    ))
    mean_diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).mean()), params["decoder"], final_torch
    ))
    assert max(max_diffs) < 3e-3, f"decoder params diverged: {max(max_diffs)}"
    assert max(mean_diffs) < 2e-5, f"bulk divergence: {max(mean_diffs)}"
