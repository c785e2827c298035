"""Converged val-PSNR parity vs the PyTorch reference (BASELINE 0.1 dB).

Trains the REFERENCE'S OWN modules (Decoder / AudioNet_W2L / ExpressionEnc
imported from /root/reference/NeRFs/DFANeRF) and this framework on the SAME
synthetic dataset with IDENTICAL initial weights, per-step frame/pixel
batches, z values, conditioning signals and Adam schedule (fp32, CPU), then
renders the SAME held-out frames through each framework's inference path
and compares val PSNR. The torch side's ray-march/composite is the
reference trainer's inline math (run_nerf_com_trainExpLater.py:853-907)
expressed as a callable (the reference's train() is a monolith bound to a
dataset directory, so its loss expressions are transcribed with line
citations rather than invoked).

Outputs: one JSON line + a section appended by docs/QUALITY.md regen.

    python benchmarks/psnr_parity.py [n_steps] [H] [R] [S]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = os.environ.get("DFANERF_REFERENCE", "/root/reference")


def run(n_steps=1500, H=48, R=128, S=8, n_frames=12, log_every=100,
        eval_every=250, eval_from=0.5, seed=0):
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import torch
    import torch.nn.functional as F

    sys.path.insert(0, os.path.join(REFERENCE, "NeRFs", "DFANeRF"))
    from decoder import Decoder as TorchDecoder
    from run_nerf_helpers import AudioNet_W2L, ExpressionEnc

    import jax.numpy as jnp

    from dfanerf_tpu.compat.torch_ckpt import (
        audionet_w2l_from_torch, decoder_from_torch, expression_enc_from_torch,
    )
    from dfanerf_tpu.config import RenderConfig
    from dfanerf_tpu.core.geometry import pose_to_euler_trans
    from dfanerf_tpu.core.posenc import et_embed
    from dfanerf_tpu.core.rays import get_rays
    from dfanerf_tpu.data import make_synthetic_dataset
    from dfanerf_tpu.models import DecoderConfig
    from dfanerf_tpu.models.encoders import (
        apply_audionet_w2l, apply_expression_enc,
    )
    from dfanerf_tpu.render.fields import render_ray_batch
    from dfanerf_tpu.train.optim import adam_init, adam_update, exp_decay_lr

    ds = make_synthetic_dataset(n_frames=n_frames, H=H, W=H, n_samples_gt=64)
    Hh, Ww, focal, cx, cy = ds.hwfcxy
    i_train = np.asarray(ds.i_train)
    i_val = np.asarray(ds.i_val)

    # identical initial weights: torch init -> converted jax pytree
    torch.manual_seed(seed)
    cfg = DecoderConfig()
    rcfg = RenderConfig(n_samples=S, near=ds.near, far=ds.far)
    tdec = TorchDecoder(z_dim=256, hidden_size=256, dim_signal=96,
                        use_deformation_field=True)
    taud = AudioNet_W2L()
    texp = ExpressionEnc()
    params = {
        "decoder": decoder_from_torch(tdec.state_dict()),
        "audnet": audionet_w2l_from_torch(taud.state_dict()),
        "expnet": expression_enc_from_torch(texp.state_dict()),
    }
    rng = np.random.RandomState(7)
    z_s = rng.randn(2, 256).astype(np.float32)
    z_a = rng.randn(2, 256).astype(np.float32)

    # shared per-frame quantities (deterministic; computed once in jax,
    # consumed as numpy by both sides)
    rays_all_o, rays_all_d = [], []
    for i in range(n_frames):
        ro, rd = get_rays(int(Hh), int(Ww), focal, jnp.asarray(ds.poses[i]),
                          cx, cy)
        rays_all_o.append(np.asarray(ro).reshape(-1, 3))
        rays_all_d.append(np.asarray(rd).reshape(-1, 3))
    rays_all_o = np.stack(rays_all_o)
    rays_all_d = np.stack(rays_all_d)
    et_all = np.asarray(et_embed(
        pose_to_euler_trans(jnp.asarray(ds.poses)), 3))  # [N, 42]
    z_np = np.broadcast_to(
        np.linspace(ds.near, ds.far, S, dtype=np.float32), (R, S)).copy()
    imgs_head = np.asarray(ds.imgs_head, np.float32) / 255.0
    imgs_com = np.asarray(ds.imgs_com, np.float32) / 255.0
    bc = (np.asarray(ds.bc_img, np.float32) / 255.0).reshape(-1, 3)

    def batch(step):
        b = np.random.RandomState(10_000 + 100_000 * seed + step)
        fi = int(i_train[b.randint(len(i_train))])
        idx = b.choice(Hh * Ww, R, replace=False)
        return dict(
            fi=fi, idx=idx,
            aud=np.asarray(ds.auds[fi])[None],
            exp=np.asarray(ds.exps[fi])[None],
            et=et_all[fi],
            ro=rays_all_o[fi][idx], rd=rays_all_d[fi][idx],
            ro_t=rays_all_o[0][idx], rd_t=rays_all_d[0][idx],
            bc=bc[idx],
            th=imgs_head[fi].reshape(-1, 3)[idx],
            tc=imgs_com[fi].reshape(-1, 3)[idx],
        )

    # ---------------- torch side (reference modules + inline loss) --------

    def t_field(pts, rd, sig, zi_s, zi_a, branch):
        n, s = pts.shape[:2]
        feat, sigma = tdec(
            pts.reshape(1, -1, 3), rd.reshape(1, -1, 3),
            torch.tensor(zi_s[None]), torch.tensor(zi_a[None]), sig, branch,
        )
        return feat.reshape(n, s, 3), sigma.reshape(n, s)

    def t_render(d, zv):
        """Both stacks of the reference loss (:853-907): bg-concat, sigma
        bumps, density-ratio mix, cumprod transmittance."""
        n = d["ro"].shape[0]
        signal = torch.cat(
            [taud(torch.tensor(d["aud"])), texp(torch.tensor(d["exp"]))],
            dim=1,
        )
        tz = torch.tensor(np.broadcast_to(zv, (n, S)).copy())
        pts_h = torch.tensor(d["ro"])[:, None, :] + \
            torch.tensor(d["rd"])[:, None, :] * tz[..., None]
        pts_t = torch.tensor(d["ro_t"])[:, None, :] + \
            torch.tensor(d["rd_t"])[:, None, :] * tz[..., None]
        rd_h = torch.tensor(d["rd"])[:, None, :].expand(n, S, 3)
        rd_t = torch.tensor(d["rd_t"])[:, None, :].expand(n, S, 3)
        feat_h, sig_h = t_field(pts_h, rd_h, [signal, None],
                                z_s[0], z_a[0], "head")
        feat_t, sig_t = t_field(pts_t, rd_t, torch.tensor(d["et"][None]),
                                z_s[1], z_a[1], "torso")
        sig_h, sig_t = F.relu(sig_h), F.relu(sig_t)
        feat_h = torch.cat(
            [feat_h[:, :-1], torch.tensor(d["bc"])[:, None, :]], dim=1)
        bump = torch.zeros(n, S)
        bump[:, -1] = 1e-6
        sig_hh = sig_h + bump
        sig_tc = sig_t.clone()
        sig_tc[:, -1] = 0.0
        sig_tc = sig_tc + bump

        def weights(rd, sigma):
            dists = tz[:, 1:] - tz[:, :-1]
            dists = torch.cat([dists, torch.full_like(dists[:, :1], 1e10)], 1)
            dists = dists * torch.tensor(rd).norm(dim=-1, keepdim=True)
            alpha = 1 - torch.exp(-(F.relu(sigma) + 1e-6) * dists)
            trans = torch.cumprod(
                torch.cat([torch.ones(n, 1), 1 - alpha + 1e-10], 1), 1
            )[:, :-1]
            return alpha * trans

        rgb_head = (weights(d["rd"], sig_hh)[..., None] * feat_h).sum(1)
        ssum = sig_h + sig_tc
        denom = ssum.clone()
        denom[denom == 0] = 1e-4
        cmix = (sig_h[..., None] * feat_h + sig_tc[..., None] * feat_t) \
            / denom[..., None]
        rgb_com = (weights(d["rd_t"], ssum)[..., None] * cmix).sum(1)
        return rgb_head, rgb_com

    opt_dec = torch.optim.Adam(tdec.parameters(), lr=5e-4)
    opt_aud = torch.optim.Adam(taud.parameters(), lr=5e-4)

    def torch_step(d, lr):
        for opt in (opt_dec, opt_aud):
            for g in opt.param_groups:
                g["lr"] = lr
        rgb_head, rgb_com = t_render(d, z_np[0])
        loss = F.mse_loss(rgb_head, torch.tensor(d["th"])) + \
            F.mse_loss(rgb_com, torch.tensor(d["tc"]))
        opt_dec.zero_grad()
        opt_aud.zero_grad()
        loss.backward()
        opt_dec.step()
        opt_aud.step()
        return float(loss)

    # ---------------- jax side (this framework) ---------------------------

    opt = {k: adam_init(params[k]) for k in ("decoder", "audnet", "expnet")}

    def our_loss(p, d):
        sig = jnp.concatenate([
            apply_audionet_w2l(p["audnet"], d["aud"])[0],
            apply_expression_enc(p["expnet"], d["exp"])[0],
        ])
        rgb_head, rgb_com = render_ray_batch(
            p["decoder"], cfg, rcfg,
            d["ro"], d["rd"], d["ro_t"], d["rd_t"],
            jnp.asarray(z_np), sig, d["et"],
            jnp.asarray(z_s[0]), jnp.asarray(z_a[0]),
            jnp.asarray(z_s[1]), jnp.asarray(z_a[1]),
            d["bc"],
        )
        return (jnp.mean((rgb_head - d["th"]) ** 2)
                + jnp.mean((rgb_com - d["tc"]) ** 2))

    import jax as _jax

    @_jax.jit
    def our_step(params, opt, d, lr):
        loss, grads = _jax.value_and_grad(our_loss)(params, d)
        new_p, new_o = dict(params), dict(opt)
        for name in ("decoder", "audnet"):
            new_p[name], new_o[name] = adam_update(
                opt[name], grads[name], params[name], lr, jnp.int32(1))
        return new_p, new_o, loss

    # ---------------- val renders through each framework ------------------

    def val_psnrs():
        chunk = 2048
        ses_t_com, ses_j_com, ses_t_head, ses_j_head = [], [], [], []
        with jax.default_matmul_precision("highest"), torch.no_grad():
            for fi in i_val:
                fi = int(fi)
                outs_t_h, outs_t_c, outs_j_h, outs_j_c = [], [], [], []
                for lo in range(0, Hh * Ww, chunk):
                    sel = slice(lo, min(lo + chunk, Hh * Ww))
                    d = dict(
                        aud=np.asarray(ds.auds[fi])[None],
                        exp=np.asarray(ds.exps[fi])[None],
                        et=et_all[fi],
                        ro=rays_all_o[fi][sel], rd=rays_all_d[fi][sel],
                        ro_t=rays_all_o[0][sel], rd_t=rays_all_d[0][sel],
                        bc=bc[sel],
                    )
                    th_, tc_ = t_render(d, z_np[0])
                    outs_t_h.append(th_.numpy())
                    outs_t_c.append(tc_.numpy())
                    n = d["ro"].shape[0]
                    sig = jnp.concatenate([
                        apply_audionet_w2l(params["audnet"],
                                           jnp.asarray(d["aud"]))[0],
                        apply_expression_enc(params["expnet"],
                                             jnp.asarray(d["exp"]))[0],
                    ])
                    jh, jc = render_ray_batch(
                        params["decoder"], cfg, rcfg,
                        jnp.asarray(d["ro"]), jnp.asarray(d["rd"]),
                        jnp.asarray(d["ro_t"]), jnp.asarray(d["rd_t"]),
                        jnp.asarray(np.broadcast_to(z_np[0], (n, S)).copy()),
                        sig, jnp.asarray(d["et"]),
                        jnp.asarray(z_s[0]), jnp.asarray(z_a[0]),
                        jnp.asarray(z_s[1]), jnp.asarray(z_a[1]),
                        jnp.asarray(d["bc"]),
                    )
                    outs_j_h.append(np.asarray(jh))
                    outs_j_c.append(np.asarray(jc))
                gt_h = imgs_head[fi].reshape(-1, 3)
                gt_c = imgs_com[fi].reshape(-1, 3)
                clip = lambda a: np.clip(np.concatenate(a), 0.0, 1.0)
                ses_t_head.append(np.mean((clip(outs_t_h) - gt_h) ** 2))
                ses_t_com.append(np.mean((clip(outs_t_c) - gt_c) ** 2))
                ses_j_head.append(np.mean((clip(outs_j_h) - gt_h) ** 2))
                ses_j_com.append(np.mean((clip(outs_j_c) - gt_c) ** 2))
        to_psnr = lambda ses: float(-10 * np.log10(max(np.mean(ses), 1e-12)))
        return (to_psnr(ses_t_com), to_psnr(ses_j_com),
                to_psnr(ses_t_head), to_psnr(ses_j_head))

    # ---------------- training -------------------------------------------
    # The shipped decay (0.1^(step/(500*1500))) is calibrated for 600k
    # steps and is a no-op over a few thousand; at constant lr=5e-4 the
    # late-phase loss oscillates ~2x step to step and a single end-point
    # val PSNR is noise. Compress the SAME exponential shape so lr decays
    # 10x across this run (identical on both sides — the comparison is
    # framework-vs-framework, not vs the 600k wall-clock schedule), and
    # average val PSNR over a trailing eval window.
    # NOTE on head-field collapse: the reference's loss admits a
    # degenerate solution where the head sigma dies everywhere (relu
    # gradients then stay zero forever) and the bg catch-all billboard
    # carries the composite — docs/SERVING.md. Both frameworks fall into
    # or escape that basin TOGETHER when their trajectories track (an
    # R=512 run with lr warmup had both die in the same step — itself
    # parity evidence, but useless for a quality comparison), so the
    # protocol keeps the reference's full lr from step 0 (no warmup: a
    # slow start lets the composite term entrench the billboard before
    # the head loss carves the head) and the harness flags dead runs via
    # head_field_dead_torch_jax.
    t_losses, j_losses = [], []
    evals = []  # (step, pt_com, pj_com, pt_head, pj_head)
    t0 = time.time()
    with jax.default_matmul_precision("highest"):
        for step in range(n_steps):
            d = batch(step)
            lr = 5e-4 * 0.1 ** (step / n_steps)
            t_losses.append(torch_step(d, lr))
            dj = {k: jnp.asarray(v) for k, v in d.items()
                  if k not in ("fi", "idx")}
            params, opt, l = our_step(params, opt, dj, jnp.float32(lr))
            j_losses.append(float(l))
            if step % log_every == 0:
                print(f"[psnr_parity] step {step} torch={t_losses[-1]:.5f} "
                      f"jax={j_losses[-1]:.5f} ({time.time() - t0:.0f}s)",
                      file=sys.stderr, flush=True)
            if (step + 1) % eval_every == 0 and step >= eval_from * n_steps:
                ev = val_psnrs()
                evals.append((step + 1,) + ev)
                print(f"[psnr_parity] eval step {step + 1} "
                      f"com torch={ev[0]:.2f} jax={ev[1]:.2f} "
                      f"head torch={ev[2]:.2f} jax={ev[3]:.2f}",
                      file=sys.stderr, flush=True)

    if not evals:
        evals.append((n_steps,) + val_psnrs())
    ev = np.asarray([e[1:] for e in evals], np.float64)
    pt_com, pj_com, pt_head, pj_head = ev.mean(axis=0)
    rel = [abs(a - b) / max(abs(b), 1e-12)
           for a, b in zip(j_losses, t_losses)]
    # dead-field detector: a head PSNR frozen across the eval window means
    # that side's head field collapsed (see warmup note) — the run can't
    # support a parity claim and must be re-run / reported as dead
    dead = [bool(ev[:, i].std() < 1e-3) for i in (2, 3)] \
        if len(evals) > 1 else [False, False]
    return {
        "n_steps": n_steps, "H": H, "R": R, "S": S, "seed": seed,
        "head_field_dead_torch_jax": dead,
        # trailing-window means (the parity claim) + per-eval detail
        "val_psnr_torch_com": round(pt_com, 3),
        "val_psnr_jax_com": round(pj_com, 3),
        "val_psnr_torch_head": round(pt_head, 3),
        "val_psnr_jax_head": round(pj_head, 3),
        "abs_delta_com_db": round(abs(pt_com - pj_com), 4),
        "abs_delta_head_db": round(abs(pt_head - pj_head), 4),
        "eval_window": [[int(e[0])] + [round(v, 3) for v in e[1:]]
                        for e in evals],
        "eval_std_com": [round(float(ev[:, 0].std()), 3),
                         round(float(ev[:, 1].std()), 3)],
        "max_rel_loss_divergence": max(rel),
        "final_losses": [t_losses[-1], j_losses[-1]],
        "torch_losses_every100": t_losses[::100],
        "jax_losses_every100": j_losses[::100],
        "seconds": round(time.time() - t0, 1),
    }


def main():
    if "--selfchaos" in sys.argv:
        sys.argv.remove("--selfchaos")
        print(json.dumps(torch_self_divergence(
            int(sys.argv[1]) if len(sys.argv) > 1 else 1500)))
        return
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    R = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    S = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    seed = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    print(json.dumps(run(n_steps, H, R, S, seed=seed)))




def torch_self_divergence(n_steps=1500, H=64, R=512, S=8, n_frames=12,
                          perturb=1e-6, log_every=100):
    """Chaos control: train the REFERENCE'S OWN modules twice — identical
    batches, one replica with a single weight perturbed by ``perturb`` —
    and record the loss-ratio trajectory. If this splits to the same
    orders of magnitude as the torch-vs-jax overlay, the cross-framework
    gap is trajectory chaos (sensitivity to fp-level differences), not a
    framework defect. Reuses run()'s scene/batch protocol."""
    import copy

    import numpy as np
    import torch
    import torch.nn.functional as F

    sys.path.insert(0, os.path.join(REFERENCE, "NeRFs", "DFANeRF"))
    from decoder import Decoder as TorchDecoder
    from run_nerf_helpers import AudioNet_W2L, ExpressionEnc

    import jax
    import jax.numpy as jnp

    from dfanerf_tpu.core.posenc import et_embed
    from dfanerf_tpu.core.geometry import pose_to_euler_trans
    from dfanerf_tpu.core.rays import get_rays
    from dfanerf_tpu.data import make_synthetic_dataset

    jax.config.update("jax_platforms", "cpu")
    ds = make_synthetic_dataset(n_frames=n_frames, H=H, W=H, n_samples_gt=64)
    Hh, Ww, focal, cx, cy = ds.hwfcxy
    i_train = np.asarray(ds.i_train)

    torch.manual_seed(0)
    reps = []
    for r in range(2):
        torch.manual_seed(0)
        tdec = TorchDecoder(z_dim=256, hidden_size=256, dim_signal=96,
                            use_deformation_field=True)
        taud = AudioNet_W2L()
        texp = ExpressionEnc()
        if r == 1:
            with torch.no_grad():
                w = next(tdec.parameters())
                w.view(-1)[0] += perturb
        opts = [torch.optim.Adam(m.parameters(), lr=5e-4)
                for m in (tdec, taud)]
        reps.append((tdec, taud, texp, opts))

    rng = np.random.RandomState(7)
    z_s = rng.randn(2, 256).astype(np.float32)
    z_a = rng.randn(2, 256).astype(np.float32)
    rays_all_o, rays_all_d = [], []
    for i in range(n_frames):
        ro, rd = get_rays(int(Hh), int(Ww), focal, jnp.asarray(ds.poses[i]),
                          cx, cy)
        rays_all_o.append(np.asarray(ro).reshape(-1, 3))
        rays_all_d.append(np.asarray(rd).reshape(-1, 3))
    rays_all_o = np.stack(rays_all_o)
    rays_all_d = np.stack(rays_all_d)
    et_all = np.asarray(et_embed(
        pose_to_euler_trans(jnp.asarray(ds.poses)), 3))
    z_np = np.broadcast_to(
        np.linspace(ds.near, ds.far, S, dtype=np.float32), (R, S)).copy()
    imgs_head = np.asarray(ds.imgs_head, np.float32) / 255.0
    imgs_com = np.asarray(ds.imgs_com, np.float32) / 255.0
    bc = (np.asarray(ds.bc_img, np.float32) / 255.0).reshape(-1, 3)

    def batch(step):
        b = np.random.RandomState(10_000 + step)
        fi = int(i_train[b.randint(len(i_train))])
        idx = b.choice(Hh * Ww, R, replace=False)
        return dict(
            fi=fi, aud=np.asarray(ds.auds[fi])[None],
            exp=np.asarray(ds.exps[fi])[None], et=et_all[fi],
            ro=rays_all_o[fi][idx], rd=rays_all_d[fi][idx],
            ro_t=rays_all_o[0][idx], rd_t=rays_all_d[0][idx],
            bc=bc[idx], th=imgs_head[fi].reshape(-1, 3)[idx],
            tc=imgs_com[fi].reshape(-1, 3)[idx],
        )

    def forward_rep(rep, d):
        tdec, taud, texp, opts = rep
        n = d["ro"].shape[0]
        signal = torch.cat(
            [taud(torch.tensor(d["aud"])), texp(torch.tensor(d["exp"]))], 1)
        tz = torch.tensor(np.broadcast_to(z_np[0], (n, S)).copy())

        def field(o, di, sig, zi_s, zi_a, branch):
            pts = torch.tensor(o)[:, None, :] + \
                torch.tensor(di)[:, None, :] * tz[..., None]
            rd_ = torch.tensor(di)[:, None, :].expand(n, S, 3)
            feat, sigma = tdec(pts.reshape(1, -1, 3), rd_.reshape(1, -1, 3),
                               torch.tensor(zi_s[None]),
                               torch.tensor(zi_a[None]), sig, branch)
            return feat.reshape(n, S, 3), sigma.reshape(n, S)

        feat_h, sig_h = field(d["ro"], d["rd"], [signal, None],
                              z_s[0], z_a[0], "head")
        feat_t, sig_t = field(d["ro_t"], d["rd_t"],
                              torch.tensor(d["et"][None]),
                              z_s[1], z_a[1], "torso")
        sig_h, sig_t = F.relu(sig_h), F.relu(sig_t)
        feat_h = torch.cat(
            [feat_h[:, :-1], torch.tensor(d["bc"])[:, None, :]], 1)
        bump = torch.zeros(n, S)
        bump[:, -1] = 1e-6
        sig_hh = sig_h + bump
        sig_tc = sig_t.clone()
        sig_tc[:, -1] = 0.0
        sig_tc = sig_tc + bump

        def weights(rd_, sigma):
            dists = tz[:, 1:] - tz[:, :-1]
            dists = torch.cat(
                [dists, torch.full_like(dists[:, :1], 1e10)], 1)
            dists = dists * torch.tensor(rd_).norm(dim=-1, keepdim=True)
            alpha = 1 - torch.exp(-(F.relu(sigma) + 1e-6) * dists)
            trans = torch.cumprod(torch.cat(
                [torch.ones(n, 1), 1 - alpha + 1e-10], 1), 1)[:, :-1]
            return alpha * trans

        rgb_head = (weights(d["rd"], sig_hh)[..., None] * feat_h).sum(1)
        ssum = sig_h + sig_tc
        denom = ssum.clone()
        denom[denom == 0] = 1e-4
        cmix = (sig_h[..., None] * feat_h + sig_tc[..., None] * feat_t) \
            / denom[..., None]
        rgb_com = (weights(d["rd_t"], ssum)[..., None] * cmix).sum(1)
        return rgb_head, rgb_com

    def step_rep(rep, d, lr):
        tdec, taud, texp, opts = rep
        for opt in opts:
            for g in opt.param_groups:
                g["lr"] = lr
        rgb_head, rgb_com = forward_rep(rep, d)
        loss = F.mse_loss(rgb_head, torch.tensor(d["th"])) + \
            F.mse_loss(rgb_com, torch.tensor(d["tc"]))
        for opt in opts:
            opt.zero_grad()
        loss.backward()
        for opt in opts:
            opt.step()
        return float(loss.detach())

    # the SAME eval protocol as run()'s val_psnrs, per replica — so the
    # replica-vs-replica converged PSNR delta is the exact noise floor the
    # torch-vs-jax delta must be judged against
    i_val = np.asarray(ds.i_val)

    def val_psnr_rep(rep):
        chunk = 2048
        ses_h, ses_c = [], []
        with torch.no_grad():
            for fi in i_val:
                fi = int(fi)
                outs_h, outs_c = [], []
                for lo in range(0, Hh * Ww, chunk):
                    sel = slice(lo, min(lo + chunk, Hh * Ww))
                    d = dict(
                        aud=np.asarray(ds.auds[fi])[None],
                        exp=np.asarray(ds.exps[fi])[None], et=et_all[fi],
                        ro=rays_all_o[fi][sel], rd=rays_all_d[fi][sel],
                        ro_t=rays_all_o[0][sel], rd_t=rays_all_d[0][sel],
                        bc=bc[sel],
                    )
                    rh, rc = forward_rep(rep, d)
                    outs_h.append(rh.numpy())
                    outs_c.append(rc.numpy())
                clip = lambda a: np.clip(np.concatenate(a), 0.0, 1.0)
                gt_h = imgs_head[fi].reshape(-1, 3)
                gt_c = imgs_com[fi].reshape(-1, 3)
                ses_h.append(np.mean((clip(outs_h) - gt_h) ** 2))
                ses_c.append(np.mean((clip(outs_c) - gt_c) ** 2))
        to_psnr = lambda s: float(-10 * np.log10(max(np.mean(s), 1e-12)))
        return to_psnr(ses_c), to_psnr(ses_h)

    eval_every, eval_from = 250, 0.5
    ratios, l0s, l1s, evals = [], [], [], []
    for step in range(n_steps):
        d = batch(step)
        lr = 5e-4 * 0.1 ** (step / n_steps)
        l0 = step_rep(reps[0], d, lr)
        l1 = step_rep(reps[1], d, lr)
        l0s.append(l0)
        l1s.append(l1)
        ratios.append(max(l0, l1) / max(min(l0, l1), 1e-12))
        if step % log_every == 0:
            print(f"[selfchaos] step {step} l0={l0:.5f} l1={l1:.5f} "
                  f"ratio={ratios[-1]:.2f}", file=sys.stderr, flush=True)
        if (step + 1) % eval_every == 0 and step >= eval_from * n_steps:
            c0, h0 = val_psnr_rep(reps[0])
            c1, h1 = val_psnr_rep(reps[1])
            evals.append((step + 1, c0, c1, h0, h1))
            print(f"[selfchaos] eval step {step + 1} com {c0:.2f}/{c1:.2f} "
                  f"head {h0:.2f}/{h1:.2f}", file=sys.stderr, flush=True)
    c0, h0 = val_psnr_rep(reps[0])
    c1, h1 = val_psnr_rep(reps[1])
    evals.append((n_steps, c0, c1, h0, h1))
    ev = np.asarray(evals)
    return {
        "perturb": perturb, "n_steps": n_steps,
        "max_loss_ratio": max(ratios),
        "final_losses": [l0s[-1], l1s[-1]],
        "ratio_every100": ratios[::100],
        "val_psnr_rep0_com": round(c0, 3), "val_psnr_rep1_com": round(c1, 3),
        "val_psnr_rep0_head": round(h0, 3), "val_psnr_rep1_head": round(h1, 3),
        "abs_delta_com_db": round(abs(c0 - c1), 4),
        "abs_delta_head_db": round(abs(h0 - h1), 4),
        "eval_window": [[int(s)] + [round(v, 3) for v in row]
                        for s, *row in evals],
        "eval_std_com": [round(float(ev[:, i].std()), 3) for i in (1, 2)],
    }


if __name__ == "__main__":
    main()
