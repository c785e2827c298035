"""The jitted training step.

One call = one full reference train iteration (run_nerf_com_trainExpLater.
py:738-931) with every host-side inefficiency removed:

- target frames live in device HBM as uint8; only the 2048 sampled pixels
  are gathered and converted (the reference re-reads jpgs from disk every
  step, :770-774);
- ray selection is fixed-shape device sampling (Gumbel top-k for the
  without-replacement semantics of np.random.choice at :806-819);
- staged optimizers and the smoothing/expression schedule are traced
  gates — a single compiled program covers all 600k steps.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from dfanerf_tpu.config import ExperimentConfig
from dfanerf_tpu.core.rays import rays_for_pixels
from dfanerf_tpu.core.sampling import stratified_z_vals
from dfanerf_tpu.data.dataset import FrameDataset
from dfanerf_tpu.render.fields import render_ray_batch
from dfanerf_tpu.train.optim import adam_update, exp_decay_lr
from dfanerf_tpu.train.signals import encode_signal, encode_signal_torso
from dfanerf_tpu.train.state import OPT_GROUPS, TrainState


def dataset_to_device(ds: FrameDataset, sharding=None,
                      filter_speaking: bool = True) -> Dict[str, jnp.ndarray]:
    """Move the training arrays to device (uint8 images stay uint8).

    ``i_train`` is restricted to speaking frames (identity when the loader
    ran with all_speaker or no speak data) — the reference's per-dataset
    filter at run_nerf_com_trainExpLater.py:481-483. Pass
    ``filter_speaking=False`` for the dynamic-speaker mode, which trains on
    every frame and switches branches per frame instead."""
    from dfanerf_tpu.data.dataset import speaking_i_train

    put = partial(jax.device_put, device=sharding) if sharding else jax.device_put
    i_train = speaking_i_train(ds) if filter_speaking else ds.i_train
    data = {
        "poses": put(jnp.asarray(ds.poses)),
        "auds": put(jnp.asarray(ds.auds)),
        "exps": put(jnp.asarray(ds.exps)),
        "bc_img": put(jnp.asarray(ds.bc_img)),
        "i_train": put(jnp.asarray(i_train)),
    }
    # Test-file (driving) datasets carry no targets or rects
    # (load_audface.py:14-47 loads only poses/auds in test mode); render
    # paths never touch these keys, so omit rather than fabricate them.
    for key, val in (("imgs_head", ds.imgs_head), ("imgs_com", ds.imgs_com),
                     ("rects", ds.sample_rects)):
        if val is not None:
            data[key] = put(jnp.asarray(val))
    if ds.speak_frames is not None:
        data["speak_frames"] = put(jnp.asarray(ds.speak_frames, jnp.int32))
    return data


def sample_pixel_coords(
    key: jax.Array,
    H: int,
    W: int,
    n_rand: int,
    sample_rate: float,
    rect: jnp.ndarray,
) -> jnp.ndarray:
    """Select n_rand pixel (row, col) coords.

    sample_rate == 0 (shipped config): uniform without replacement over the
    whole frame. sample_rate > 0: that fraction inside (face_rect ∪ the
    lower-half torso band), the rest outside — the reference's rect-biased
    sampler (:791-816) — as fixed-shape Gumbel top-k over masked scores.
    Note the reference treats rect[0]/rect[2] as ROW origin/extent.
    """
    n_pix = H * W
    rows = jnp.repeat(jnp.arange(H), W)
    cols = jnp.tile(jnp.arange(W), H)
    u = jax.random.uniform(key, (n_pix,))
    if sample_rate <= 0.0:
        _, idx = jax.lax.top_k(u, n_rand)
    else:
        in_rect = (
            (rows >= rect[0])
            & (rows <= rect[0] + rect[2])
            & (cols >= rect[1])
            & (cols <= rect[1] + rect[3])
        )
        in_torso = rows >= (H // 2)
        mask = in_rect | in_torso
        n_in = int(n_rand * sample_rate)
        _, idx_in = jax.lax.top_k(jnp.where(mask, u, -jnp.inf), n_in)
        _, idx_out = jax.lax.top_k(jnp.where(mask, -jnp.inf, u), n_rand - n_in)
        idx = jnp.concatenate([idx_in, idx_out])
    return jnp.stack([rows[idx], cols[idx]], axis=-1)


def make_train_step(cfg: ExperimentConfig, ds: FrameDataset,
                    sparsity_lambda: float = 0.0, sparsity_points: int = 4096,
                    sparsity_mode: str = "points",
                    sparsity_cutoff: float = 10.0):
    """Build the jitted train step closed over static shapes/config.

    ``sparsity_lambda > 0`` enables the SERVING-BAKE variant: the shipped
    loss (identical to the reference) plus a density-sparsity prior for
    both fields. This is an opt-in serving preparation pass (a brief
    fine-tune that clears unsupervised-space density floaters so occupancy
    skipping can pay), NOT part of the reference training recipe —
    run_nerf_com_trainExpLater.py has no such term and the default
    lambda=0 path is bit-identical to it.

    ``sparsity_mode``:
      - "points": Cauchy prior ``mean(log(1 + 2*sigma^2))`` at uniform
        random points in the render-frustum AABB — crushes junk anywhere,
        but also fights surface density everywhere (costs PSNR at high
        lambda);
      - "visibility": march random full-frame rays and penalize sigma
        ONLY at samples whose compositing weight (in both the head-only
        and composite stacks, stop-gradient'd) is below ``1e-4`` — i.e.
        density the serving renders provably never see. Surfaces are
        untouched, but ray coverage is sparse (n_points/n_samples rays
        per step): measured on the 450p benchmark scene it cannot keep up
        with the junk the main loss keeps growing in unsupervised space;
      - "deadzone": the points prior gated (stop-gradient) to sigma below
        ``sparsity_cutoff`` — junk-scale density is crushed volumetrically
        while anything at surface scale (sigma > cutoff) is provably
        untouched, so lambda can be large. This is the mode that
        minimizes occupancy-flag density in practice.
    """
    from dfanerf_tpu.data.dataset import speaking_i_train

    H, W, focal, cx, cy = ds.hwfcxy
    n_train = int(len(speaking_i_train(ds)))
    near, far = float(ds.near), float(ds.far)
    scfg, tcfg, rcfg, dcfg = cfg.signal, cfg.train, cfg.render, cfg.decoder

    if sparsity_lambda > 0.0:
        import numpy as np

        from dfanerf_tpu.core.rays import get_rays

        # static frustum AABB over all training poses (matches the volume
        # conservative_occupancy grids span)
        corners = []
        for p in np.asarray(ds.poses):
            ro, rd = get_rays(int(H), int(W), focal, jnp.asarray(p), cx, cy)
            ro = np.asarray(ro).reshape(-1, 3)[[0, W - 1, -W, -1]]
            rd = np.asarray(rd).reshape(-1, 3)[[0, W - 1, -W, -1]]
            corners += [ro + rd * near, ro + rd * far]
        corners = np.concatenate(corners)
        aabb_lo = jnp.asarray(corners.min(0))
        aabb_hi = jnp.asarray(corners.max(0))

    from dfanerf_tpu.ops.fused_render import density_act

    cauchy = lambda s: jnp.log1p(
        2.0 * density_act(s, dcfg.density_activation) ** 2)

    def sparsity_loss(params, z_shape, z_app, signal, signal_torso, key):
        from dfanerf_tpu.models.decoder import apply_decoder

        pts = aabb_lo + jax.random.uniform(
            key, (sparsity_points, 3)
        ) * (aabb_hi - aabb_lo)
        dirs = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), pts.shape)
        _, sig_h = apply_decoder(
            params["decoder"], dcfg, pts, dirs, z_shape[0], z_app[0],
            signal, "head",
        )
        _, sig_t = apply_decoder(
            params["decoder"], dcfg, pts, dirs, z_shape[1], z_app[1],
            signal_torso, "torso",
        )
        if sparsity_mode == "deadzone":
            gate_h = jax.lax.stop_gradient(
                (sig_h < sparsity_cutoff).astype(jnp.float32))
            gate_t = jax.lax.stop_gradient(
                (sig_t < sparsity_cutoff).astype(jnp.float32))
            return (jnp.mean(cauchy(sig_h) * gate_h)
                    + jnp.mean(cauchy(sig_t) * gate_t))
        return jnp.mean(cauchy(sig_h)) + jnp.mean(cauchy(sig_t))

    def visibility_sparsity_loss(params, state, data, key, w_eps=1e-4):
        """Penalize density only where the serving composite provably
        never sees it: along random full-frame rays, a sample's Cauchy
        penalty is gated (stop-gradient) on its compositing weight being
        below w_eps in BOTH the head-only and composite stacks — the same
        weight expressions the renderer/fused kernel march
        (run_nerf_com_trainExpLater.py:169-179 semantics via
        core/compositing)."""
        from dfanerf_tpu.models.decoder import apply_decoder

        n_rays = max(sparsity_points // rcfg.n_samples, 16)
        k_img, k_pix, k_sig = jax.random.split(key, 3)
        img_pos = jax.random.randint(k_img, (), 0, n_train)
        img_i = data["i_train"][img_pos]
        coords = sample_pixel_coords(k_pix, H, W, n_rays, 0.0,
                                     jnp.zeros((4,), jnp.int32))
        pose = data["poses"][img_i]
        rays_o, rays_d = rays_for_pixels(coords, focal, pose, cx, cy)
        rays_o_t, rays_d_t = rays_for_pixels(
            coords, focal, data["poses"][0], cx, cy)
        z = jnp.linspace(near, far, rcfg.n_samples)

        def field_sigma(ro, rd, obj, sig, branch):
            pts = ro[:, None] + rd[:, None] * z[None, :, None]
            dirs = jnp.broadcast_to(rd[:, None], pts.shape)
            _, s = apply_decoder(
                params["decoder"], dcfg, pts.reshape(-1, 3),
                dirs.reshape(-1, 3), state["z_shape"][obj],
                state["z_app"][obj], sig, branch,
            )
            return density_act(s.reshape(n_rays, rcfg.n_samples),
                               dcfg.density_activation)

        signal = encode_signal(
            params, data["auds"], data["exps"], img_i, jnp.int32(n_train),
            scfg.smo_size, jnp.asarray(False), scfg.audio_net, scfg.win_size,
        )
        signal_torso = encode_signal_torso(
            params, data["poses"], img_i, jnp.int32(n_train),
            scfg.smo_torso_size, jnp.asarray(False), scfg.et_multires,
        )
        sig_h = field_sigma(rays_o, rays_d, 0, signal, "head")
        sig_t = field_sigma(rays_o_t, rays_d_t, 1, signal_torso, "torso")

        def weights(sigma, rd):
            dists = jnp.concatenate(
                [z[1:] - z[:-1], jnp.full((1,), rcfg.last_dist)]
            )[None, :] * jnp.linalg.norm(rd, axis=-1, keepdims=True)
            alpha = 1.0 - jnp.exp(-(sigma + 1e-6) * dists)
            trans = jnp.cumprod(jnp.concatenate(
                [jnp.ones((n_rays, 1)), 1.0 - alpha + 1e-10], axis=1
            ), axis=1)[:, :-1]
            return alpha * trans

        w_head = weights(sig_h, rays_d)
        w_com = weights(sig_h + sig_t, rays_d_t)
        unseen = jax.lax.stop_gradient(
            (jnp.maximum(w_head, w_com) < w_eps).astype(jnp.float32)
        )
        denom = jnp.maximum(unseen.sum(), 1.0)
        return (jnp.sum(cauchy(sig_h) * unseen)
                + jnp.sum(cauchy(sig_t) * unseen)) / denom

    def distortion_loss(w, z_vals):
        """mip-NeRF 360 distortion (eq. 15), O(S) cumsum form, on one
        stack's compositing weights w [R, S] at normalized sample
        positions s = (z - near) / (far - near) (the catch-all bg sample
        sits at s = 1): sum_ij w_i w_j |s_i - s_j| + (1/3) sum w_i^2 d_i.
        Minimized by each ray's weight collapsing to a thin interval —
        fog mass spread along a ray pays against itself and against the
        catch-all's weight at the far endpoint."""
        s = (z_vals - near) / (far - near)  # [R, S] sorted
        sm = 0.5 * (s[:, 1:] + s[:, :-1])
        sm = jnp.concatenate([sm, s[:, -1:]], axis=1)  # midpoints; last=far
        d = jnp.concatenate(
            [s[:, 1:] - s[:, :-1], jnp.zeros_like(s[:, :1])], axis=1)
        cw = jnp.cumsum(w, axis=1)
        cws = jnp.cumsum(w * sm, axis=1)
        prev_w = jnp.concatenate([jnp.zeros_like(cw[:, :1]), cw[:, :-1]], 1)
        prev_ws = jnp.concatenate([jnp.zeros_like(cw[:, :1]), cws[:, :-1]], 1)
        cross = 2.0 * jnp.sum(w * (sm * prev_w - prev_ws), axis=1)
        self_term = jnp.sum(w * w * d, axis=1) / 3.0
        return jnp.mean(cross + self_term)

    def loss_fn(params, state, data, img_i, coords, z_vals, use_smo,
                k_sparse=None, dist_on=None):
        n_valid = jnp.int32(n_train)
        signal = encode_signal(
            params, data["auds"], data["exps"], img_i, n_valid, scfg.smo_size,
            use_smo, scfg.audio_net, scfg.win_size,
        )
        signal_torso = encode_signal_torso(
            params,
            data["poses"],
            img_i,
            n_valid,
            scfg.smo_torso_size,
            use_smo,
            scfg.et_multires,
        )
        ys, xs = coords[:, 0], coords[:, 1]
        target_head = data["imgs_head"][img_i, ys, xs].astype(jnp.float32) / 255.0
        target_com = data["imgs_com"][img_i, ys, xs].astype(jnp.float32) / 255.0
        bc_rgb = data["bc_img"][ys, xs].astype(jnp.float32) / 255.0

        pose = data["poses"][img_i]
        pose_torso = data["poses"][0]
        rays_o, rays_d = rays_for_pixels(coords, focal, pose, cx, cy)
        rays_o_t, rays_d_t = rays_for_pixels(coords, focal, pose_torso, cx, cy)

        want_w = tcfg.distortion_lambda > 0.0
        outs = render_ray_batch(
            params["decoder"],
            dcfg,
            rcfg,
            rays_o,
            rays_d,
            rays_o_t,
            rays_d_t,
            z_vals,
            signal,
            signal_torso,
            state["z_shape"][0],
            state["z_app"][0],
            state["z_shape"][1],
            state["z_app"][1],
            bc_rgb,
            return_weights=want_w,
        )
        rgb_head, rgb_com = outs[0], outs[1]
        loss_head = jnp.mean((rgb_head - target_head) ** 2)
        loss_com = jnp.mean((rgb_com - target_com) ** 2)
        if tcfg.use_l1 and tcfg.train_together:
            # use_L1 replaces the loss with L1 on the COMPOSITE render
            # (run_nerf_com_trainExpLater.py:909-913)
            loss = jnp.mean(jnp.abs(rgb_com - target_com))
        else:
            loss = loss_head + loss_com
        if want_w:
            gate = jnp.float32(1.0) if dist_on is None \
                else dist_on.astype(jnp.float32)
            dist = distortion_loss(outs[3], z_vals)
            if tcfg.distortion_stacks == "both":
                dist = dist + distortion_loss(outs[2], z_vals)
            loss = loss + tcfg.distortion_lambda * gate * dist
        if sparsity_lambda > 0.0:
            if sparsity_mode == "visibility":
                loss = loss + sparsity_lambda * visibility_sparsity_loss(
                    params, state, data, k_sparse,
                )
            else:  # "points" or "deadzone"
                loss = loss + sparsity_lambda * sparsity_loss(
                    params, state["z_shape"], state["z_app"], signal,
                    signal_torso, k_sparse,
                )
        return loss, (loss_head, loss_com)

    @jax.jit
    def train_step(
        state: TrainState, data: Dict[str, jnp.ndarray], key: jax.Array
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        step = state["step"]
        k_img, k_pix, k_z, k_sparse = jax.random.split(key, 4)
        img_pos = jax.random.randint(k_img, (), 0, n_train)
        img_i = data["i_train"][img_pos]
        coords = sample_pixel_coords(
            k_pix, H, W, tcfg.n_rand, tcfg.sample_rate, data["rects"][img_i]
        )
        z_vals = stratified_z_vals(
            near, far, tcfg.n_rand, rcfg.n_samples, key=k_z if tcfg.perturb else None
        )
        use_smo = step >= scfg.nosmo_iters
        use_exp = step >= scfg.noexp_iters
        dist_on = step >= tcfg.distortion_from

        (loss, (loss_head, loss_com)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state["params"], state, data, img_i, coords, z_vals, use_smo,
          k_sparse, dist_on)

        grad_norm = jnp.sqrt(sum(
            jnp.sum(g * g) for g in jax.tree.leaves(grads)
        ))
        if tcfg.grad_clip > 0.0:
            scale = jnp.minimum(1.0, tcfg.grad_clip / (grad_norm + 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)

        lr = exp_decay_lr(step, tcfg.lrate, tcfg.lrate_decay)
        gates = {"always": jnp.int32(1), "smo": use_smo.astype(jnp.int32),
                 "exp": use_exp.astype(jnp.int32)}
        new_params = dict(state["params"])
        new_opt = dict(state["opt"])
        for name, lr_mult, gate_kind in OPT_GROUPS:
            p, o = adam_update(
                state["opt"][name],
                grads[name],
                state["params"][name],
                lr * lr_mult,
                gates[gate_kind],
                tcfg.adam_b1,
                tcfg.adam_b2,
                tcfg.adam_eps,
            )
            new_params[name] = p
            new_opt[name] = o

        new_state = {
            **state,
            "params": new_params,
            "opt": new_opt,
            "step": step + 1,
        }
        metrics = {
            "loss": loss,
            "loss_head": loss_head,
            "loss_com": loss_com,
            "psnr_head": -10.0 * jnp.log(loss_head) / jnp.log(10.0),
            "psnr_com": -10.0 * jnp.log(loss_com) / jnp.log(10.0),
            "lr": lr,
            # observability for convergence diagnostics (QUALITY.md): which
            # frame the batch came from and how large the update was —
            # transient val-PSNR dips correlate with outlier gradient
            # steps, and these two fields localize them for free.
            # PRE-clip norm, so spikes stay visible when grad_clip is on.
            "img_i": img_i,
            "grad_norm": grad_norm,
        }
        return new_state, metrics

    return train_step
