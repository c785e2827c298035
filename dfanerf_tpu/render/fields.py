"""The shared head+torso ray-batch forward: decoder evaluation, background
concat, field composition, volume rendering.

This is the exact compute the reference performs per train iteration
(run_nerf_com_trainExpLater.py:856-899) and per render chunk (:661-709),
expressed once as a pure function over a ray batch:

- the head field renders alone against the head+neck target — its stack
  gets the background-concat color and a +1e-6 last-slot density bump;
- the composite render stacks [head, torso]; the torso's last-sample
  density is zeroed (only the head field carries the background) and, as
  the LAST field of that stack, gets the +1e-6 bump;
- compositing weights for the head-only render use the HEAD ray norms,
  the composite render uses the TORSO ray norms (reference :894-895).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from dfanerf_tpu.config import RenderConfig
from dfanerf_tpu.core.compositing import volume_render
from dfanerf_tpu.models.decoder import DecoderConfig, apply_decoder
from dfanerf_tpu.ops.fused_render import density_act

Params = Dict[str, Any]


def render_ray_batch(
    decoder_params: Params,
    dec_cfg: DecoderConfig,
    rcfg: RenderConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    rays_o_torso: jnp.ndarray,
    rays_d_torso: jnp.ndarray,
    z_vals: jnp.ndarray,
    signal: jnp.ndarray,
    signal_torso: jnp.ndarray,
    z_shape_head: jnp.ndarray,
    z_app_head: jnp.ndarray,
    z_shape_torso: jnp.ndarray,
    z_app_torso: jnp.ndarray,
    bc_rgb: Optional[jnp.ndarray],
    head_branch: str = "head",
    return_weights: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Render one ray batch through both fields.

    Args:
        rays_o, rays_d: [R, 3] head-camera rays (rays_d unnormalized).
        rays_o_torso, rays_d_torso: [R, 3] torso-camera rays (frame-0 pose).
        z_vals: [R, S] shared sample depths.
        signal: [dim_signal]; signal_torso: [dim_et_embed].
        z_*: [z_dim] latents for the (object, part) pairs.
        bc_rgb: [R, 3] background pixels (required when rcfg.concate_bg).
        head_branch: 'head' (speaker) or 'head_listener' (the reference's
            itr_obj != 0 objects, whose head field takes no audio signal —
            run_nerf_com_trainExpLater.py:70-74 + decoder.py:307).

    Returns:
        rgb_head: [R, 3] head-field-only render (vs head+neck target);
        rgb_com:  [R, 3] head+torso composite render (vs composite target);
        with ``return_weights`` also w_head, w_com [R, S] — each stack's
        per-sample compositing weights (catch-all bg sample included), for
        regularizers over the weight distribution (train/step.py
        distortion loss).
    """
    R, S = z_vals.shape
    compute_dtype = (
        jnp.bfloat16 if rcfg.compute_dtype == "bfloat16" else None
    )

    def field(branch, ro, rd, sig, zs, za):
        pts = ro[:, None, :] + rd[:, None, :] * z_vals[..., None]
        rd_flat = jnp.repeat(rd, S, axis=0)
        feat, sigma = apply_decoder(
            decoder_params, dec_cfg, pts.reshape(-1, 3), rd_flat, zs, za, sig,
            branch, compute_dtype=compute_dtype,
        )
        return feat.reshape(R, S, 3), sigma.reshape(R, S)

    feat_h, sigma_h = field(
        head_branch, rays_o, rays_d,
        signal if head_branch == "head" else None,
        z_shape_head, z_app_head,
    )
    feat_t, sigma_t = field(
        "torso", rays_o_torso, rays_d_torso, signal_torso, z_shape_torso, z_app_torso
    )

    sigma_h = density_act(sigma_h, dec_cfg.density_activation)
    sigma_t = density_act(sigma_t, dec_cfg.density_activation)

    if rcfg.concate_bg:
        assert bc_rgb is not None
        feat_h = jnp.concatenate([feat_h[:, :-1, :], bc_rgb[:, None, :]], axis=1)
        bump = jnp.zeros((R, S)).at[:, -1].add(1e-6)
        sigma_h_headstack = sigma_h + bump  # head is the last (only) field here
        sigma_t_comstack = sigma_t.at[:, -1].set(0.0) + bump  # torso last in stack
    else:
        sigma_h_headstack = sigma_h
        sigma_t_comstack = sigma_t

    rgb_head, w_head = volume_render(
        z_vals,
        rays_d,
        sigma_h_headstack[None],
        feat_h[None],
        last_dist=rcfg.last_dist,
    )
    rgb_com, w_com = volume_render(
        z_vals,
        rays_d_torso,
        jnp.stack([sigma_h, sigma_t_comstack]),
        jnp.stack([feat_h, feat_t]),
        last_dist=rcfg.last_dist,
    )
    if return_weights:
        return rgb_head, rgb_com, w_head, w_com
    return rgb_head, rgb_com


def render_head_hierarchical(
    decoder_params: Params,
    dec_cfg: DecoderConfig,
    rcfg: RenderConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z_vals: jnp.ndarray,
    signal: jnp.ndarray,
    z_shape: jnp.ndarray,
    z_app: jnp.ndarray,
    bc_rgb: Optional[jnp.ndarray],
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Coarse+fine head-field render (the reference's ``--N_importance``
    path: render_rays' 'fine' branch at run_nerf_com_trainExpLater.py:
    122-124 + sample_pdf, dormant in the shipped trainer but part of the
    supported config space — BASELINE config 2).

    Coarse pass at ``z_vals`` -> compositing weights -> inverse-CDF resample
    ``rcfg.n_importance`` extra depths (det when key is None) -> one fine
    pass over the sorted union. Background concat applies to the union's
    last sample like the coarse path.

    Returns rgb [R, 3] from the fine pass.
    """
    from dfanerf_tpu.core.sampling import hierarchical_z_vals

    R, S = z_vals.shape
    compute_dtype = jnp.bfloat16 if rcfg.compute_dtype == "bfloat16" else None

    def field(zv):
        S_all = zv.shape[-1]
        pts = rays_o[:, None, :] + rays_d[:, None, :] * zv[..., None]
        rd_flat = jnp.repeat(rays_d, S_all, axis=0)
        feat, sigma = apply_decoder(
            decoder_params, dec_cfg, pts.reshape(-1, 3), rd_flat,
            z_shape, z_app, signal, "head", compute_dtype=compute_dtype,
        )
        feat = feat.reshape(R, S_all, 3)
        sigma = density_act(sigma.reshape(R, S_all),
                            dec_cfg.density_activation)
        if rcfg.concate_bg:
            assert bc_rgb is not None
            feat = jnp.concatenate([feat[:, :-1, :], bc_rgb[:, None, :]], axis=1)
            sigma = sigma.at[:, -1].add(1e-6)
        return feat, sigma

    feat_c, sigma_c = field(z_vals)
    _, weights = volume_render(
        z_vals, rays_d, sigma_c[None], feat_c[None], last_dist=rcfg.last_dist
    )
    z_fine = hierarchical_z_vals(
        z_vals, weights, rcfg.n_importance, key=key, det=key is None
    )
    feat_f, sigma_f = field(z_fine)
    rgb, _ = volume_render(
        z_fine, rays_d, sigma_f[None], feat_f[None], last_dist=rcfg.last_dist
    )
    return rgb
