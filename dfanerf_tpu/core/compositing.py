"""Volume rendering: alpha compositing and multi-field composition.

Numerics deliberately mirror the reference (fp32 discipline: densities and
the transmittance cumprod must stay fp32 even when the MLP runs in bf16):

- ``calc_volume_weights``: run_nerf_com_trainExpLater.py:169-179 — interval
  lengths scaled by ||ray_d||, alpha = 1 - exp(-(relu(sigma)+1e-6) * dist),
  exclusive transmittance cumprod with a 1e-10 guard, last interval
  ``last_dist`` (1e10 by default).
- ``composite_fields``: run_nerf_com_trainExpLater.py:146-166 — multiple
  density fields (head, torso) merged by density-weighted feature averaging
  with a 1e-4 zero-denominator guard.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def calc_volume_weights(
    z_vals: jnp.ndarray,
    ray_d: jnp.ndarray,
    sigma: jnp.ndarray,
    last_dist: float = 1e10,
) -> jnp.ndarray:
    """Per-sample compositing weights alpha_i * T_i.

    Args:
        z_vals: [..., R, S] sample depths.
        ray_d: [..., R, 3] unnormalized ray directions.
        sigma: [..., R, S] densities (pre-activation; relu applied here).
        last_dist: distance assigned to the final interval.

    Returns:
        [..., R, S] weights, sum <= 1 per ray.
    """
    z_vals = z_vals.astype(jnp.float32)
    sigma = sigma.astype(jnp.float32)
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], last_dist)], axis=-1
    )
    dists = dists * jnp.linalg.norm(ray_d.astype(jnp.float32), axis=-1, keepdims=True)
    alpha = 1.0 - jnp.exp(-(jax.nn.relu(sigma) + 1e-6) * dists)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1),
        axis=-1,
    )[..., :-1]
    return alpha * trans


def composite_fields(
    sigma: jnp.ndarray, feat: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge F density fields sampled at shared depths.

    Args:
        sigma: [F, ..., R, S] per-field densities (already relu'd by caller,
            matching the reference which relus the stacked tensor).
        feat: [F, ..., R, S, C] per-field features.

    Returns:
        sigma_sum: [..., R, S] summed density.
        feat_weighted: [..., R, S, C] density-weighted feature mean.
    """
    if sigma.shape[0] == 1:
        return sigma[0], feat[0]
    denom = jnp.sum(sigma, axis=0, keepdims=True)
    denom = jnp.where(denom == 0, 1e-4, denom)
    w = sigma / denom
    sigma_sum = jnp.sum(sigma, axis=0)
    feat_weighted = jnp.sum(feat * w[..., None], axis=0)
    return sigma_sum, feat_weighted


def volume_render(
    z_vals: jnp.ndarray,
    ray_d: jnp.ndarray,
    sigma: jnp.ndarray,
    feat: jnp.ndarray,
    last_dist: float = 1e10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full single-/multi-field volume render to a feature (RGB) map.

    Args:
        z_vals: [R, S]; ray_d: [R, 3];
        sigma: [F, R, S] (multi-field) — pass relu'd densities;
        feat: [F, R, S, C].

    Returns:
        rgb: [R, C] rendered features; weights: [R, S].
    """
    sigma_sum, feat_weighted = composite_fields(sigma, feat)
    weights = calc_volume_weights(z_vals, ray_d, sigma_sum, last_dist=last_dist)
    rgb = jnp.sum(weights[..., None] * feat_weighted.astype(jnp.float32), axis=-2)
    return rgb, weights


def apply_background_concat(
    feat_head: jnp.ndarray,
    sigma_head: jnp.ndarray,
    bc_rgb: jnp.ndarray,
    sigma_torso: jnp.ndarray = None,
):
    """The reference's ``--concate_bg`` trick (run_nerf_com_trainExpLater.py:
    863-886): replace the head field's last sample color with the background
    pixel, zero the torso density at the last sample so only the head field
    carries the background, then add 1e-6 to the last-slot density of the
    LAST field in each stack (head for the head-only stack, torso for the
    head+torso stack) so the background remains reachable when all densities
    are zero.

    Args (per ray batch):
        feat_head: [R, S, 3]; sigma_head: [R, S] (post-relu);
        bc_rgb: [R, 3] background pixels;
        sigma_torso: [R, S] (post-relu) or None.

    Returns:
        (feat_head', sigma_head_for_headstack, sigma_head_for_comstack,
         sigma_torso') — sigma_head_for_headstack has +1e-6 on the last
        sample (it is the last field of the head-only stack); in the
        composite stack the torso is last so the head sigma is unmodified
        there and the torso gets the +1e-6.
    """
    feat_head = jnp.concatenate(
        [feat_head[..., :-1, :], bc_rgb[..., None, :]], axis=-2
    )
    bump = jnp.zeros_like(sigma_head).at[..., -1].add(1e-6)
    sigma_head_headstack = sigma_head + bump
    if sigma_torso is None:
        return feat_head, sigma_head_headstack, sigma_head, None
    sigma_torso = sigma_torso.at[..., -1].set(0.0) + bump
    return feat_head, sigma_head_headstack, sigma_head, sigma_torso
