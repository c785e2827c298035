"""Depth sampling along rays: stratified/uniform coarse samples and
inverse-CDF hierarchical importance sampling.

``sample_pdf`` matches the reference semantics (run_nerf_helpers.py:537-581)
but is written as a fully-vectorized, searchsorted-based transform that jits
to a single fused XLA program — no host RNG, no dynamic shapes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def stratified_z_vals(
    near: float,
    far: float,
    n_rays: int,
    n_samples: int,
    key: Optional[jax.Array] = None,
    lindisp: bool = False,
) -> jnp.ndarray:
    """Coarse depth values, uniformly spaced in [near, far].

    With ``key`` provided, applies per-bin stratified jitter (the reference's
    ``--perturb`` path); the shipped DFA-NeRF training uses the deterministic
    linspace (run_nerf_com_trainExpLater.py:760-762).

    Returns:
        [n_rays, n_samples] depths.
    """
    t = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32)
    if lindisp:
        z = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    else:
        z = near * (1.0 - t) + far * t
    z = jnp.broadcast_to(z, (n_rays, n_samples))
    if key is not None:
        mids = 0.5 * (z[..., 1:] + z[..., :-1])
        upper = jnp.concatenate([mids, z[..., -1:]], axis=-1)
        lower = jnp.concatenate([z[..., :1], mids], axis=-1)
        u = jax.random.uniform(key, z.shape, dtype=z.dtype)
        z = lower + (upper - lower) * u
    return z


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    key: Optional[jax.Array] = None,
    det: bool = False,
) -> jnp.ndarray:
    """Inverse-transform sample ``n_samples`` new depths from a piecewise-
    constant PDF over ``bins``.

    Parity with run_nerf_helpers.py:537-581: weights get a 1e-5 floor, the
    CDF is prefixed with 0, ``u`` is either linspace (det) or uniform, and
    interpolation denominators < 1e-5 are clamped to 1.

    Args:
        bins: [..., M+1] bin edges (z_vals midpoints in hierarchical NeRF).
        weights: [..., M] per-bin weights (need not be normalized).
        n_samples: number of new samples per ray.
        key: PRNG key; required unless det=True.
        det: deterministic (evenly spaced in CDF) sampling.

    Returns:
        [..., n_samples] sampled depths.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [..., M+1]

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], n_samples))
    else:
        if key is None:
            raise ValueError("sample_pdf: key is required when det=False")
        u = jax.random.uniform(key, (*cdf.shape[:-1], n_samples), dtype=cdf.dtype)

    # torch.searchsorted(..., right=True) + the below/above gathers, done
    # without gathers: both cdf and bins are ascending, so the gathered
    # elements are masked maxima/minima over the broadcast comparison
    # cdf[j] <= u — one fused compare + four reductions. TPU-friendly: a
    # vmapped jnp.searchsorted lowers to a per-query sequential scan and
    # row-wise take_along_axis to serial dynamic-slices (together measured
    # ~3.6 s for 200k rays x 128 queries at render scale; this formulation
    # runs in milliseconds). Selected elements are bit-identical.
    le = cdf[..., None, :] <= u[..., :, None]  # [..., n_samples, M+1]
    ninf = jnp.array(-jnp.inf, cdf.dtype)
    pinf = jnp.array(jnp.inf, cdf.dtype)
    # below = inds - 1 (u >= cdf[0] = 0 always, so the mask is never empty)
    cdf_below = jnp.max(jnp.where(le, cdf[..., None, :], ninf), axis=-1)
    bins_below = jnp.max(jnp.where(le, bins[..., None, :], ninf), axis=-1)
    # above = min(inds, M): empty mask (u >= cdf[-1]) clamps to the last
    cdf_above = jnp.min(jnp.where(le, pinf, cdf[..., None, :]), axis=-1)
    bins_above = jnp.min(jnp.where(le, pinf, bins[..., None, :]), axis=-1)
    cdf_above = jnp.where(jnp.isinf(cdf_above), cdf[..., -1:], cdf_above)
    bins_above = jnp.where(jnp.isinf(bins_above), bins[..., -1:], bins_above)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def hierarchical_z_vals(
    z_vals: jnp.ndarray,
    weights: jnp.ndarray,
    n_importance: int,
    key: Optional[jax.Array] = None,
    det: bool = False,
) -> jnp.ndarray:
    """Coarse-to-fine resampling: draw ``n_importance`` extra depths from the
    coarse weight distribution (excluding the two endpoint weights, as in
    vanilla NeRF) and return the sorted union with the coarse depths.

    Returns:
        [..., n_samples + n_importance] sorted depths.
    """
    z_mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_fine = sample_pdf(z_mids, weights[..., 1:-1], n_importance, key=key, det=det)
    z_fine = jax.lax.stop_gradient(z_fine)
    return jnp.sort(jnp.concatenate([z_vals, z_fine], axis=-1), axis=-1)
