"""Synthetic audio-driven scene for tests, benchmarks, and convergence runs.

The reference repo's only data is a (missing-from-checkout) Obama video; its
quality control is PSNR on held-out frames (SURVEY.md §4). To make the
framework testable without any video assets we synthesize the same problem
shape: an analytic "talking head" — a lambertian sphere whose color pulses
with a scalar audio state, over a torso box and a static background — is
volume-rendered into ground-truth frames with the framework's own (golden-
tested) compositing. A NeRF trained on these frames must converge, and a
renderer benchmarked on them exercises the exact shipped compute path
(head field + torso field + background concat at 450p).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from dfanerf_tpu.core.compositing import volume_render
from dfanerf_tpu.core.rays import get_rays
from dfanerf_tpu.core.sampling import stratified_z_vals
from dfanerf_tpu.data.dataset import FrameDataset


def _lookat_pose(eye: np.ndarray, target: np.ndarray, up=(0.0, 1.0, 0.0)):
    z = eye - target
    z = z / np.linalg.norm(z)  # camera +z points AWAY from scene (looks -z)
    x = np.cross(np.asarray(up, np.float64), z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, eye
    return c2w


def analytic_field(pts: jnp.ndarray, audio_state: jnp.ndarray,
                   include_torso: bool = True):
    """Analytic radiance field: (head sphere [+ torso box]) driven by a scalar.

    Args:
        pts: [N, 3] world points.
        audio_state: scalar in [-1, 1] modulating the head color / mouth.
        include_torso: with False, only the head sphere contributes — used
            for the head-only GT composites (the reference's ``head_imgs``
            are head-over-background with the torso removed,
            process_data_ba.py:270-286 / load_audface.py:86-91).
    Returns:
        rgb [N, 3] in [0,1], sigma [N] >= 0.
    """
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    # head: sphere r=0.10 at origin
    d_head = jnp.linalg.norm(pts, axis=-1) - 0.10
    sigma_head = 80.0 * jax.nn.sigmoid(-d_head / 0.008)
    # mouth band: color pulses with audio in a lower-face stripe
    mouth = jnp.exp(-(((y + 0.04) / 0.02) ** 2)) * (jnp.abs(x) < 0.05)
    head_rgb = jnp.stack(
        [
            0.8 + 0.15 * jnp.sin(12.0 * x),
            0.55 + 0.3 * audio_state * mouth,
            0.45 + 0.1 * jnp.cos(9.0 * z),
        ],
        axis=-1,
    )
    if not include_torso:
        return jnp.clip(head_rgb, 0.0, 1.0), sigma_head
    # torso: axis-aligned box below the head
    q = jnp.abs(pts - jnp.array([0.0, -0.22, 0.0])) - jnp.array([0.13, 0.11, 0.06])
    d_torso = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1) + jnp.minimum(
        jnp.max(q, axis=-1), 0.0
    )
    sigma_torso = 80.0 * jax.nn.sigmoid(-d_torso / 0.008)
    torso_rgb = jnp.broadcast_to(jnp.array([0.2, 0.25, 0.6]), pts.shape)

    sigma = jnp.maximum(sigma_head, sigma_torso)
    w = sigma_head / jnp.maximum(sigma_head + sigma_torso, 1e-6)
    rgb = w[..., None] * head_rgb + (1 - w[..., None]) * torso_rgb
    return jnp.clip(rgb, 0.0, 1.0), sigma


def _render_gt_frame(c2w, H, W, focal, audio_state, bc, n_samples, near, far,
                     include_torso: bool = True):
    rays_o, rays_d = get_rays(H, W, focal, c2w)
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    z_vals = stratified_z_vals(near, far, H * W, n_samples)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    rgb, sigma = analytic_field(pts.reshape(-1, 3), audio_state, include_torso)
    rgb = rgb.reshape(H * W, n_samples, 3)
    sigma = sigma.reshape(H * W, n_samples)
    # background concat: last sample is the background pixel at full density
    rgb = jnp.concatenate([rgb[:, :-1], bc.reshape(H * W, 1, 3)], axis=1)
    sigma = sigma.at[:, -1].set(1e6)
    out, _ = volume_render(z_vals, rays_d, sigma[None], rgb[None])
    return out.reshape(H, W, 3)


def featurize_audio_state(audio_state: np.ndarray):
    """The synthetic scene's conditioning contract: scalar driving state
    [N] in ~[-1, 1] -> (auds [N, 512], exps [N, 64]) — deterministic,
    information-complete wav2exp-style features. This is the scene's
    analogue of the reference's fixed feature extractor: training and
    novel-audio driving must BOTH use it (load_audface.py:14-47 drives
    test audio through the same aud_file pipeline that produced the
    training features), otherwise the decoder is conditioned on
    out-of-distribution signals and renders a garbage-dense field."""
    audio_state = np.asarray(audio_state, np.float32)
    freqs = np.linspace(0.5, 3.0, 256, dtype=np.float32)
    auds = np.concatenate(
        [np.sin(np.outer(audio_state, freqs)),
         np.cos(np.outer(audio_state, freqs))],
        axis=1,
    ).astype(np.float32)  # [N, 512]
    exps = np.sin(np.outer(audio_state, np.linspace(1.0, 2.0, 64))).astype(
        np.float32
    )  # [N, 64]
    return auds, exps


def make_synthetic_dataset(
    n_frames: int = 40,
    H: int = 64,
    W: int = 64,
    n_samples_gt: int = 128,
    near: float = 0.3,
    far: float = 0.9,
    seed: int = 0,
    val_every: int = 10,
) -> FrameDataset:
    """Build a fully self-contained FrameDataset (no disk assets)."""
    rng = np.random.RandomState(seed)
    focal = 1.1 * max(H, W)
    t = np.arange(n_frames, dtype=np.float32)
    audio_state = np.sin(0.5 * t) * np.cos(0.13 * t)  # scalar driving signal
    auds, exps = featurize_audio_state(audio_state)

    # orbiting camera with small jitter (head poses); torso uses frame 0
    poses = np.zeros((n_frames, 4, 4), np.float32)
    for i in range(n_frames):
        ang = 0.25 * np.sin(0.3 * i) + 0.02 * rng.randn()
        el = 0.1 * np.cos(0.2 * i)
        eye = 0.6 * np.array([np.sin(ang), np.sin(el) * 0.3, np.cos(ang)])
        poses[i] = _lookat_pose(eye.astype(np.float32), np.zeros(3))

    # background: soft vertical gradient
    yy = np.linspace(0.85, 0.65, H, dtype=np.float32)[:, None]
    bc = np.broadcast_to(
        np.stack([yy, yy * 0.95, yy * 0.9], axis=-1), (H, W, 3)
    ).copy()

    # Two target sets, matching the reference's on-disk contract
    # (load_audface.py:86-91): ``com_imgs`` = full head+torso composite over
    # the background; ``head_imgs`` = HEAD-ONLY over the background (torso
    # removed). The head loss targeting the head-only composite is what pins
    # the head volume into the head field
    # (run_nerf_com_trainExpLater.py:902-907) — with a shared full-composite
    # target the head field can collapse to empty while the torso field's
    # signal-conditioned far-plane catch-all absorbs the whole image.
    render = jax.jit(
        lambda c2w, a, torso: _render_gt_frame(
            c2w, H, W, focal, a, jnp.asarray(bc), n_samples_gt, near, far,
            torso,
        ),
        static_argnums=2,
    )
    imgs = np.zeros((n_frames, H, W, 3), np.uint8)
    imgs_head = np.zeros((n_frames, H, W, 3), np.uint8)
    for i in range(n_frames):
        c2w = jnp.asarray(poses[i])
        a = jnp.float32(audio_state[i])
        imgs[i] = (
            np.clip(np.asarray(render(c2w, a, True)), 0, 1) * 255
        ).astype(np.uint8)
        imgs_head[i] = (
            np.clip(np.asarray(render(c2w, a, False)), 0, 1) * 255
        ).astype(np.uint8)

    # face rect: central square around the head (pixel coords y,x order as
    # the reference rect convention [x, y, w, h] with x=row — see
    # run_nerf_com_trainExpLater.py:792-795 which treats rect[0] as row)
    rects = np.tile(
        np.array([[H // 4, W // 4, H // 2, W // 2]], np.int32), (n_frames, 1)
    )

    idx = np.arange(n_frames, dtype=np.int32)
    i_val = idx[:: max(val_every, 1)][1:] if n_frames > val_every else idx[-2:]
    i_train = np.setdiff1d(idx, i_val)

    return FrameDataset(
        poses=poses,
        auds=auds,
        exps=exps,
        imgs_head=imgs_head,
        imgs_com=imgs,
        bc_img=(bc * 255).astype(np.uint8),
        sample_rects=rects,
        hwfcxy=(H, W, float(focal), W * 0.5, H * 0.5),
        i_train=i_train,
        i_val=i_val,
        near=near,
        far=far,
    )
