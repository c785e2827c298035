"""Per-frame conditioning-signal encoding, jit-native.

Reimplements the reference's ``encode_signal`` / ``encode_signal_torso``
(run_nerf_com_trainExpLater.py:28-111) without host-side control flow:

- the smoothing window [i - w/2, i + w/2) with zero padding at the
  boundaries becomes a clamped gather + validity mask (static window size);
- the reference's out-of-bounds rule uses ``len_auds`` = the number of
  VALID frames (it passes len(i_train) during training, so val frames act
  as zero padding) — we take ``n_valid`` as a traced operand;
- the staged-training switch (attention smoothing only after
  ``nosmo_iters``) is a traced boolean select, so one compiled program
  serves all 600k steps.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from dfanerf_tpu.core.geometry import pose_to_euler_trans
from dfanerf_tpu.core.posenc import et_embed
from dfanerf_tpu.models.encoders import (
    apply_audio_attnet,
    apply_audionet_ds,
    apply_audionet_w2l,
    apply_expression_enc,
)

Params = Dict[str, Any]


def window_gather(
    arr: jnp.ndarray, i: jnp.ndarray, size: int, n_valid: jnp.ndarray
) -> jnp.ndarray:
    """[N, D] -> [size, D] window centred at i (zero outside [0, n_valid))."""
    half = size // 2
    idx = i - half + jnp.arange(size)
    valid = (idx >= 0) & (idx < n_valid)
    idx_c = jnp.clip(idx, 0, arr.shape[0] - 1)
    return arr[idx_c] * valid[:, None].astype(arr.dtype)


def encode_signal(
    params: Params,
    auds: jnp.ndarray,
    exps: jnp.ndarray,
    img_i: jnp.ndarray,
    n_valid: jnp.ndarray,
    smo_size: int,
    use_smoothing: jnp.ndarray,
    audio_net: str = "w2l",
    win_size: int = 16,
) -> jnp.ndarray:
    """Audio+expression conditioning for the head field -> [dim_signal].

    Both the smoothed (attention over a ``smo_size`` window) and the
    per-frame paths are computed (the window path costs ~smo_size tiny MLP
    evals) and selected by ``use_smoothing`` — branchless staged training.

    audio_net selects the frontend: 'w2l' runs AudioNet_W2L over [N, 512]
    wav2exp features (the shipped path); 'deepspeech' runs the strided-CNN
    AudioNet over [N, 16, 29] DeepSpeech windows (the aud.npy path).
    """
    if audio_net == "deepspeech":
        def audnet(x):
            return apply_audionet_ds(params["audnet"], x, win_size=win_size)
    else:
        def audnet(x):
            return apply_audionet_w2l(params["audnet"], x)

    # per-frame path
    if audio_net == "deepspeech":
        aud_1 = audnet(auds[img_i][None]).reshape(-1)
    else:
        aud_1 = audnet(auds[img_i])
    exp_1 = apply_expression_enc(params["expnet"], exps[img_i])
    plain = jnp.concatenate([aud_1, exp_1], axis=-1)

    # smoothed path
    if audio_net == "deepspeech":
        half = smo_size // 2
        idx = img_i - half + jnp.arange(smo_size)
        valid = (idx >= 0) & (idx < n_valid)
        auds_win = auds[jnp.clip(idx, 0, auds.shape[0] - 1)]
        auds_win = auds_win * valid[:, None, None].astype(auds.dtype)
    else:
        auds_win = window_gather(auds, img_i, smo_size, n_valid)
    exps_win = window_gather(exps, img_i, smo_size, n_valid)
    feat_win = jnp.concatenate(
        [
            audnet(auds_win),
            apply_expression_enc(params["expnet"], exps_win),
        ],
        axis=-1,
    )
    dim = feat_win.shape[-1]
    smoothed = apply_audio_attnet(params["audattnet"], feat_win, dim)

    return jnp.where(use_smoothing, smoothed, plain)


def get_half_signals(H: int, W: int, sig_aud: jnp.ndarray,
                     sig_eye: jnp.ndarray) -> jnp.ndarray:
    """Split-screen conditioning image: top half rows carry the eye signal,
    bottom half the audio signal (run_nerf_helpers.py:437-446 — used by the
    half-signal ablation path; not active in the shipped run).

    Returns [2*(H//2), W, D] — exactly the reference's shape (it stacks two
    H//2 blocks, so an odd H drops the last row, quirk preserved).
    """
    top = jnp.broadcast_to(sig_eye, (H // 2, W, sig_eye.shape[-1]))
    bottom = jnp.broadcast_to(sig_aud, (H // 2, W, sig_aud.shape[-1]))
    return jnp.concatenate([top, bottom], axis=0)


def encode_signal_torso(
    params: Params,
    poses: jnp.ndarray,
    img_i: jnp.ndarray,
    n_valid: jnp.ndarray,
    smo_torso_size: int,
    use_smoothing: jnp.ndarray,
    et_multires: int = 3,
) -> jnp.ndarray:
    """Pose-embedding conditioning for the torso field -> [dim_et_embed].

    The window gathers raw poses, converts to (euler, trans), embeds each
    half with the NeRF embedder, then attention-averages
    (run_nerf_com_trainExpLater.py:85-105). Boundary rule: the reference
    zero-pads the (euler, trans) vectors and THEN embeds them, so padded
    rows carry the nonzero embedding of the zero vector (cos terms = 1).
    We zero the gathered poses instead; pose_to_euler_trans of the zero
    matrix is the zero vector under its atan2 convention, so the embedded
    window matches the reference bit-for-bit.
    """
    half = smo_torso_size // 2
    idx = img_i - half + jnp.arange(smo_torso_size)
    valid = (idx >= 0) & (idx < n_valid)
    poses_win = poses[jnp.clip(idx, 0, poses.shape[0] - 1)]
    poses_win = poses_win * valid[:, None, None].astype(poses.dtype)
    et_win = pose_to_euler_trans(poses_win)
    emb_win = et_embed(et_win, et_multires)  # [w, 42]
    smoothed = apply_audio_attnet(
        params["poseattnet"], emb_win, emb_win.shape[-1]
    )

    et_1 = pose_to_euler_trans(poses[img_i][None])
    plain = et_embed(et_1, et_multires)[0]

    return jnp.where(use_smoothing, smoothed, plain)
