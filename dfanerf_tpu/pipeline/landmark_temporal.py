"""Temporal (time-SE) landmark train/validate loops.

The reference's time-SE variants (lib/core/function.py:
train_face_time_se / validate_face_time_se, :2993-3996) run landmark
models whose input carries ``IMG_CHANNEL - 3`` EXTRA channels holding the
previous frame's predicted heatmaps (function.py:3010,3042-3061): a
rolling heatmap buffer is zeroed at every video boundary (``vid_idx``
change, :3052-3054), written into the input's trailing channels, and
refilled from the model's output after each step — temporal feedback for
video landmark stability.

TPU-native formulation: the stateful Python loop becomes a ``lax.scan``
over the frame axis with the previous-heatmap buffer as carry — one
compiled program per sequence, no host round-trips. Video boundaries
reset the carry via a mask computed from ``vid_idx`` (static data).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def run_temporal_sequence(
    apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
    frames: jnp.ndarray,
    vid_idx: jnp.ndarray,
    n_hm_channels: int,
    hm_to_input: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Scan a landmark model over a frame sequence with heatmap feedback.

    apply_fn: [H, W, 3 + n_hm_channels] -> heatmaps [h, w, n_hm_channels]
        (the model consumes image+previous-heatmap channels and emits the
        current heatmaps, the time-SE contract).
    frames: [F, H, W, 3]; vid_idx: [F] int (carry reset where it changes,
        function.py:3052-3054).
    hm_to_input: optional resize/transform from the model's heatmap
        resolution to the input resolution (the reference writes heatmaps
        at IMAGE_SIZE, so identity by default).

    Returns all per-frame heatmaps [F, h, w, n_hm_channels].
    """
    H, W = frames.shape[1:3]
    if hm_to_input is None:
        hm_to_input = lambda hm: hm
    same_vid = jnp.concatenate([
        jnp.zeros((1,), bool), vid_idx[1:] == vid_idx[:-1]
    ])

    def step(prev_hm, inp):
        frame, keep = inp
        prev = jnp.where(keep, prev_hm, jnp.zeros_like(prev_hm))
        x = jnp.concatenate(
            [frame, hm_to_input(prev)], axis=-1
        )
        hm = apply_fn(x)
        return hm, hm

    hm0 = jnp.zeros(
        jax.eval_shape(
            apply_fn,
            jax.ShapeDtypeStruct((H, W, 3 + n_hm_channels), frames.dtype),
        ).shape,
        jnp.float32,
    )
    _, hms = jax.lax.scan(step, hm0, (frames, same_vid))
    return hms


def temporal_validate(
    apply_fn,
    frames: jnp.ndarray,
    vid_idx: jnp.ndarray,
    gt_landmarks: np.ndarray,
    n_hm_channels: int,
    decode_fn: Callable[[jnp.ndarray], np.ndarray],
    failure_threshold: float = 0.10,
) -> Dict[str, object]:
    """validate_face_time_se's metric surface: scan the sequence with
    predicted-heatmap feedback, decode landmarks, report NME + failure
    rate (function.py:3019-3027 counters)."""
    from dfanerf_tpu.pipeline.landmark_eval import compute_nme_benchmark

    hms = run_temporal_sequence(apply_fn, frames, vid_idx, n_hm_channels)
    preds = np.stack([np.asarray(decode_fn(h)) for h in hms])
    nme = compute_nme_benchmark(preds, np.asarray(gt_landmarks))
    return {
        "nme_mean": float(nme.mean()),
        "nme": nme,
        "failure_rate": float((nme > failure_threshold).mean()),
        "heatmaps": hms,
    }


def make_temporal_train_step(
    apply_fn_with_params,
    loss_fn,
    optimizer_update,
    n_hm_channels: int,
    teacher_forcing: bool = True,
):
    """train_face_time_se's training contract: sequences train with the
    PREVIOUS frame's heatmaps in the trailing input channels. With
    ``teacher_forcing`` the previous GROUND-TRUTH heatmaps feed the input
    (stable gradients, the common recipe); otherwise the model's own
    stop-gradient'd predictions do (matching inference exactly).

    Returns step(params, opt, frames [F,H,W,3], gt_hms [F,h,w,C],
    vid_idx [F]) -> (params, opt, loss).
    """

    @jax.jit
    def step(params, opt, frames, gt_hms, vid_idx):
        same_vid = jnp.concatenate([
            jnp.zeros((1,), bool), vid_idx[1:] == vid_idx[:-1]
        ])

        def loss_of(params):
            def body(prev_hm, inp):
                frame, gt, keep = inp
                prev = jnp.where(keep, prev_hm, jnp.zeros_like(prev_hm))
                x = jnp.concatenate([frame, prev], axis=-1)
                hm = apply_fn_with_params(params, x)
                l = loss_fn(hm, gt)
                nxt = gt if teacher_forcing else jax.lax.stop_gradient(hm)
                return nxt, l

            _, ls = jax.lax.scan(
                body, jnp.zeros_like(gt_hms[0]),
                (frames, gt_hms, same_vid),
            )
            return ls.mean()

        loss, grads = jax.value_and_grad(loss_of)(params)
        params, opt = optimizer_update(opt, grads, params)
        return params, opt, loss

    return step
