"""Landmark-model training tools: heatmap targets, losses, NME evaluation,
and a jitted train step for the face/eye heatmap networks.

Re-designs of the face-alignment training stack (lib/core/loss.py,
function.py train_face/validate_face, evaluate.py, tools/train*.py) — the
upstream tooling that produced the pipeline's landmark checkpoints:

- ``gaussian_targets``: the standard MSRA-style per-joint Gaussian target
  maps with a target_weight mask for out-of-map joints.
- ``joints_mse_loss``: JointsMSELoss (0.5 * MSE per joint with optional
  target weights).
- ``wing_loss`` / ``adaptive_wing_loss``: WingLoss (loss.py:93-102) and
  AWingLoss (loss.py:105-122) exactly, as branchless jnp.
- ``compute_nme``: inter-ocular-normalized mean error (evaluate.py:99-123;
  68-landmark convention: landmarks 36/45).
- ``make_heatmap_train_step``: jitted Adam step over any (params, apply)
  heatmap net — HRNet or the GhostNet eye net plug in directly.
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dfanerf_tpu.train.optim import adam_init, adam_update


def gaussian_targets(
    joints: jnp.ndarray, heatmap_hw: Tuple[int, int], sigma: float = 1.5
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """joints [N, K, 2] (x, y) in heatmap coords -> targets [N, H, W, K],
    weights [N, K] (0 for joints outside the map)."""
    H, W = heatmap_hw
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :, None]
    jx = joints[..., 0][:, None, None, :]
    jy = joints[..., 1][:, None, None, :]
    g = jnp.exp(-((xs - jx) ** 2 + (ys - jy) ** 2) / (2.0 * sigma ** 2))
    inside = (
        (joints[..., 0] >= 0) & (joints[..., 0] < W)
        & (joints[..., 1] >= 0) & (joints[..., 1] < H)
    )
    return g * inside[:, None, None, :], inside.astype(jnp.float32)


def joints_mse_loss(
    pred: jnp.ndarray, target: jnp.ndarray, target_weight=None
) -> jnp.ndarray:
    """0.5 * per-joint MSE, averaged over joints (JointsMSELoss)."""
    diff = pred - target
    if target_weight is not None:
        diff = diff * target_weight[:, None, None, :]
    return 0.5 * jnp.mean(diff ** 2)


def wing_loss(
    pred: jnp.ndarray, target: jnp.ndarray, omega: float = 10.0, epsilon: float = 2.0
) -> jnp.ndarray:
    """WingLoss (loss.py:86-102, defaults omega=10 epsilon=2): log region
    below omega, linear above."""
    d = jnp.abs(target - pred)
    c = omega - omega * math.log(1 + omega / epsilon)
    return jnp.mean(
        jnp.where(d < omega, omega * jnp.log(1 + d / epsilon), d - c)
    )


def adaptive_wing_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    omega: float = 14.0,
    theta: float = 0.5,
    epsilon: float = 1.0,
    alpha: float = 2.1,
) -> jnp.ndarray:
    """AWingLoss (loss.py:105-122), branchless."""
    y = target
    d = jnp.abs(y - pred)
    t_eps = theta / epsilon
    a = (
        omega
        * (1.0 / (1.0 + t_eps ** (alpha - y)))
        * (alpha - y)
        * (t_eps ** (alpha - y - 1.0))
        / epsilon
    )
    c = theta * a - omega * jnp.log(1.0 + t_eps ** (alpha - y))
    small = omega * jnp.log(1.0 + (d / epsilon) ** (alpha - y))
    large = a * d - c
    return jnp.mean(jnp.where(d < theta, small, large))


def compute_nme(preds: np.ndarray, targets: np.ndarray,
                box_size: np.ndarray = None) -> np.ndarray:
    """Normalized mean error per sample (evaluate.py:99-123 conventions):
    68 pts -> inter-ocular 36/45; 98 -> 60/72; 29 -> 8/9; 19 -> box size."""
    preds = np.asarray(preds)
    targets = np.asarray(targets)
    n, L = preds.shape[:2]
    out = np.zeros(n)
    for i in range(n):
        gt = targets[i]
        if L == 19:
            norm = box_size[i]
        elif L == 29:
            norm = np.linalg.norm(gt[8] - gt[9])
        elif L == 68:
            norm = np.linalg.norm(gt[36] - gt[45])
        elif L == 98:
            norm = np.linalg.norm(gt[60] - gt[72])
        else:
            norm = np.linalg.norm(gt.max(0) - gt.min(0))
        out[i] = np.mean(np.linalg.norm(preds[i] - gt, axis=1)) / max(norm, 1e-8)
    return out


def multistep_lr(base_lr: float, epoch, milestones=(90, 110),
                 factor: float = 0.1):
    """MultiStepLR (tools/train.py:177-179; defaults LR_STEP=[90,110],
    LR_FACTOR=0.1, lib/config/default.py:122-125): lr * factor^(#milestones
    passed). Works on traced or python epochs."""
    drops = sum(jnp.asarray(epoch >= m, jnp.float32) for m in milestones)
    return base_lr * factor ** drops


def validate_landmarks(
    apply_fn: Callable,
    params,
    images: jnp.ndarray,
    gt_joints: np.ndarray,
    sigma: float = 1.5,
    modulate: bool = True,
    failure_threshold: float = 0.1,
):
    """The validate_face evaluation harness (lib/core/function.py
    validate_face + evaluate.py): run the net, decode heatmaps (gaussian
    modulation + argmax + quarter refine), compute per-sample NME in
    heatmap coordinates, and the failure rate at the standard 0.1
    threshold. Returns dict(nme_mean, nme, failure_rate, preds)."""
    from dfanerf_tpu.pipeline.heatmaps import decode_heatmaps

    heatmaps = apply_fn(params, images)
    coords, _ = decode_heatmaps(heatmaps, sigma=sigma, modulate=modulate)
    preds = np.asarray(coords)
    nme = compute_nme(preds, np.asarray(gt_joints))
    return {
        "nme_mean": float(nme.mean()),
        "nme": nme,
        "failure_rate": float((nme > failure_threshold).mean()),
        "preds": preds,
    }


def lr_range_test(
    apply_fn: Callable,
    params,
    opt,
    batches,
    lr_min: float = 1e-6,
    lr_max: float = 1.0,
    sigma: float = 1.5,
):
    """The find_best_lr sweep (tools/find_best_lr.py): exponentially ramp
    the LR across the given (images, joints) batches and record loss(lr);
    the knee of the curve picks the training LR. Returns (lrs, losses)."""
    n = len(batches)
    gamma = (lr_max / lr_min) ** (1.0 / max(n - 1, 1))

    @jax.jit
    def step(params, opt, images, joints, lr):
        def objective(p):
            pred = apply_fn(p, images)
            hw = (pred.shape[1], pred.shape[2])
            target, weight = gaussian_targets(joints, hw, sigma)
            return joints_mse_loss(pred, target, weight)

        l, grads = jax.value_and_grad(objective)(params)
        params, opt = adam_update(opt, grads, params, lr, jnp.int32(1))
        return params, opt, l

    lrs, losses = [], []
    lr = lr_min
    for images, joints in batches:
        params, opt, l = step(params, opt, jnp.asarray(images),
                              jnp.asarray(joints), lr)
        lrs.append(lr)
        losses.append(float(l))
        lr *= gamma
    return np.asarray(lrs), np.asarray(losses)


def make_heatmap_train_step(
    apply_fn: Callable,
    loss: str = "mse",
    lr: float = 1e-3,
    sigma: float = 1.5,
):
    """Jitted heatmap-regression train step for any (params, images) ->
    heatmaps network (HRNet / eye net).

    Returns (init_opt, step) where step(params, opt, images, joints) ->
    (params, opt, loss); joints are in heatmap coordinates.
    """
    loss_fns = {
        "mse": joints_mse_loss,
        "awing": lambda p, t, w=None: adaptive_wing_loss(p, t),
        "wing": lambda p, t, w=None: wing_loss(p, t),
    }
    loss_fn = loss_fns[loss]

    @jax.jit
    def step(params, opt, images, joints):
        def objective(params):
            pred = apply_fn(params, images)
            hw = (pred.shape[1], pred.shape[2])
            target, weight = gaussian_targets(joints, hw, sigma)
            return loss_fn(pred, target, weight)

        l, grads = jax.value_and_grad(objective)(params)
        params, opt = adam_update(opt, grads, params, lr, jnp.int32(1))
        return params, opt, l

    return adam_init, step
