"""Time-SE temporal landmark loops (pipeline/landmark_temporal.py) vs the
reference's heatmap-feedback contract (lib/core/function.py:2993-3090:
rolling previous-heatmap input channels, zeroed at video boundaries)."""

import numpy as np
import jax
import jax.numpy as jnp

from dfanerf_tpu.pipeline.landmark_temporal import (
    make_temporal_train_step,
    run_temporal_sequence,
    temporal_validate,
)


def _toy_apply(x):
    """Model stub: output heatmap = mean of image channels + 0.5 * the
    fed-back previous heatmap (so feedback is observable)."""
    img, prev = x[..., :3], x[..., 3:]
    return img.mean(-1, keepdims=True) + 0.5 * prev


def test_carry_resets_at_video_boundary():
    F, H = 5, 4
    frames = jnp.ones((F, H, H, 3))
    vid = jnp.asarray([0, 0, 0, 1, 1])
    hms = run_temporal_sequence(_toy_apply, frames, vid, 1)
    # within video 0: 1, 1.5, 1.75 (geometric feedback); reset at frame 3
    got = np.asarray(hms[:, 0, 0, 0])
    np.testing.assert_allclose(got, [1.0, 1.5, 1.75, 1.0, 1.5], atol=1e-6)


def test_temporal_validate_metrics():
    F, H = 4, 8
    frames = jnp.zeros((F, H, H, 3))
    vid = jnp.zeros((F,), jnp.int32)
    gt = np.tile(np.linspace(10, 50, 68 * 2).reshape(1, 68, 2), (F, 1, 1))
    out = temporal_validate(
        _toy_apply, frames, vid, gt, 1,
        decode_fn=lambda hm: gt[0] + 1.0,
    )
    assert out["nme_mean"] > 0 and 0.0 <= out["failure_rate"] <= 1.0
    assert out["heatmaps"].shape[0] == F


def test_temporal_train_step_learns():
    """A linear per-pixel model under the scan learns to reproduce target
    heatmaps (loss decreases) with teacher forcing."""
    F, H = 6, 4
    key = jax.random.PRNGKey(0)
    frames = jax.random.uniform(key, (F, H, H, 3))
    gt_hms = frames.mean(-1, keepdims=True) * 2.0
    vid = jnp.asarray([0, 0, 0, 1, 1, 1])

    def apply_fn(params, x):
        return x[..., :3].mean(-1, keepdims=True) * params["w"] + \
            x[..., 3:] * params["u"] + params["b"]

    def loss_fn(hm, gt):
        return jnp.mean((hm - gt) ** 2)

    def sgd(opt, grads, params):
        return jax.tree.map(lambda p, g: p - 0.5 * g, params, grads), opt

    step = make_temporal_train_step(apply_fn, loss_fn, sgd, 1)
    params = {"w": jnp.ones(()), "u": jnp.zeros(()), "b": jnp.zeros(())}
    losses = []
    for _ in range(30):
        params, _, l = step(params, None, frames, gt_hms, vid)
        losses.append(float(l))
    assert losses[-1] < 0.05 * losses[0]
