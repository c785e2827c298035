"""3DMM fitting + bundle adjustment: recover known synthetic parameters."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dfanerf_tpu.core.geometry import forward_transform
from dfanerf_tpu.pipeline.face3dmm import (
    forward_geo,
    forward_geo_sub,
    make_synthetic_3dmm,
)
from dfanerf_tpu.pipeline.tracking import bundle_adjust, fit_landmarks, lan_loss


@pytest.fixture(scope="module")
def scene():
    model = make_synthetic_3dmm(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    n = 24
    id_dim, exp_dim = model.base_id.shape[0], model.base_exp.shape[0]
    gt = {
        "id": jnp.asarray(rng.randn(1, id_dim) * 0.3, jnp.float32),
        "exp": jnp.asarray(rng.randn(n, exp_dim) * 0.2, jnp.float32),
        "euler": jnp.asarray(rng.uniform(-0.15, 0.15, (n, 3)), jnp.float32),
        "trans": jnp.asarray(
            np.concatenate(
                [rng.uniform(-20, 20, (n, 2)), -600 + rng.uniform(-30, 30, (n, 1))],
                axis=1,
            ),
            jnp.float32,
        ),
        "focal": jnp.float32(900.0),
    }
    cxy = jnp.array([256.0, 256.0])
    lands_idx = jnp.asarray(model.lands_info[-51:], jnp.int32)
    geo = forward_geo_sub(
        model, jnp.broadcast_to(gt["id"], (n, id_dim)), gt["exp"], lands_idx
    )
    lms51 = forward_transform(geo, gt["euler"], gt["trans"], gt["focal"], cxy)[..., :2]
    # embed as last-51 of a 68-landmark array (tracker slices [-51:])
    lms68 = jnp.concatenate([jnp.zeros((n, 17, 2)), lms51], axis=1)
    return model, gt, cxy, lms68


class TestTracker:
    def test_recovers_pose_and_focal(self, scene):
        model, gt, cxy, lms68 = scene
        params, final_lan = fit_landmarks(
            model,
            lms68,
            cxy,
            focal_candidates=(700, 900, 1100),
            sweep_stride=4,
            n_iters=600,
            id_dim=model.base_id.shape[0],
            exp_dim=model.base_exp.shape[0],
        )
        assert float(params.focal[0]) == 900.0  # sweep picks the true focal
        assert final_lan < 2.0  # sub-1.5px RMS landmark error
        # translations recovered to within a few units (of ~600 scale)
        assert float(jnp.abs(params.trans[:, 2] - gt["trans"][:, 2]).mean()) < 30.0

    def test_bundle_adjust_improves(self, scene):
        model, gt, cxy, lms68 = scene
        n = lms68.shape[0]
        rng = np.random.RandomState(3)
        # BA operates at the reference's normalized scale: trans / 1000
        # (bundle_adjustment.py:26); points start at 0 and live at ~0.03
        trans_ba = gt["trans"] / 1000.0
        k = 16
        pts_gt = jnp.asarray(rng.randn(k, 3) * 0.03, jnp.float32)
        tracks = forward_transform(
            jnp.broadcast_to(pts_gt[None], (n, k, 3)),
            gt["euler"], trans_ba, gt["focal"], cxy,
        )[..., :2]
        # perturb the poses; BA should pull them back
        euler0 = gt["euler"] + jnp.asarray(rng.randn(n, 3) * 0.01, jnp.float32)
        trans0 = trans_ba + jnp.asarray(rng.randn(n, 3) * 0.002, jnp.float32)

        def track_loss(euler, trans):
            proj = forward_transform(
                jnp.broadcast_to(pts_gt[None], (n, k, 3)), euler, trans,
                gt["focal"], cxy,
            )[..., :2]
            return float(lan_loss(proj, tracks))

        before = track_loss(euler0, trans0)
        assert before > 1.0  # perturbation is visible in pixels
        out = bundle_adjust(
            tracks, euler0, trans0, gt["focal"], cxy,
            iters_pts=200, iters_joint=400,
        )
        assert out["loss"] < before * 0.5
        assert np.isfinite(out["loss"])
        assert out["euler"].shape == (n, 3) and out["trans"].shape == (n, 3)
