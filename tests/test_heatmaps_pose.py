"""Heatmap decode + pose estimation/stabilizer tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dfanerf_tpu.pipeline.heatmaps import (
    decode_heatmaps,
    gaussian_modulation,
    get_max_preds,
)
from dfanerf_tpu.pipeline.pose import KalmanStabilizer, PoseEstimator


def make_gaussian_heatmaps(centers, h=64, w=64, sigma=2.0):
    """centers: [K, 2] (x, y) -> [1, H, W, K]."""
    ys, xs = np.mgrid[0:h, 0:w]
    maps = [
        np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * sigma ** 2))
        for cx, cy in centers
    ]
    return jnp.asarray(np.stack(maps, -1)[None].astype(np.float32))


class TestHeatmaps:
    def test_argmax_decode(self):
        centers = np.array([[10.0, 20.0], [40.5, 33.0], [5.0, 60.0]])
        hm = make_gaussian_heatmaps(centers)
        coords, vals = get_max_preds(hm)
        np.testing.assert_allclose(np.asarray(coords[0]), np.round(centers), atol=1.0)
        assert float(vals.min()) > 0.5

    def test_quarter_refine_improves(self):
        centers = np.array([[10.3, 20.6], [40.7, 33.2]])
        hm = make_gaussian_heatmaps(centers)
        coarse, _ = get_max_preds(hm)
        fine, _ = decode_heatmaps(hm, modulate=False)
        err_coarse = np.abs(np.asarray(coarse[0]) - centers).mean()
        err_fine = np.abs(np.asarray(fine[0]) - centers).mean()
        assert err_fine <= err_coarse + 1e-6

    def test_gaussian_modulation_preserves_peak_location(self):
        centers = np.array([[12.0, 45.0]])
        hm = make_gaussian_heatmaps(centers, sigma=1.0)
        out = gaussian_modulation(hm, sigma=1.5)
        coords, _ = get_max_preds(out)
        np.testing.assert_allclose(np.asarray(coords[0, 0]), centers[0], atol=1.0)
        assert float(out.max()) <= float(hm.max()) + 1e-5
        assert float(out.min()) >= 0.0


class TestPose:
    def test_pnp_recovers_known_pose(self):
        import cv2

        est = PoseEstimator(img_size=(512, 512))
        rvec_gt = np.array([[0.1], [0.2], [-0.05]])
        tvec_gt = np.array([[10.0], [-5.0], [600.0]])
        rot, _ = cv2.Rodrigues(rvec_gt)
        pts_cam = est.model_points_68 @ rot.T + tvec_gt.reshape(3)
        proj = pts_cam @ est.camera_matrix.T
        img_pts = proj[:, :2] / proj[:, 2:3]
        r, t = est.solve_pose_by_68_points(img_pts)
        np.testing.assert_allclose(r.reshape(3), rvec_gt.reshape(3), atol=1e-3)
        np.testing.assert_allclose(t.reshape(3), tvec_gt.reshape(3), rtol=1e-2)
        m = est.pose_to_matrix(r, t)
        assert m.shape == (4, 4)

    def test_kalman_converges_to_constant(self):
        stab = KalmanStabilizer(state_num=2, measure_num=1)
        for _ in range(100):
            stab.update([5.0])
        assert abs(float(stab.state[0]) - 5.0) < 0.2

    def test_kalman_point_smooths_noise(self):
        rng = np.random.RandomState(0)
        stab = KalmanStabilizer(state_num=4, measure_num=2)
        target = np.array([100.0, 50.0])
        outs = []
        for _ in range(200):
            stab.update(target + rng.randn(2) * 3.0)
            outs.append(stab.state[:2, 0].copy())
        outs = np.array(outs[50:])
        assert np.abs(outs.mean(0) - target).max() < 2.0
        assert outs.std(0).max() < 3.0  # smoother than the raw noise
