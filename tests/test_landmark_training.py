"""Landmark-training tools: loss parity vs the reference torch losses,
target/NME semantics, and an eye-net training smoke run."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import REFERENCE_ROOT, reference_available

from dfanerf_tpu.pipeline.landmark_training import (
    adaptive_wing_loss,
    compute_nme,
    gaussian_targets,
    joints_mse_loss,
    make_heatmap_train_step,
    wing_loss,
)

needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


class TestLosses:
    @needs_reference
    def test_wing_and_awing_parity(self):
        import os, sys

        sys.path.insert(
            0, os.path.join(REFERENCE_ROOT, "data_util", "face-alignment", "lib", "core")
        )
        import torch
        from loss import AWingLoss, WingLoss

        rng = np.random.RandomState(0)
        pred = rng.rand(2, 6, 16, 16).astype(np.float32)
        target = rng.rand(2, 6, 16, 16).astype(np.float32)
        ref_w = WingLoss()(torch.tensor(pred), torch.tensor(target)).item()
        ref_aw = AWingLoss()(torch.tensor(pred), torch.tensor(target)).item()
        ours_w = float(wing_loss(jnp.asarray(pred), jnp.asarray(target)))
        ours_aw = float(adaptive_wing_loss(jnp.asarray(pred), jnp.asarray(target)))
        np.testing.assert_allclose(ours_w, ref_w, rtol=1e-5)
        np.testing.assert_allclose(ours_aw, ref_aw, rtol=1e-5)

    def test_targets_and_mse(self):
        joints = jnp.array([[[8.0, 4.0], [100.0, 4.0]]])  # second out of map
        t, w = gaussian_targets(joints, (16, 16), sigma=1.0)
        assert t.shape == (1, 16, 16, 2)
        assert float(t[0, 4, 8, 0]) == pytest.approx(1.0)
        assert float(w[0, 0]) == 1.0 and float(w[0, 1]) == 0.0
        assert float(t[..., 1].max()) == 0.0
        assert float(joints_mse_loss(t, t)) == 0.0

    def test_nme_conventions(self):
        gt = np.zeros((1, 68, 2))
        gt[0, 36] = (0, 0)
        gt[0, 45] = (10, 0)
        pred = gt + 1.0
        nme = compute_nme(pred, gt)
        assert nme[0] == pytest.approx(np.sqrt(2) / 10.0)


class TestToolHarness:
    def test_multistep_lr(self):
        from dfanerf_tpu.pipeline.landmark_training import multistep_lr

        assert multistep_lr(1e-3, 0) == pytest.approx(1e-3)
        assert multistep_lr(1e-3, 90) == pytest.approx(1e-4)
        assert multistep_lr(1e-3, 110) == pytest.approx(1e-5)

    def test_validate_landmarks_perfect_net(self):
        """A 'net' that emits ideal Gaussian heatmaps at the gt joints must
        score ~0 NME and 0 failure rate."""
        import jax.numpy as jnp

        from dfanerf_tpu.pipeline.landmark_training import (
            gaussian_targets, validate_landmarks,
        )

        rng = np.random.RandomState(0)
        joints = rng.uniform(6, 26, (3, 68, 2)).astype(np.float32)

        def apply_fn(params, images):
            t, _ = gaussian_targets(jnp.asarray(joints), (32, 32), 1.5)
            return t

        out = validate_landmarks(apply_fn, None, None, joints)
        assert out["nme_mean"] < 0.02
        assert out["failure_rate"] == 0.0

    def test_lr_range_test_runs(self):
        import jax
        import jax.numpy as jnp

        from dfanerf_tpu.models.perception.ghostnet_eye import (
            apply_eye_net, init_eye_net,
        )
        from dfanerf_tpu.pipeline.landmark_training import lr_range_test
        from dfanerf_tpu.train.optim import adam_init

        params = init_eye_net(jax.random.PRNGKey(0))
        rng = np.random.RandomState(1)
        batches = [
            (rng.rand(2, 32, 48, 1).astype(np.float32),
             rng.uniform(2, 14, (2, 6, 2)).astype(np.float32))
            for _ in range(4)
        ]
        lrs, losses = lr_range_test(
            apply_eye_net, params, adam_init(params), batches,
            lr_min=1e-5, lr_max=1e-2,
        )
        assert len(lrs) == len(losses) == 4
        assert lrs[0] == pytest.approx(1e-5) and lrs[-1] == pytest.approx(1e-2)
        assert np.isfinite(losses).all()


class TestTrainStep:
    def test_eye_net_learns_heatmaps(self):
        from dfanerf_tpu.models.perception.ghostnet_eye import (
            apply_eye_net, init_eye_net,
        )

        params = init_eye_net(jax.random.PRNGKey(0))
        init_opt, step = make_heatmap_train_step(apply_eye_net, loss="mse", lr=1e-3)
        opt = init_opt(params)
        rng = np.random.RandomState(1)
        images = jnp.asarray(rng.rand(2, 32, 48, 1).astype(np.float32))
        joints = jnp.asarray(rng.uniform(2, 14, (2, 6, 2)).astype(np.float32))
        losses = []
        for _ in range(15):
            params, opt, l = step(params, opt, images, joints)
            losses.append(float(l))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
