"""Point splatting + train-loop val rendering / profiling options."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dfanerf_tpu.ops.splat import render_geometry_points, splat_points


class TestSplat:
    def test_single_point_lands_at_projection(self):
        pts = jnp.array([[0.0, 0.0, -2.0]])
        colors = jnp.array([[1.0, 0.5, 0.25]])
        color, depth, weight = splat_points(pts, colors, 32.0, (16.0, 16.0), (32, 32))
        # projects to the principal point
        assert float(weight[16, 16]) > 0
        np.testing.assert_allclose(np.asarray(color[16, 16]), [1.0, 0.5, 0.25], atol=1e-5)
        np.testing.assert_allclose(float(depth[16, 16]), 2.0, atol=1e-5)

    def test_nearer_point_dominates(self):
        pts = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -3.0]])
        colors = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        color, depth, _ = splat_points(pts, colors, 32.0, (16.0, 16.0), (32, 32))
        assert float(color[16, 16, 0]) > 0.95  # near red wins
        assert float(depth[16, 16]) < 1.1

    def test_differentiable_wrt_pose(self):
        geom = jax.random.normal(jax.random.PRNGKey(0), (50, 3)) * 0.05
        colors = jnp.ones((50, 3)) * 0.5
        target = jnp.zeros((16, 16, 3))

        def loss(euler, trans):
            img, _, _ = render_geometry_points(
                geom, colors, euler, trans, 20.0, (8.0, 8.0), (16, 16)
            )
            return jnp.mean((img - target) ** 2)

        g = jax.grad(loss, argnums=(0, 1))(
            jnp.zeros(3), jnp.array([0.0, 0.0, -1.0])
        )
        assert all(bool(jnp.isfinite(x).all()) for x in g)
        assert float(jnp.abs(g[1]).max()) > 0  # nonzero pose gradient


class TestLoopExtras:
    def test_val_render_and_metrics(self, tmp_path):
        from dfanerf_tpu.config import ExperimentConfig, RenderConfig, TrainConfig
        from dfanerf_tpu.data import make_synthetic_dataset
        from dfanerf_tpu.train import train_loop

        cfg = ExperimentConfig(
            expname="valtest",
            basedir=str(tmp_path),
            train=TrainConfig(n_rand=128, i_print=10, i_weights=1000,
                              i_test_person=20),
            render=RenderConfig(n_samples=8, tile_rays=512),
        )
        ds = make_synthetic_dataset(n_frames=12, H=24, W=24, n_samples_gt=16)
        train_loop(cfg, ds, n_iters=20, resume=None)
        run = os.path.join(str(tmp_path), "valtest")
        assert os.path.exists(os.path.join(run, "metrics.jsonl"))
        test_dir = os.path.join(run, "test_20")
        assert os.path.isdir(test_dir) and len(os.listdir(test_dir)) >= 1
        import json

        lines = [json.loads(l) for l in open(os.path.join(run, "metrics.jsonl"))]
        assert any("val_psnr" in l for l in lines)
