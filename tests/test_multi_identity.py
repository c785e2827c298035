"""Multi-identity (n_object>1) training: speaker + listener share the
decoder; both converge; rays shard over the virtual mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dfanerf_tpu.config import ExperimentConfig, RenderConfig, TrainConfig
from dfanerf_tpu.data import make_synthetic_dataset
from dfanerf_tpu.parallel import make_mesh
from dfanerf_tpu.parallel.multi import make_multi_identity_train_step
from dfanerf_tpu.train import init_train_state

needs_8_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _setup(mesh=None, n_rand=128):
    cfg = ExperimentConfig(
        train=TrainConfig(n_rand=n_rand, n_object=2),
        render=RenderConfig(n_samples=8),
    )
    ds0 = make_synthetic_dataset(n_frames=6, H=24, W=24, n_samples_gt=16, seed=0)
    ds1 = make_synthetic_dataset(n_frames=6, H=24, W=24, n_samples_gt=16, seed=5)
    step, data = make_multi_identity_train_step(cfg, [ds0, ds1], mesh)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    return cfg, step, data, state


class TestMultiIdentity:
    def test_two_objects_converge(self):
        cfg, step, data, state = _setup()
        key = jax.random.PRNGKey(1)
        losses = []
        for _ in range(60):
            key, sub = jax.random.split(key)
            state, m = step(state, data, sub)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-10:]) < 0.8 * np.mean(losses[:10])
        assert int(state["step"]) == 60

    @needs_8_devices
    def test_sharded_multi_identity(self):
        mesh = make_mesh(jax.devices()[:8])
        cfg, step, data, state = _setup(mesh=mesh, n_rand=128)
        from dfanerf_tpu.parallel import replicate_state

        state = replicate_state(state, mesh)
        state, m = step(state, data, jax.random.PRNGKey(2))
        assert np.isfinite(float(m["loss"]))
        assert "psnr_com_obj1" in m
