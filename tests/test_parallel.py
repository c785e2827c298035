"""Multi-device tests on the virtual 8-CPU mesh: sharded step equivalence
and the driver dryrun."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dfanerf_tpu.config import ExperimentConfig, RenderConfig, TrainConfig
from dfanerf_tpu.data import make_synthetic_dataset
from dfanerf_tpu.parallel import make_mesh, make_sharded_train_step, replicate_state
from dfanerf_tpu.train import dataset_to_device, init_train_state, make_train_step

needs_8_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@needs_8_devices
class TestShardedTraining:
    def test_sharded_matches_single_device(self):
        cfg = ExperimentConfig(
            train=TrainConfig(n_rand=256), render=RenderConfig(n_samples=16)
        )
        ds = make_synthetic_dataset(n_frames=8, H=32, W=32, n_samples_gt=32)
        state = init_train_state(jax.random.PRNGKey(0), cfg)
        data = dataset_to_device(ds)
        key = jax.random.PRNGKey(1)

        mesh = make_mesh(jax.devices()[:8])
        step8 = make_sharded_train_step(cfg, ds, mesh)
        s8, m8 = step8(replicate_state(state, mesh), data, key)

        step1 = make_train_step(cfg, ds)
        s1, m1 = step1(state, data, key)

        # identical batch -> identical loss (reduction order differs only
        # by mean-of-means over equal shards)
        assert abs(float(m8["loss"]) - float(m1["loss"])) < 1e-6
        assert np.isfinite(float(m8["loss"]))

    def test_multistep_stability(self):
        cfg = ExperimentConfig(
            train=TrainConfig(n_rand=128), render=RenderConfig(n_samples=8)
        )
        ds = make_synthetic_dataset(n_frames=6, H=16, W=16, n_samples_gt=16)
        mesh = make_mesh(jax.devices()[:8])
        state = replicate_state(init_train_state(jax.random.PRNGKey(0), cfg), mesh)
        data = dataset_to_device(ds)
        step = make_sharded_train_step(cfg, ds, mesh)
        key = jax.random.PRNGKey(2)
        for _ in range(5):
            key, sub = jax.random.split(key)
            state, m = step(state, data, sub)
        assert np.isfinite(float(m["loss"]))
        assert int(state["step"]) == 5

    def test_dryrun_entrypoint(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        rgb_head, rgb_com = jax.jit(fn)(*args)
        assert rgb_head.shape == (1024, 3) and rgb_com.shape == (1024, 3)
        assert bool(jnp.isfinite(rgb_head).all() and jnp.isfinite(rgb_com).all())
