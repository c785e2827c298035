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

    def test_dynamic_speaker_branch_follows_speak_frames(self):
        """With dynamic_speaker, branch selection provably follows
        speak_frames: an object that never speaks routes every frame
        through the signal-free listener branch, so the audio/expression
        encoders receive ZERO gradient and their params stay bit-identical;
        an always-speaking object moves them. (The per-frame switch is the
        semantics of the reference's speaker_ids, run_nerf_com_
        trainExpLater.py:485-489.)"""
        import dataclasses

        cfg = ExperimentConfig(
            train=TrainConfig(n_rand=64, n_object=2),
            render=RenderConfig(n_samples=8),
        )
        ds0 = make_synthetic_dataset(n_frames=6, H=24, W=24, n_samples_gt=16, seed=0)
        ds1 = make_synthetic_dataset(n_frames=6, H=24, W=24, n_samples_gt=16, seed=5)

        def steps(speak0, speak1, n=4):
            d0 = dataclasses.replace(ds0, speak_frames=speak0)
            d1 = dataclasses.replace(ds1, speak_frames=speak1)
            step, data = make_multi_identity_train_step(
                cfg, [d0, d1], dynamic_speaker=True
            )
            state = init_train_state(jax.random.PRNGKey(0), cfg)
            aud0 = jax.tree.map(lambda x: x.copy(), state["params"]["audnet"])
            key = jax.random.PRNGKey(3)
            for _ in range(n):
                key, sub = jax.random.split(key)
                state, m = step(state, data, sub)
            return aud0, state["params"]["audnet"], m

        nobody = np.zeros(6, np.int32)
        everybody = np.ones(6, np.int32)
        # neither object ever speaks -> AudNet untouched
        aud0, aud1, m = steps(nobody, nobody)
        for a, b in zip(jax.tree.leaves(aud0), jax.tree.leaves(aud1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert np.isfinite(float(m["loss"]))
        # object 0 speaks every frame -> AudNet moves
        aud0, aud1, _ = steps(everybody, nobody)
        moved = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(aud0), jax.tree.leaves(aud1))
        )
        assert moved

    def test_compute_speaker_ids_reference_formula(self):
        from dfanerf_tpu.parallel.multi import compute_speaker_ids

        s0 = np.array([1, 0, 0, 1, 1, 0])
        s1 = np.array([0, 1, 0, 1, 0, 0])
        (sid,) = compute_speaker_ids([s0, s1])
        # 0 -> dataset 0 speaks, 1 -> dataset 1, -1 -> neither/both
        np.testing.assert_array_equal(sid, [0, 1, -1, -1, 0, -1])

    @needs_8_devices
    def test_sharded_multi_identity(self):
        mesh = make_mesh(jax.devices()[:8])
        cfg, step, data, state = _setup(mesh=mesh, n_rand=128)
        from dfanerf_tpu.parallel import replicate_state

        state = replicate_state(state, mesh)
        state, m = step(state, data, jax.random.PRNGKey(2))
        assert np.isfinite(float(m["loss"]))
        assert "psnr_com_obj1" in m
