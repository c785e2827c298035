"""Train-step tests: convergence on the synthetic scene, staged optimizer
gating, pixel sampling semantics, checkpoint roundtrip."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dfanerf_tpu.config import ExperimentConfig, RenderConfig, SignalConfig, TrainConfig
from dfanerf_tpu.data import make_synthetic_dataset
from dfanerf_tpu.train import dataset_to_device, init_train_state, make_train_step
from dfanerf_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from dfanerf_tpu.train.step import sample_pixel_coords


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = ExperimentConfig(
        train=TrainConfig(n_rand=256, lrate=5e-4),
        render=RenderConfig(n_samples=16),
    )
    ds = make_synthetic_dataset(n_frames=8, H=32, W=32, n_samples_gt=32)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    data = dataset_to_device(ds)
    step = make_train_step(cfg, ds)
    return cfg, ds, state, data, step


class TestTrainStep:
    def test_loss_decreases(self, tiny_setup):
        cfg, ds, state, data, step = tiny_setup
        key = jax.random.PRNGKey(1)
        losses = []
        for i in range(120):
            key, sub = jax.random.split(key)
            state, m = step(state, data, sub)
            losses.append(float(m["loss"]))
        first = np.mean(losses[:10])
        last = np.mean(losses[-10:])
        assert last < 0.6 * first, f"no convergence: {first:.4f} -> {last:.4f}"
        assert np.isfinite(losses).all()

    def test_grad_clip(self, tiny_setup):
        # grad_clip=0 (shipped default, matches the torch reference which
        # never clips) must be bit-identical to a huge clip that never
        # fires; a tiny clip must shrink the realized update and report
        # the PRE-clip norm in metrics so spike diagnostics stay visible.
        cfg, ds, state, data, _ = tiny_setup
        key = jax.random.PRNGKey(7)

        def one(clip):
            c = ExperimentConfig(
                train=TrainConfig(n_rand=256, lrate=5e-4, grad_clip=clip),
                render=RenderConfig(n_samples=16),
            )
            st = init_train_state(jax.random.PRNGKey(0), c)
            new, m = make_train_step(c, ds)(st, data, key)
            delta = jnp.sqrt(sum(
                jnp.sum((a - b) ** 2) for a, b in zip(
                    jax.tree.leaves(new["params"]),
                    jax.tree.leaves(st["params"]))))
            return new, m, float(delta)

        s_off, m_off, d_off = one(0.0)
        s_big, m_big, d_big = one(1e9)
        for a, b in zip(jax.tree.leaves(s_off["params"]),
                        jax.tree.leaves(s_big["params"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # pre-clip norm identical regardless of clip setting
        assert float(m_off["grad_norm"]) == float(m_big["grad_norm"])
        tiny = 1e-3 * float(m_off["grad_norm"])
        s_tiny, m_tiny, d_tiny = one(tiny)
        assert float(m_tiny["grad_norm"]) == pytest.approx(
            float(m_off["grad_norm"]), rel=1e-6)
        assert d_tiny < d_off

    def test_staged_gating(self, tiny_setup):
        cfg, ds, state, data, step = tiny_setup
        # before nosmo_iters/noexp_iters the attention and expression nets
        # must stay at their initial values while decoder/audnet move
        s0 = init_train_state(jax.random.PRNGKey(0), cfg)
        s1, _ = step(s0, data, jax.random.PRNGKey(2))

        def maxdiff(a, b):
            return max(
                jax.tree.leaves(
                    jax.tree.map(lambda x, y: float(jnp.abs(x - y).max()), a, b)
                )
            )

        assert maxdiff(s0["params"]["audattnet"], s1["params"]["audattnet"]) == 0.0
        assert maxdiff(s0["params"]["poseattnet"], s1["params"]["poseattnet"]) == 0.0
        assert maxdiff(s0["params"]["expnet"], s1["params"]["expnet"]) == 0.0
        assert maxdiff(s0["params"]["decoder"], s1["params"]["decoder"]) > 0.0
        assert maxdiff(s0["params"]["audnet"], s1["params"]["audnet"]) > 0.0
        # past the thresholds, the gated nets move too
        s_late = dict(s0)
        s_late["step"] = jnp.asarray(cfg.signal.noexp_iters + 1, jnp.int32)
        s2, _ = step(s_late, data, jax.random.PRNGKey(2))
        assert maxdiff(s0["params"]["audattnet"], s2["params"]["audattnet"]) > 0.0
        assert maxdiff(s0["params"]["expnet"], s2["params"]["expnet"]) > 0.0

    def test_z_latents_never_move(self, tiny_setup):
        cfg, ds, state, data, step = tiny_setup
        s0 = init_train_state(jax.random.PRNGKey(0), cfg)
        s1, _ = step(s0, data, jax.random.PRNGKey(3))
        assert float(jnp.abs(s0["z_shape"] - s1["z_shape"]).max()) == 0.0
        assert float(jnp.abs(s0["z_app"] - s1["z_app"]).max()) == 0.0

    def test_checkpoint_roundtrip(self, tiny_setup, tmp_path):
        cfg, ds, state, data, step = tiny_setup
        s1, _ = step(state, data, jax.random.PRNGKey(4))
        p = str(tmp_path / "000001.npz")
        save_checkpoint(p, s1)
        template = init_train_state(jax.random.PRNGKey(9), cfg)
        s2 = load_checkpoint(p, template)
        diffs = jax.tree.map(
            lambda a, b: float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max()), s1, s2
        )
        assert max(jax.tree.leaves(diffs)) == 0.0


class TestPixelSampling:
    def test_uniform_no_replacement(self):
        coords = sample_pixel_coords(
            jax.random.PRNGKey(0), 32, 32, 256, 0.0, jnp.zeros(4, jnp.int32)
        )
        flat = np.asarray(coords[:, 0] * 32 + coords[:, 1])
        assert len(np.unique(flat)) == 256  # without replacement
        assert coords.shape == (256, 2)
        assert int(coords.max()) < 32 and int(coords.min()) >= 0

    def test_rect_biased(self):
        H = W = 64
        rect = jnp.array([8, 8, 16, 16], jnp.int32)  # rows 8..24, cols 8..24
        coords = np.asarray(
            sample_pixel_coords(jax.random.PRNGKey(1), H, W, 512, 0.95, rect)
        )
        ys, xs = coords[:, 0], coords[:, 1]
        in_rect = (
            (ys >= 8) & (ys <= 24) & (xs >= 8) & (xs <= 24)
        ) | (ys >= H // 2)
        n_in = int(in_rect[: int(512 * 0.95)].sum())
        assert n_in == int(512 * 0.95)  # first block all inside the region
        assert not in_rect[int(512 * 0.95):].any()  # rest all outside


class TestSignals:
    def test_window_gather_zero_padding(self):
        from dfanerf_tpu.train.signals import window_gather

        arr = jnp.arange(20, dtype=jnp.float32).reshape(10, 2) + 1.0
        w = window_gather(arr, jnp.int32(0), 4, jnp.int32(10))
        # window [-2, 2): first two rows zero-padded
        assert float(jnp.abs(w[:2]).max()) == 0.0
        np.testing.assert_allclose(np.asarray(w[2]), np.asarray(arr[0]))
        # right boundary honors n_valid (reference passes len(i_train))
        w = window_gather(arr, jnp.int32(7), 4, jnp.int32(8))
        assert float(jnp.abs(w[-1]).max()) == 0.0  # index 8 >= n_valid


class TestDeepSpeechAudioPath:
    def test_train_step_with_deepspeech_windows(self):
        """--aud_file aud.npy configuration: [N,16,29] windows through the
        strided-CNN AudioNet (dim_aud 64) + ExpressionEnc (32) -> 96-dim
        signal, same decoder."""
        import dataclasses

        from dfanerf_tpu.config import ExperimentConfig, RenderConfig, SignalConfig, TrainConfig

        cfg = ExperimentConfig(
            train=TrainConfig(n_rand=128),
            render=RenderConfig(n_samples=8),
            signal=SignalConfig(audio_net="deepspeech"),
        )
        ds = make_synthetic_dataset(n_frames=8, H=24, W=24, n_samples_gt=16)
        # replace wav2exp features with DeepSpeech-shaped windows
        rng = np.random.RandomState(0)
        ds = dataclasses.replace(
            ds, auds=rng.randn(ds.n_frames, 16, 29).astype(np.float32)
        )
        state = init_train_state(jax.random.PRNGKey(0), cfg)
        data = dataset_to_device(ds)
        step = make_train_step(cfg, ds)
        key = jax.random.PRNGKey(1)
        losses = []
        for _ in range(30):
            key, sub = jax.random.split(key)
            state, m = step(state, data, sub)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
