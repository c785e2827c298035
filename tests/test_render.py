"""Renderer tests: tiled full-frame renderer consistency and the
background-concat semantics."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dfanerf_tpu.config import ExperimentConfig, RenderConfig, TrainConfig
from dfanerf_tpu.data import make_synthetic_dataset
from dfanerf_tpu.render.fields import render_ray_batch
from dfanerf_tpu.render.renderer import make_frame_renderer, render_video_frames
from dfanerf_tpu.train import dataset_to_device, init_train_state


@pytest.fixture(scope="module")
def setup():
    cfg = ExperimentConfig(
        train=TrainConfig(n_rand=128),
        render=RenderConfig(n_samples=16, tile_rays=128),
    )
    ds = make_synthetic_dataset(n_frames=6, H=24, W=24, n_samples_gt=32)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    data = dataset_to_device(ds)
    return cfg, ds, state, data


class TestFrameRenderer:
    def test_tiling_invariance(self, setup):
        """Same frame rendered with different tile sizes must be identical —
        tiling is an execution detail, not a semantic one."""
        cfg, ds, state, data = setup
        import dataclasses

        sig = jnp.zeros((cfg.decoder.dim_signal,))
        sig_t = jnp.zeros((cfg.decoder.dim_et_embed,))
        outs = []
        for tile in (64, 97, 576):  # divides, ragged, full-frame
            cfg_t = dataclasses.replace(
                cfg, render=dataclasses.replace(cfg.render, tile_rays=tile)
            )
            render = make_frame_renderer(cfg_t, ds.hwfcxy, ds.near, ds.far)
            h, c = render(
                state["params"], state["z_shape"], state["z_app"],
                data["poses"][0], data["poses"][0], sig, sig_t, data["bc_img"],
            )
            outs.append((np.asarray(h), np.asarray(c)))
        for h, c in outs[1:]:
            np.testing.assert_allclose(h, outs[0][0], atol=1e-5)
            np.testing.assert_allclose(c, outs[0][1], atol=1e-5)

    def test_background_shows_through_empty_field(self, setup):
        """With near-zero densities everywhere, the background-concat trick
        must make the composite equal the background (the reference's +1e-6
        bump guarantees the bg sample is reachable)."""
        cfg, ds, state, data = setup
        # zero out the decoder so sigma ~ bias only; force sigma bias very low
        params = jax.tree.map(jnp.zeros_like, state["params"])
        params["decoder"]["sigma_out"]["b"] = jnp.full((1,), -100.0)
        render = make_frame_renderer(cfg, ds.hwfcxy, ds.near, ds.far)
        sig = jnp.zeros((cfg.decoder.dim_signal,))
        sig_t = jnp.zeros((cfg.decoder.dim_et_embed,))
        h, c = render(
            params, state["z_shape"], state["z_app"],
            data["poses"][0], data["poses"][0], sig, sig_t, data["bc_img"],
        )
        bc = np.asarray(data["bc_img"]).astype(np.float32) / 255.0
        np.testing.assert_allclose(np.asarray(h), bc, atol=2e-3)

    def test_video_frames(self, setup):
        cfg, ds, state, data = setup
        frames, frames_head = render_video_frames(
            state, data, cfg, ds.hwfcxy, ds.near, ds.far, [0, 1],
            use_smoothing=False,
        )
        assert frames.shape == (2, 24, 24, 3) and frames.dtype == np.uint8
        assert frames_head.shape == (2, 24, 24, 3)

    def test_synthetic_gt_probes(self, setup):
        """The synthetic ground truth must show the audio-driven scene:
        frames differ with audio state, background visible at corners."""
        cfg, ds, state, data = setup
        imgs = ds.imgs_head.astype(np.float32)
        assert np.abs(imgs[0] - imgs[3]).max() > 5.0  # audio modulation visible
        corner = imgs[0, 0, 0] / 255.0
        bc = ds.bc_img[0, 0].astype(np.float32) / 255.0
        assert np.abs(corner - bc).max() < 0.05  # corner ray = background


class TestHierarchicalRenderer:
    def test_head_coarse_fine_frame(self, setup):
        import dataclasses

        cfg, ds, state, data = setup
        cfg2 = dataclasses.replace(
            cfg, render=dataclasses.replace(
                cfg.render, n_importance=16, tile_rays=128
            )
        )
        from dfanerf_tpu.render.renderer import make_head_hierarchical_renderer

        render = make_head_hierarchical_renderer(cfg2, ds.hwfcxy, ds.near, ds.far)
        sig = jnp.zeros((cfg.decoder.dim_signal,))
        out = render(state["params"], state["z_shape"], state["z_app"],
                     data["poses"][0], sig, data["bc_img"])
        assert out.shape == (24, 24, 3)
        assert bool(jnp.isfinite(out).all())


class TestHierPairRenderer:
    def test_pair_compacted_matches_predicated_fused(self, setup,
                                                     monkeypatch):
        """The pair-compacted hierarchical serving renderer
        (_make_hier_pair_renderer) matches the predicated fused path on
        the same flags/weights within the occupancy-skip error bound."""
        monkeypatch.setenv("DFANERF_PALLAS_INTERPRET", "1")
        import dataclasses

        cfg, ds, state, data = setup
        from dfanerf_tpu.render.renderer import make_head_hierarchical_renderer

        kw = dict(n_samples=16, n_importance=16, use_fused_kernel=True,
                  occ_sigma_thresh=0.05, occ_grid_res=16, ert_eps=0.0)
        cfg_pred = dataclasses.replace(
            cfg, render=dataclasses.replace(cfg.render, **kw))
        cfg_pair = dataclasses.replace(
            cfg, render=dataclasses.replace(
                cfg.render, **kw, occ_pair_compaction=True))
        sig = jnp.zeros((cfg.decoder.dim_signal,))
        r_pred = make_head_hierarchical_renderer(cfg_pred, ds.hwfcxy,
                                                 ds.near, ds.far)
        r_pair = make_head_hierarchical_renderer(cfg_pair, ds.hwfcxy,
                                                 ds.near, ds.far)
        a = np.asarray(r_pred(state["params"], state["z_shape"],
                              state["z_app"], data["poses"][0], sig,
                              data["bc_img"]))
        b = np.asarray(r_pair(state["params"], state["z_shape"],
                              state["z_app"], data["poses"][0], sig,
                              data["bc_img"]))
        assert a.shape == b.shape == (24, 24, 3)
        assert np.isfinite(b).all()
        assert np.abs(a - b).max() < 0.02

    def test_refresh_carry_staleness_bounded(self, setup, monkeypatch):
        """With occ_refresh_every > 1 the hier renderer carries the
        host-synced pair lists between refreshes (zero per-frame syncs);
        frames inside the window must stay close to a per-frame-refresh
        render of the same pose/signal, and the cadence must re-sync."""
        monkeypatch.setenv("DFANERF_PALLAS_INTERPRET", "1")
        import dataclasses

        cfg, ds, state, data = setup
        from dfanerf_tpu.render.renderer import (
            make_head_hierarchical_renderer,
        )

        kw = dict(n_samples=16, n_importance=16, use_fused_kernel=True,
                  occ_sigma_thresh=0.05, occ_grid_res=16, ert_eps=0.0,
                  occ_pair_compaction=True)
        cfg_fresh = dataclasses.replace(
            cfg, render=dataclasses.replace(cfg.render, **kw))
        cfg_carry = dataclasses.replace(
            cfg, render=dataclasses.replace(cfg.render, **kw,
                                            occ_refresh_every=3))
        sig = jnp.zeros((cfg.decoder.dim_signal,))
        r_carry = make_head_hierarchical_renderer(cfg_carry, ds.hwfcxy,
                                                  ds.near, ds.far)

        def frame(r, i):
            return np.asarray(r(state["params"], state["z_shape"],
                                state["z_app"], data["poses"][i % 4],
                                sig, data["bc_img"]))

        for i in range(5):  # spans a refresh boundary at i=3
            # per-frame-refresh oracle: fresh renderer each frame
            r_fresh = make_head_hierarchical_renderer(
                cfg_fresh, ds.hwfcxy, ds.near, ds.far)
            a = frame(r_fresh, i)
            b = frame(r_carry, i)
            assert np.isfinite(b).all(), i
            # staleness-bounded: carried lists only DROP pairs the fresh
            # importance march would keep; small pose motion keeps it tight
            assert np.abs(a - b).max() < 0.05, (i, np.abs(a - b).max())
