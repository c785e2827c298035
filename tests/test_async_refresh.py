"""Async (double-buffered) live flag refresh: the pair-compaction serving
renderer with occ_async_refresh must keep serving frames under stale flags
while a worker thread builds the next flag state, then swap it in without
a correctness break (renderer.py _refresh_async/_poll_worker).

Runs the real pair-compaction path on CPU via the Pallas interpret mode
(DFANERF_PALLAS_INTERPRET, resolved at call time in ops/fused_render)."""

import dataclasses
import time

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dfanerf_tpu.config import ExperimentConfig, RenderConfig, TrainConfig
from dfanerf_tpu.data import make_synthetic_dataset
from dfanerf_tpu.render.renderer import make_frame_renderer
from dfanerf_tpu.train import dataset_to_device, init_train_state


@pytest.fixture(scope="module")
def setup():
    cfg = ExperimentConfig(
        train=TrainConfig(n_rand=128),
        render=RenderConfig(n_samples=16, tile_rays=256),
    )
    ds = make_synthetic_dataset(n_frames=6, H=32, W=32, n_samples_gt=16)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    data = dataset_to_device(ds)
    return cfg, ds, state, data


def _render_cfg(cfg, **kw):
    return dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, **kw))


def _frames(render, state, data, sig, sig_t, n):
    outs = []
    for i in range(n):
        h, c = render(
            state["params"], state["z_shape"], state["z_app"],
            data["poses"][i % 6], data["poses"][0], sig, sig_t,
            data["bc_img"],
        )
        outs.append(np.asarray(c))
    return outs


class TestAsyncRefresh:
    def test_async_live_matches_sync_refresh(self, setup, monkeypatch):
        """The async renderer's frames stay within the skip-lever error
        bound of the no-skip fused render, the worker thread completes and
        swaps at least once, and the swapped flag state keeps serving."""
        monkeypatch.setenv("DFANERF_PALLAS_INTERPRET", "1")
        cfg0, ds, state, data = setup
        sig = jnp.zeros((cfg0.decoder.dim_signal,))
        sig_t = jnp.zeros((cfg0.decoder.dim_et_embed,))

        base = dict(n_samples=16, use_fused_kernel=True,
                    spatial_tiles=True, occ_sigma_thresh=0.05,
                    occ_grid_res=16, occ_refresh_every=2,
                    occ_pair_compaction=True, occ_prune_contrib=1e-4,
                    occ_prune_carry=1, ert_eps=0.0)
        cfg_noskip = _render_cfg(cfg0, n_samples=16, use_fused_kernel=True,
                                 spatial_tiles=True, ert_eps=0.0)
        ref = make_frame_renderer(cfg_noskip, ds.hwfcxy, ds.near, ds.far)
        ref_out = _frames(ref, state, data, sig, sig_t, 6)

        cfg_async = _render_cfg(cfg0, **base, occ_async_refresh=True)
        render = make_frame_renderer(cfg_async, ds.hwfcxy, ds.near, ds.far)
        outs = _frames(render, state, data, sig, sig_t, 6)
        # let the in-flight refresh land, then confirm the swap happened
        # and serving continues under the new state
        deadline = time.time() + 60.0
        swapped = False
        i = 0
        while time.time() < deadline:
            th = render.worker["thread"]
            if th is not None:
                th.join(timeout=60.0)
            before = render.cache["age"]
            h, c = render(
                state["params"], state["z_shape"], state["z_app"],
                data["poses"][i % 6], data["poses"][0], sig, sig_t,
                data["bc_img"],
            )
            outs.append(np.asarray(c))
            i += 1
            if render.cache["age"] <= before:
                swapped = True  # _poll_worker consumed a finished refresh
                break
        assert swapped, "async refresh never swapped a new flag state in"
        assert render.worker["error"] is None

        # a few more frames under the swapped state
        outs += _frames(render, state, data, sig, sig_t, 4)
        for j, o in enumerate(outs):
            assert np.isfinite(o).all()
            err = np.abs(o - ref_out[j % 6]).max()
            assert err < 0.05, f"frame {j}: async skip error {err}"

    def test_pack2_matches_noskip(self, setup, monkeypatch):
        """occ_pack2 (half-slab granularity, two pairs per kernel step,
        A/B buffer merge) serves frames within the skip-lever error bound
        of the no-skip fused render, through refreshes."""
        monkeypatch.setenv("DFANERF_PALLAS_INTERPRET", "1")
        cfg0, ds, state, data = setup
        sig = jnp.zeros((cfg0.decoder.dim_signal,))
        sig_t = jnp.zeros((cfg0.decoder.dim_et_embed,))
        cfg_noskip = _render_cfg(cfg0, n_samples=16, use_fused_kernel=True,
                                 spatial_tiles=True, ert_eps=0.0)
        ref = make_frame_renderer(cfg_noskip, ds.hwfcxy, ds.near, ds.far)
        ref_out = _frames(ref, state, data, sig, sig_t, 5)
        cfg_p2 = _render_cfg(
            cfg0, n_samples=16, use_fused_kernel=True, spatial_tiles=True,
            occ_sigma_thresh=0.05, occ_grid_res=16, occ_refresh_every=2,
            occ_pair_compaction=True, occ_pack2=True,
            occ_prune_contrib=1e-4, ert_eps=0.0)
        render = make_frame_renderer(cfg_p2, ds.hwfcxy, ds.near, ds.far)
        outs = _frames(render, state, data, sig, sig_t, 5)
        for j, o in enumerate(outs):
            assert np.isfinite(o).all()
            err = np.abs(o - ref_out[j]).max()
            assert err < 0.05, f"frame {j}: pack2 skip error {err}"

    def test_async_off_is_sync_path(self, setup, monkeypatch):
        """Without occ_async_refresh the renderer keeps the synchronous
        refresh semantics (age-gated, blocking) — guard that the async
        branch is opt-in."""
        monkeypatch.setenv("DFANERF_PALLAS_INTERPRET", "1")
        cfg0, ds, state, data = setup
        sig = jnp.zeros((cfg0.decoder.dim_signal,))
        sig_t = jnp.zeros((cfg0.decoder.dim_et_embed,))
        cfg_sync = _render_cfg(
            cfg0, n_samples=16, use_fused_kernel=True, spatial_tiles=True,
            occ_sigma_thresh=0.05, occ_grid_res=16, occ_refresh_every=2,
            occ_pair_compaction=True, ert_eps=0.0)
        render = make_frame_renderer(cfg_sync, ds.hwfcxy, ds.near, ds.far)
        _frames(render, state, data, sig, sig_t, 3)
        assert render.worker["thread"] is None


class TestPruneHistory:
    def test_hist_accumulates_and_jitter_rotates(self, setup, monkeypatch):
        """With occ_prune_hist_decay > 0 the async worker's budget-prune
        derives populate cache['hist'] with per-pair running maxima
        ([J, T] per field, [T, J] for the trans transmittances), and the
        refresh trigger's deterministic jitter counter cycles so the
        derive cadence cannot phase-lock against a periodic signal
        trajectory (renderer.py prune_flags hist / render rjit)."""
        monkeypatch.setenv("DFANERF_PALLAS_INTERPRET", "1")
        cfg0, ds, state, data = setup
        sig = jnp.zeros((cfg0.decoder.dim_signal,))
        sig_t = jnp.zeros((cfg0.decoder.dim_et_embed,))
        cfg = _render_cfg(
            cfg0, n_samples=16, use_fused_kernel=True, spatial_tiles=True,
            occ_sigma_thresh=0.05, occ_grid_res=16, occ_refresh_every=1,
            occ_pair_compaction=True, occ_prune_budget=1e-3,
            occ_prune_trans=0.01, occ_prune_carry=0, ert_eps=0.0,
            occ_async_refresh=True, occ_prune_hist_decay=0.8,
        )
        render = make_frame_renderer(cfg, ds.hwfcxy, ds.near, ds.far)
        jits = set()
        # serve frames, joining each worker so every refresh derives
        for i in range(10):
            render(
                state["params"], state["z_shape"], state["z_app"],
                data["poses"][i % 6], data["poses"][0], sig, sig_t,
                data["bc_img"],
            )
            th = render.worker["thread"]
            if th is not None:
                th.join(timeout=120.0)
            jits.add(render.cache.get("rjit", 0))
        assert render.worker["error"] is None
        hist = render.cache.get("hist")
        assert hist, "no history accumulated by the async derives"
        T = render.cache["occ"].shape[1]
        J = render.cache["occ"].shape[2]
        for k in ("wr_h", "wr_t"):
            assert hist[k].shape == (J, T)
            assert (hist[k] >= 0).all() and np.isfinite(hist[k]).all()
        assert hist["wr_h"].max() > 0  # something was measured
        for k in ("tm_h", "tm_c"):
            assert hist[k].shape == (T, J)
        # the jitter counter cycled through its values
        assert jits == {0, 1, 2}, f"jitter stuck: {jits}"


class TestClassClamp:
    def test_clamp_lands_on_executed_class(self, setup, monkeypatch):
        """occ_class_clamp: after precompile_headroom builds a dominating
        executed class, async refreshes whose drifted pair counts have no
        executed class of their own re-pad onto an executed one instead
        of compiling a new program (renderer.py _clamp_to_executed), and
        the padded state's frames stay within the skip-lever bound."""
        monkeypatch.setenv("DFANERF_PALLAS_INTERPRET", "1")
        cfg0, ds, state, data = setup
        sig = jnp.zeros((cfg0.decoder.dim_signal,))
        sig_t = jnp.zeros((cfg0.decoder.dim_et_embed,))
        cfg_noskip = _render_cfg(cfg0, n_samples=16, use_fused_kernel=True,
                                 spatial_tiles=True, ert_eps=0.0)
        ref = make_frame_renderer(cfg_noskip, ds.hwfcxy, ds.near, ds.far)
        cfg = _render_cfg(
            cfg0, n_samples=16, use_fused_kernel=True, spatial_tiles=True,
            occ_sigma_thresh=0.05, occ_grid_res=16, occ_refresh_every=1,
            occ_pair_compaction=True, occ_prune_budget=1e-3,
            occ_prune_trans=0.01, occ_prune_carry=0, ert_eps=0.0,
            occ_async_refresh=True, occ_class_clamp=True,
        )
        render = make_frame_renderer(cfg, ds.hwfcxy, ds.near, ds.far)
        _frames(render, state, data, sig, sig_t, 3)
        th = render.worker["thread"]
        if th is not None:
            th.join(timeout=120.0)
        hr = render.precompile_headroom(
            state["params"], state["z_shape"], state["z_app"],
            data["poses"][0], data["poses"][0], sig, sig_t,
            data["bc_img"])
        assert hr is not None and hr[3] is False

        def ck_of_cache():
            c = render.cache
            lists = (c["lists2"] if cfg.render.occ_pack2 else c["lists"])
            return (int(lists[0][0].shape[0]), int(lists[1][0].shape[0]),
                    int(c["tiles_sel"].shape[0]),
                    bool(c.get("far_skip", False)))

        executed = {ck_of_cache(), hr}
        # drive with a different signal so the occupied-pair counts move;
        # every landed refresh must still be an executed class
        sig2 = 0.5 * jnp.ones((cfg0.decoder.dim_signal,))
        outs = []
        for i in range(8):
            h, c = render(
                state["params"], state["z_shape"], state["z_app"],
                data["poses"][i % 6], data["poses"][0], sig2, sig_t,
                data["bc_img"],
            )
            outs.append(np.asarray(c))
            th = render.worker["thread"]
            if th is not None:
                th.join(timeout=120.0)
            ck = ck_of_cache()
            assert (ck in executed
                    or ck[0] > hr[0] or ck[1] > hr[1] or ck[2] > hr[2]), (
                f"refresh landed on unexecuted, clampable class {ck} "
                f"(executed: {executed})")
            executed.add(ck)  # a genuinely-bigger class compiles + runs
        assert render.worker["error"] is None
        ref_out = _frames(ref, state, data, sig2, sig_t, 6)
        for j, o in enumerate(outs[2:]):
            assert np.isfinite(o).all()
            err = np.abs(o - ref_out[(j + 2) % 6]).max()
            assert err < 0.05, f"frame {j + 2}: clamped-class error {err}"


class TestLiveKeys:
    def test_live_keys_derive_matches_noskip(self, setup, monkeypatch):
        """occ_live_keys: serving frames self-report prune keys, the
        async worker derives keep-masks from their running max with NO
        diagnostic render (renderer.py _derive_keeps_from_keys), and the
        served frames stay within the skip-lever error bound."""
        monkeypatch.setenv("DFANERF_PALLAS_INTERPRET", "1")
        cfg0, ds, state, data = setup
        sig = jnp.zeros((cfg0.decoder.dim_signal,))
        sig_t = jnp.zeros((cfg0.decoder.dim_et_embed,))
        cfg_noskip = _render_cfg(cfg0, n_samples=16, use_fused_kernel=True,
                                 spatial_tiles=True, ert_eps=0.0)
        ref = make_frame_renderer(cfg_noskip, ds.hwfcxy, ds.near, ds.far)
        ref_out = _frames(ref, state, data, sig, sig_t, 6)

        cfg = _render_cfg(
            cfg0, n_samples=16, use_fused_kernel=True, spatial_tiles=True,
            occ_sigma_thresh=0.05, occ_grid_res=16, occ_refresh_every=1,
            occ_pair_compaction=True, occ_prune_budget=1e-3,
            occ_budget_color=True, occ_prune_trans=0.01, occ_prune_carry=0,
            ert_eps=0.0, occ_async_refresh=True, occ_prune_hist_decay=0.8,
            occ_live_keys=True, occ_live_remeasure=3,
        )
        render = make_frame_renderer(cfg, ds.hwfcxy, ds.near, ds.far)
        outs = []
        keys_derives = 0
        for i in range(12):
            h, c = render(
                state["params"], state["z_shape"], state["z_app"],
                data["poses"][i % 6], data["poses"][0], sig, sig_t,
                data["bc_img"],
            )
            outs.append(np.asarray(c))
            th = render.worker["thread"]
            if th is not None:
                th.join(timeout=180.0)
        assert render.worker["error"] is None
        # keys were stashed by served frames and a keys-derive ran
        # (derive_ct advanced past the remeasure-0 full derive)
        assert len(render.cache.get("key_frames", ())) > 0
        assert render.cache.get("derive_ct", 0) >= 2
        assert render.cache.get("ever_measured") is not None
        hist = render.cache.get("hist", {})
        assert any(k in hist for k in ("ke_h", "ke_t"))
        for j, o in enumerate(outs):
            assert np.isfinite(o).all()
            err = np.abs(o - ref_out[j % 6]).max()
            assert err < 0.05, f"frame {j}: live-keys error {err}"
