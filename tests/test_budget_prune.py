"""Budgeted visibility pruning (RenderConfig.occ_prune_budget): the
refresh drops (tile, slab) pairs greedily while every ray's accumulated
dropped mass stays under the budget — a per-ray error bound the per-pair
contribution eps cannot give (renderer.py prune_flags, budget branch;
deferred_composite with_ray_diag).

Runs the real pair-compaction path on CPU via Pallas interpret mode."""

import dataclasses

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
    ds = make_synthetic_dataset(n_frames=4, H=32, W=32, n_samples_gt=16)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    data = dataset_to_device(ds)
    return cfg, ds, state, data


def _render_cfg(cfg, **kw):
    return dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, **kw))


def _make(cfg0, ds, **kw):
    cfg = _render_cfg(cfg0, n_samples=16, use_fused_kernel=True,
                      spatial_tiles=True, ert_eps=0.0, **kw)
    return make_frame_renderer(cfg, ds.hwfcxy, ds.near, ds.far)


def _frames(render, state, data, sig, sig_t, n):
    outs = []
    for i in range(n):
        h, c = render(
            state["params"], state["z_shape"], state["z_app"],
            data["poses"][i % 4], data["poses"][0], sig, sig_t,
            data["bc_img"],
        )
        outs.append(np.asarray(c))
    return outs


SKIP = dict(occ_sigma_thresh=0.05, occ_grid_res=16, occ_refresh_every=8,
            occ_pair_compaction=True, occ_prune_trans=0.0)


class TestBudgetGreedy:
    """Pure-numpy contracts of the greedy itself (renderer.py
    budget_drop_masks) — the fast-tier coverage; the rendering tests
    below are the slow-tier integration."""

    def _rand(self, seed, K=5, J=4, R=8):
        rng = np.random.default_rng(seed)
        wr_h = rng.uniform(0, 0.01, (J, K, R)).astype(np.float32)
        wr_t = rng.uniform(0, 0.01, (J, K, R)).astype(np.float32)
        cand = rng.random((2, K, J)) < 0.8
        return wr_h, wr_t, cand

    def test_dropped_mass_within_budget_per_ray(self):
        from dfanerf_tpu.render.renderer import budget_drop_masks

        wr_h, wr_t, cand = self._rand(0)
        for budget in (1e-4, 5e-3, 0.02):
            drop = budget_drop_masks(wr_h, wr_t, cand, budget)
            assert not (drop & ~cand).any(), "dropped a non-candidate"
            W = np.concatenate([wr_h.transpose(1, 2, 0),
                                wr_t.transpose(1, 2, 0)], axis=2)
            d = drop.transpose(1, 0, 2).reshape(drop.shape[1], -1)
            dropped_mass = (W * d[:, None, :]).sum(axis=2)  # [K, R]
            assert dropped_mass.max() <= budget + 1e-7

    def test_greedy_is_maximal_prefix(self):
        """No additional candidate with mass below every kept one could
        have been dropped: adding the smallest surviving candidate to the
        dropped set must break the budget on some ray of its tile."""
        from dfanerf_tpu.render.renderer import budget_drop_masks

        wr_h, wr_t, cand = self._rand(1)
        budget = 4e-3
        drop = budget_drop_masks(wr_h, wr_t, cand, budget)
        W = np.concatenate([wr_h.transpose(1, 2, 0),
                            wr_t.transpose(1, 2, 0)], axis=2)
        c = cand.transpose(1, 0, 2).reshape(W.shape[0], -1)
        d = drop.transpose(1, 0, 2).reshape(W.shape[0], -1)
        for k in range(W.shape[0]):
            surv = np.where(c[k] & ~d[k])[0]
            if not len(surv):
                continue
            j = surv[np.argmin(W[k, :, surv].max(axis=1))]
            mask = d[k] | (np.arange(c.shape[1]) == j)
            worst = (W[k] * mask).sum(axis=1)  # per-ray dropped mass
            assert worst.max() > budget, f"tile {k}: greedy not maximal"

    def test_monotone_in_budget(self):
        from dfanerf_tpu.render.renderer import budget_drop_masks

        wr_h, wr_t, cand = self._rand(2)
        prev = None
        for budget in (1e-5, 1e-3, 1e-2, 1.0):
            drop = budget_drop_masks(wr_h, wr_t, cand, budget)
            if prev is not None:
                assert (prev <= drop).all(), "smaller budget dropped more"
            prev = drop
        # unbounded budget drops every candidate
        assert (prev == cand).all()


class TestColorBudgetKeys:
    """deferred_composite's ray_err_bc path (occ_budget_color): the
    color-aware per-pair drop-cost keys against brute-force pair drops."""

    def _setup(self, seed=0, J=4, sp=4, T=2, scale=3.0):
        from dfanerf_tpu.ops.fused_render import R_T

        rng = np.random.default_rng(seed)
        n = T * R_T
        S = J * sp

        def buf(c_const=None):
            sig = jnp.asarray(
                rng.uniform(0, scale, (J, sp, n)).astype(np.float32))
            rgb = [jnp.asarray(
                np.full((J, sp, n), c_const, np.float32) if c_const
                is not None else
                rng.uniform(0, 1, (J, sp, n)).astype(np.float32))
                for _ in range(3)]
            return (sig, *rgb)

        occ = jnp.ones((2, T, J), jnp.int32)
        rd = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
        rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        z = jnp.linspace(0.1, 1.1, S)
        bc = (jnp.full((n, 3), 0.5, jnp.float32) if seed == "const"
              else jnp.asarray(
                  rng.uniform(0, 1, (n, 3)).astype(np.float32)))
        return buf, occ, rd, z, bc

    def _composite(self, bh, bt, occ, rd, z, bc=None, sp=4):
        from dfanerf_tpu.ops.fused_render import deferred_composite

        return deferred_composite(bh, bt, occ, rd, rd, z, s_slab=sp,
                                  with_ray_diag=True, ray_err_bc=bc)

    def test_color_keys_never_exceed_mass_keys(self):
        buf, occ, rd, z, bc = self._setup(0)
        bh, bt = buf(), buf()
        *_, m_h, m_t = self._composite(bh, bt, occ, rd, z)
        *_, e_h, e_t = self._composite(bh, bt, occ, rd, z, bc=bc)
        # |col - m*cb| <= m * max(c, cb) <= m for colors in [0, 1]
        assert float((e_h - m_h).max()) <= 1e-5
        assert float((e_t - m_t).max()) <= 1e-5

    def test_uniform_color_scene_keys_are_zero(self):
        """Every sample and the bg share one color -> dropping any pair
        re-composites to the identical pixel -> color keys ~0 while the
        mass keys stay large."""
        buf, occ, rd, z, _ = self._setup(1)
        bh, bt = buf(c_const=0.5), buf(c_const=0.5)
        bc = jnp.full((rd.shape[0], 3), 0.5, jnp.float32)
        *_, m_h, m_t = self._composite(bh, bt, occ, rd, z)
        *_, e_h, e_t = self._composite(bh, bt, occ, rd, z, bc=bc)
        assert float(m_h.max()) > 0.05  # masses are substantial...
        assert float(e_h.max()) < 1e-5  # ...but the drop error is nil
        assert float(e_t.max()) < 1e-5

    def test_keys_track_brute_force_drop_error(self):
        """Dropping each single pair and re-compositing (incl. the bg
        epilogue): the realized max-ray |delta| must stay <= ~key + a
        second-order slack, and the key must not overshoot wildly."""
        buf, occ, rd, z, bc = self._setup(2, scale=1.0)
        bh, bt = buf(), buf()
        out = self._composite(bh, bt, occ, rd, z, bc=bc)
        ah0, ac0, th0, tc0 = out[:4]
        e_h, e_t = out[-2], out[-1]
        com0 = ac0 + tc0 * bc
        head0 = ah0 + th0 * bc
        occ_np = np.asarray(occ)
        T, J = occ_np.shape[1], occ_np.shape[2]
        worst_ratio = 0.0
        for f, ekeys in ((0, e_h), (1, e_t)):
            for t in range(T):
                for j in range(J):
                    o = occ_np.copy()
                    o[f, t, j] = 0
                    o2 = self._composite(bh, bt, jnp.asarray(o), rd, z,
                                         bc=bc)
                    com1 = o2[1] + o2[3] * bc
                    head1 = o2[0] + o2[2] * bc
                    d = np.maximum(
                        np.abs(np.asarray(com1 - com0)).max(-1),
                        np.abs(np.asarray(head1 - head0)).max(-1),
                    ).reshape(T, -1)[t].max()
                    key = float(ekeys[j, t].max())
                    if d > 1e-4:
                        worst_ratio = max(worst_ratio, d / (key + 1e-9))
        # first-order estimate: realized error within 2x of the key
        assert worst_ratio < 2.0, worst_ratio


class TestBudgetPrune:
    def test_error_bounded_by_budget(self, setup, monkeypatch):
        """Frames served under the budgeted prune stay within the budget
        (plus occupancy-flag staleness slack) of the no-skip render, and
        the refresh actually drops pairs."""
        monkeypatch.setenv("DFANERF_PALLAS_INTERPRET", "1")
        cfg0, ds, state, data = setup
        sig = jnp.zeros((cfg0.decoder.dim_signal,))
        sig_t = jnp.zeros((cfg0.decoder.dim_et_embed,))
        ref = _make(cfg0, ds)
        ref_out = _frames(ref, state, data, sig, sig_t, 4)

        budget = 0.02
        render = _make(cfg0, ds, **SKIP, occ_prune_budget=budget)
        outs = _frames(render, state, data, sig, sig_t, 4)
        unpruned = _make(cfg0, ds, **SKIP)
        _frames(unpruned, state, data, sig, sig_t, 1)
        n_unpruned = float(np.asarray(unpruned.cache["occ"]).sum())
        n_pruned = float(np.asarray(render.cache["occ"]).sum())
        assert n_pruned < n_unpruned, "budget prune dropped nothing"
        for j, o in enumerate(outs):
            assert np.isfinite(o).all()
            err = np.abs(o - ref_out[j]).max()
            # budget bounds the dropped mass per ray; the occupancy flags'
            # own skip error (shared with the unpruned config) adds slack
            assert err < budget + 0.02, f"frame {j}: budget prune err {err}"

    def test_budget_monotonic_in_pairs(self, setup, monkeypatch):
        """A larger budget never keeps more pairs (greedy prefix by
        ascending mass), and budget=0 disables the branch entirely."""
        monkeypatch.setenv("DFANERF_PALLAS_INTERPRET", "1")
        cfg0, ds, state, data = setup
        sig = jnp.zeros((cfg0.decoder.dim_signal,))
        sig_t = jnp.zeros((cfg0.decoder.dim_et_embed,))
        counts = {}
        for b in (0.0, 1e-4, 0.05):
            render = _make(cfg0, ds, **SKIP, occ_prune_budget=b)
            _frames(render, state, data, sig, sig_t, 1)
            counts[b] = float(np.asarray(render.cache["occ"]).sum())
        assert counts[0.05] <= counts[1e-4] <= counts[0.0]

    def test_budget_supersedes_contrib(self, setup, monkeypatch):
        """With both knobs set the budgeted branch wins (config contract:
        occ_prune_budget supersedes occ_prune_contrib)."""
        monkeypatch.setenv("DFANERF_PALLAS_INTERPRET", "1")
        cfg0, ds, state, data = setup
        sig = jnp.zeros((cfg0.decoder.dim_signal,))
        sig_t = jnp.zeros((cfg0.decoder.dim_et_embed,))
        both = _make(cfg0, ds, **SKIP, occ_prune_budget=0.01,
                     occ_prune_contrib=1e9)
        _frames(both, state, data, sig, sig_t, 1)
        solo = _make(cfg0, ds, **SKIP, occ_prune_budget=0.01)
        _frames(solo, state, data, sig, sig_t, 1)
        assert (float(np.asarray(both.cache["occ"]).sum())
                == float(np.asarray(solo.cache["occ"]).sum()))

    def test_per_slot_iterative_refinement(self, setup, monkeypatch):
        """refresh_union(per_slot=True) with occ_budget_iters=2 (the
        offline serving prep): round 2 drops at least as many pairs as
        round 1 alone, frames served under the refined per-slot flags
        stay error-bounded, and the color-key path runs end to end."""
        monkeypatch.setenv("DFANERF_PALLAS_INTERPRET", "1")
        cfg0, ds, state, data = setup
        sig = jnp.zeros((cfg0.decoder.dim_signal,))
        sig_t = jnp.zeros((cfg0.decoder.dim_et_embed,))
        ref = _make(cfg0, ds)
        ref_out = _frames(ref, state, data, sig, sig_t, 2)

        def prep(iters):
            render = _make(cfg0, ds, **SKIP, occ_prune_budget=0.01,
                           occ_budget_color=True, occ_budget_iters=iters)
            window = [render.inputs_fn(
                state["params"], state["z_shape"], state["z_app"],
                data["poses"][i], data["poses"][0], sig, sig_t,
                data["bc_img"],
            ) for i in range(2)]
            render.refresh_union(window, per_slot=True)
            return render

        r1, r2 = prep(1), prep(2)
        pairs1 = sum(float(np.asarray(s["occ"]).sum())
                     for s in r1.cache["slots"])
        pairs2 = sum(float(np.asarray(s["occ"]).sum())
                     for s in r2.cache["slots"])
        assert pairs2 <= pairs1, "round 2 un-dropped pairs"
        for i in range(2):
            out = np.asarray(r2(
                state["params"], state["z_shape"], state["z_app"],
                data["poses"][i], data["poses"][0], sig, sig_t,
                data["bc_img"], window_slot=i,
            )[1])
            assert np.isfinite(out).all()
            err = np.abs(out - ref_out[i]).max()
            assert err < 0.05, f"slot {i}: refined prune err {err}"
