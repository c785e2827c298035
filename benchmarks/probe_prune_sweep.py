"""Serving prune-lever sweep on the cached trained state: occ_prune_trans
(drop pairs behind saturated opacity — the torso-behind-head / interior
eater) x occ_prune_contrib, offline per-slot mode, sp8 kernels.

    DFANERF_STATE_CACHE=... python benchmarks/probe_prune_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from dfanerf_tpu.config import ExperimentConfig, RenderConfig, TrainConfig
from dfanerf_tpu.models.decoder import DecoderConfig
from dfanerf_tpu.data import make_synthetic_dataset
from dfanerf_tpu.train import dataset_to_device, init_train_state
from dfanerf_tpu.train.checkpoint import load_checkpoint

from serve_trained import H, W, bench_fps, make_frame_fn  # noqa: E402


def main():
    cache_path = os.environ.get(
        "DFANERF_STATE_CACHE", "/root/repo/.devcache/state450.ckpt")
    dec = DecoderConfig(density_activation="softplus")
    base = dict(n_samples=64, use_fused_kernel=True,
                compute_dtype="bfloat16")
    cfg0 = ExperimentConfig(
        decoder=dec, render=RenderConfig(**base, ert_eps=0.0),
        train=TrainConfig(n_rand=2048),
    )
    ds = make_synthetic_dataset(n_frames=8, H=H, W=W, n_samples_gt=64)
    state = init_train_state(jax.random.PRNGKey(0), cfg0)
    state = load_checkpoint(cache_path, state)
    data = dataset_to_device(ds)

    frame0 = make_frame_fn(cfg0, ds, state, data)
    frame0(0).block_until_ready()
    ref = [frame0(i) for i in range(8)]

    grid = [(0.0, 6e-3, 0.0), (1e-2, 6e-3, 0.0), (2e-2, 6e-3, 0.0),
            (3e-2, 6e-3, 0.0), (5e-2, 6e-3, 0.0), (1e-1, 6e-3, 0.0)]
    env_grid = os.environ.get("DFANERF_PRUNE_GRID", "")
    if env_grid:  # "t:c[:b[:fss[:color01]]],..." (b = occ_prune_budget)
        grid = [tuple(float(v)
                      for v in (pt.split(":") + ["0", "8", "0"])[:5])
                for pt in env_grid.split(",")]
    else:
        grid = [g + (8, 0) for g in grid]
    for trans, contrib, budget, fss, color in grid:
        cfg = ExperimentConfig(
            decoder=dec,
            render=RenderConfig(**base, ert_eps=1e-4, spatial_tiles=True,
                                occ_sigma_thresh=2.0, occ_grid_res=96,
                                occ_refresh_every=8,
                                occ_pair_compaction=True,
                                occ_prune_trans=trans,
                                occ_prune_contrib=contrib,
                                occ_prune_budget=budget,
                                occ_budget_color=bool(color),
                                occ_budget_iters=int(os.environ.get(
                                    "DFANERF_BUDGET_ITERS", "1")),
                                far_skip_tol=2e-3, far_subsample=int(fss),
                                occ_prune_carry=3),
            train=cfg0.train,
        )
        frame = make_frame_fn(cfg, ds, state, data, per_slot=True)
        frame.render(
            state["params"], state["z_shape"], state["z_app"],
            data["poses"][0], data["poses"][0],
            *frame.sig_fn(state["params"], jnp.int32(0)), data["bc_img"],
        )[1].block_until_ready()
        t0 = time.time()
        window = [frame.render.inputs_fn(
            state["params"], state["z_shape"], state["z_app"],
            data["poses"][i], data["poses"][0],
            *frame.sig_fn(state["params"], jnp.int32(i)), data["bc_img"],
        ) for i in range(ds.n_frames)]
        frame.render.refresh_union(window, per_slot=True)
        prep_s = time.time() - t0
        fps, fps_max = bench_fps(frame, warm=9)
        errs = [float(jnp.abs(frame(i) - ref[i]).max()) for i in range(8)]
        print(f"trans={trans:g} contrib={contrib:g} budget={budget:g} "
              f"fss={int(fss)} color={int(color)}: "
              f"{fps:.2f} fps (max {fps_max:.2f}) "
              f"prep {prep_s:.1f}s err {max(errs):.4f}", flush=True)


if __name__ == "__main__":
    main()
