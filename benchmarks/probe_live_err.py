"""Decompose the live-mode serving error (BENCH_r04: 0.0336 vs the
0.0123 round-3 bound) into its sources, on the cached trained state.

Variants (all on the SAME weights, same 8-frame window as serve_trained):
  r4        - async refresh every 4, carry 3, color-budget prune 2e-3
              (the BENCH_r04 live config)
  sync4     - same but synchronous refresh (isolates async swap latency)
  noprune   - async, prune fully off (isolates conservative-flag staleness)
  carry0    - async, carry 0 (full prune re-derive at every refresh)
  sync1     - synchronous refresh every frame (staleness floor)

    DFANERF_STATE_CACHE=/root/repo/.devcache/state450.ckpt \
        python benchmarks/probe_live_err.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from benchmarks.serve_trained import H, W, make_frame_fn, bench_fps
from dfanerf_tpu.config import ExperimentConfig, RenderConfig, TrainConfig
from dfanerf_tpu.models.decoder import DecoderConfig
from dfanerf_tpu.data import make_synthetic_dataset
from dfanerf_tpu.train import dataset_to_device, init_train_state
from dfanerf_tpu.train.checkpoint import load_checkpoint


def main():
    base = dict(n_samples=64, use_fused_kernel=True,
                compute_dtype="bfloat16")
    dec = DecoderConfig(density_activation="softplus")
    cfg0 = ExperimentConfig(
        decoder=dec, render=RenderConfig(**base, ert_eps=0.0),
        train=TrainConfig(n_rand=2048),
    )
    ds = make_synthetic_dataset(n_frames=8, H=H, W=W, n_samples_gt=64)
    state = init_train_state(jax.random.PRNGKey(0), cfg0)
    state = load_checkpoint(os.environ["DFANERF_STATE_CACHE"], state)
    data = dataset_to_device(ds)

    print("noskip baseline...", file=sys.stderr, flush=True)
    frame0 = make_frame_fn(cfg0, ds, state, data)
    ref = [np.asarray(frame0(i)) for i in range(8)]

    r4 = RenderConfig(
        **base, ert_eps=1e-4, spatial_tiles=True, occ_sigma_thresh=2.0,
        occ_grid_res=96, occ_refresh_every=4, occ_pair_compaction=True,
        occ_prune_contrib=0.0, occ_prune_budget=2e-3, occ_budget_color=True,
        occ_budget_iters=2, occ_prune_trans=0.1, far_skip_tol=2e-3,
        far_subsample=8, occ_prune_carry=3, occ_async_refresh=True,
    )
    variants = {
        "r4": r4,
        "sync4": dataclasses.replace(r4, occ_async_refresh=False),
        "noprune": dataclasses.replace(r4, occ_prune_budget=0.0,
                                       occ_prune_trans=0.0),
        "carry0": dataclasses.replace(r4, occ_prune_carry=0),
        "sync1": dataclasses.replace(r4, occ_async_refresh=False,
                                     occ_refresh_every=1),
    }
    out = {}
    for name, rc in variants.items():
        print(f"variant {name}...", file=sys.stderr, flush=True)
        cfg = ExperimentConfig(decoder=dec, render=rc, train=cfg0.train)
        fr = make_frame_fn(cfg, ds, state, data)
        t0 = time.time()
        fps, fps_max = bench_fps(fr, warm=17)
        errs = [float(np.abs(np.asarray(fr(i)) - ref[i]).max())
                for i in range(8)]
        out[name] = dict(fps=round(fps, 2), fps_max=round(fps_max, 2),
                         max_err=round(max(errs), 5),
                         errs=[round(e, 5) for e in errs],
                         wall_s=round(time.time() - t0, 1))
        print(f"  {name}: {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
