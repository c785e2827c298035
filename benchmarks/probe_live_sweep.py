"""Live-mode serving sweep on the cached trained state: find the config
that holds the paced realized error <= 0.0123 at >= 30 fps.

The round-4/5 postmortem: the live error (0.0336) is driven by the PRUNE
under staleness — first-order color-budget keys underestimate mid-alpha
pairs ~4x, and the live path cannot verify-and-revert. Sweeps the prune
budget / key mode / refresh cadence / pack2 against BOTH the fps bench
and the paced-protocol realized error.

    DFANERF_STATE_CACHE=/root/repo/.devcache/trained_state \
        python benchmarks/probe_live_sweep.py [variant ...]
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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from serve_trained import (  # noqa: E402
    H, W, bench_fps, make_frame_fn, paced_live_protocol,
)
from dfanerf_tpu.config import (  # noqa: E402
    ExperimentConfig, RenderConfig, TrainConfig,
)
from dfanerf_tpu.models.decoder import DecoderConfig  # noqa: E402
from dfanerf_tpu.data import make_synthetic_dataset  # noqa: E402
from dfanerf_tpu.train import (  # noqa: E402
    dataset_to_device, init_train_state,
)
from dfanerf_tpu.train.checkpoint import load_checkpoint  # noqa: E402


def main(only=()):
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

    print("noskip refs...", file=sys.stderr, flush=True)
    frame0 = make_frame_fn(cfg0, ds, state, data)
    ref_dev = [frame0(i) for i in range(8)]
    jax.block_until_ready(ref_dev[-1])

    # the serve_trained cfg2 live base
    live = RenderConfig(
        **base, ert_eps=1e-4, spatial_tiles=True, occ_sigma_thresh=2.0,
        occ_grid_res=96, occ_refresh_every=3, occ_pair_compaction=True,
        occ_prune_contrib=0.0, occ_prune_budget=2e-3, occ_budget_color=True,
        occ_budget_iters=2, occ_prune_trans=0.1, far_skip_tol=2e-3,
        far_subsample=8, occ_prune_carry=0, occ_async_refresh=True,
        occ_prune_hist_decay=0.8, occ_live_keys=True,
    )
    variants = {
        "base": live,
        "b5e-4": dataclasses.replace(live, occ_prune_budget=5e-4),
        "b1e-3": dataclasses.replace(live, occ_prune_budget=1e-3),
        "mass2e-3": dataclasses.replace(live, occ_budget_color=False),
        "ref4": dataclasses.replace(live, occ_refresh_every=4),
        "noprune": dataclasses.replace(live, occ_prune_budget=0.0,
                                       occ_prune_trans=0.0),
    }
    out = {}
    for name, rc in variants.items():
        if only and name not in only:
            continue
        print(f"variant {name}...", file=sys.stderr, flush=True)
        t0 = time.time()
        cfg = ExperimentConfig(decoder=dec, render=rc, train=cfg0.train)
        fr = make_frame_fn(cfg, ds, state, data)
        fps, fps_max = bench_fps(fr, warm=17)
        swaps0 = getattr(fr.render, "cache", {}).get("swaps", 0)
        errs, misses = paced_live_protocol(fr, ref_dev)
        swaps = getattr(fr.render, "cache", {}).get("swaps", 0) - swaps0
        out[name] = dict(
            fps=round(fps, 2), fps_max=round(fps_max, 2),
            max_err=round(max(errs), 5),
            max_err_last2win=round(max(errs[-16:]), 5),
            misses=misses, swaps_in_paced=swaps,
            errs=[round(e, 5) for e in errs],
            wall_s=round(time.time() - t0, 1),
        )
        print(f"  {name}: {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main(tuple(sys.argv[1:]))
