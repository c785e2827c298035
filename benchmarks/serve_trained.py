"""Serving benchmark on a TRAINED model (BASELINE configs 3/4 flavor).

Trains the built-in synthetic audio-driven scene at 450p for a few minutes
on-chip (55 steps/s), then measures fused-kernel rendering fps with the
serving options (ERT; optionally occupancy + spatial tiles). This is the
honest counterpart to bench.py's random-weight number: skip mechanisms only
pay on converged fields.

    python benchmarks/serve_trained.py [n_train_steps] [occ_thresh]
"""

import dataclasses
import json
import sys
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from dfanerf_tpu.config import ExperimentConfig, RenderConfig, TrainConfig
from dfanerf_tpu.data import make_synthetic_dataset
from dfanerf_tpu.render.renderer import encode_frame_signals, make_frame_renderer
from dfanerf_tpu.train import dataset_to_device, init_train_state, make_train_step


def main(n_train=2000, occ_thresh=0.0):
    H = W = 450
    cfg = ExperimentConfig(
        render=RenderConfig(n_samples=64, use_fused_kernel=True,
                            compute_dtype="bfloat16", ert_eps=1e-4,
                            occ_sigma_thresh=occ_thresh,
                            spatial_tiles=occ_thresh > 0),
        train=TrainConfig(n_rand=2048),
    )
    ds = make_synthetic_dataset(n_frames=8, H=H, W=W, n_samples_gt=64)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    data = dataset_to_device(ds)
    step = make_train_step(cfg, ds)
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for i in range(n_train):
        key, sub = jax.random.split(key)
        state, m = step(state, data, sub)
    jax.block_until_ready(m["loss"])
    train_s = time.time() - t0
    psnr = float(m["psnr_com"])

    render = make_frame_renderer(cfg, ds.hwfcxy, ds.near, ds.far)
    sig_fn = jax.jit(
        lambda p, i: encode_frame_signals(
            p, data["auds"], data["exps"], data["poses"], i,
            data["auds"].shape[0], cfg, True,
        )
    )

    def frame(i):
        sig, sig_t = sig_fn(state["params"], jnp.int32(i % ds.n_frames))
        return render(
            state["params"], state["z_shape"], state["z_app"],
            data["poses"][i % ds.n_frames], data["poses"][0],
            sig, sig_t, data["bc_img"],
        )[1]

    frame(0).block_until_ready()
    n = 20
    t0 = time.time()
    for i in range(n):
        out = frame(i)
    out.block_until_ready()
    fps = n / (time.time() - t0)
    print(json.dumps({
        "metric": "450p trained-model serving fps (fused kernel, ERT)",
        "value": round(fps, 3),
        "unit": "fps",
        "extra": {
            "train_steps": n_train,
            "train_seconds": round(train_s, 1),
            "train_psnr_com": round(psnr, 2),
            "occ_sigma_thresh": occ_thresh,
        },
    }))


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 2000,
        float(sys.argv[2]) if len(sys.argv) > 2 else 0.0,
    )
