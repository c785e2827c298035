"""BASELINE config 2: Obama-style head NeRF, hierarchical coarse+fine
(64 + 128 samples), full 450x450 render — fps on one chip.

    python benchmarks/hierarchical.py
"""

import dataclasses
import json
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from dfanerf_tpu.config import ExperimentConfig, RenderConfig
from dfanerf_tpu.data import make_synthetic_dataset
from dfanerf_tpu.render.renderer import (
    encode_frame_signals,
    make_head_hierarchical_renderer,
)
from dfanerf_tpu.train import dataset_to_device, init_train_state


def main(use_fused=True):
    H = W = 450
    cfg = ExperimentConfig(
        render=RenderConfig(n_samples=64, n_importance=128, tile_rays=2048,
                            compute_dtype="bfloat16",
                            use_fused_kernel=use_fused, ert_eps=1e-4),
    )
    ds = make_synthetic_dataset(n_frames=4, H=H, W=W, n_samples_gt=8)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    data = dataset_to_device(ds)
    render = make_head_hierarchical_renderer(cfg, ds.hwfcxy, ds.near, ds.far)
    sig_fn = jax.jit(
        lambda p, i: encode_frame_signals(
            p, data["auds"], data["exps"], data["poses"], i,
            data["auds"].shape[0], cfg, True,
        )
    )

    def frame(i):
        sig, _ = sig_fn(state["params"], jnp.int32(i % ds.n_frames))
        return render(state["params"], state["z_shape"], state["z_app"],
                      data["poses"][i % ds.n_frames], sig, data["bc_img"])

    frame(0).block_until_ready()
    n = 10
    t0 = time.time()
    for i in range(n):
        out = frame(i)
    out.block_until_ready()
    fps = n / (time.time() - t0)
    print(json.dumps({
        "metric": "450p head-NeRF hierarchical 64+128 render",
        "value": round(fps, 3),
        "unit": "fps",
        "extra": {"fused_fine_pass": use_fused},
    }))


if __name__ == "__main__":
    import sys

    main(use_fused="--xla" not in sys.argv)
