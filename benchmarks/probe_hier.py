"""Hierarchical (BASELINE config 2) serving probe on the trained state:
pair-compacted vs predicated fused vs no-skip, with errors.

    DFANERF_STATE_CACHE=... python benchmarks/probe_hier.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from dfanerf_tpu.config import ExperimentConfig, RenderConfig, TrainConfig
from dfanerf_tpu.models.decoder import DecoderConfig
from dfanerf_tpu.data import make_synthetic_dataset
from dfanerf_tpu.render.renderer import (
    encode_frame_signals, make_frame_renderer,
    make_head_hierarchical_renderer,
)
from dfanerf_tpu.train import dataset_to_device, init_train_state
from dfanerf_tpu.train.checkpoint import load_checkpoint

H = W = 450


def main():
    cache_path = os.environ.get(
        "DFANERF_STATE_CACHE", "/root/repo/.cache/serve_state.ckpt")
    occ_thresh = float(os.environ.get("DFANERF_OCC_THRESH", "2.0"))
    grid = int(os.environ.get("DFANERF_OCC_GRID", "48"))
    dec = DecoderConfig(density_activation="softplus")
    cfg0 = ExperimentConfig(
        decoder=dec,
        render=RenderConfig(n_samples=64, use_fused_kernel=True,
                            compute_dtype="bfloat16"),
        train=TrainConfig(n_rand=2048),
    )
    ds = make_synthetic_dataset(n_frames=8, H=H, W=W, n_samples_gt=64)
    state = init_train_state(jax.random.PRNGKey(0), cfg0)
    state = load_checkpoint(cache_path, state)
    data = dataset_to_device(ds)
    sig_fn = jax.jit(
        lambda p, i: encode_frame_signals(
            p, data["auds"], data["exps"], data["poses"], i,
            data["auds"].shape[0], cfg0, True,
        )
    )

    refresh = int(os.environ.get("DFANERF_HIER_REFRESH", "1"))
    contrib = float(os.environ.get("DFANERF_HIER_CONTRIB", "3e-3"))
    trans = float(os.environ.get("DFANERF_HIER_TRANS", "1e-3"))

    def make(thresh, ert, pairs):
        cfg = ExperimentConfig(
            decoder=dec,
            render=RenderConfig(
                n_samples=64, n_importance=128, compute_dtype="bfloat16",
                use_fused_kernel=True, ert_eps=ert,
                occ_sigma_thresh=thresh, occ_grid_res=grid,
                occ_pair_compaction=pairs,
                occ_refresh_every=refresh if pairs else 1,
                occ_prune_trans=trans,
                occ_prune_contrib=contrib if pairs else 0.0,
            ),
        )
        render = make_head_hierarchical_renderer(cfg, ds.hwfcxy, ds.near,
                                                 ds.far)

        def hframe(i):
            sig, _ = sig_fn(state["params"], jnp.int32(i % ds.n_frames))
            return render(state["params"], state["z_shape"],
                          state["z_app"], data["poses"][i % ds.n_frames],
                          sig, data["bc_img"])

        return hframe

    def bench(fn, n=8, passes=3, warm=2):
        for i in range(warm):
            out = fn(i)
        out.block_until_ready()
        rates = []
        for _ in range(passes):
            t0 = time.time()
            for i in range(n):
                out = fn(i)
            out.block_until_ready()
            rates.append(n / (time.time() - t0))
        return float(np.median(rates)), float(max(rates))

    h_pred = make(occ_thresh, 1e-4, False)
    h_pair = make(occ_thresh, 0.0, True)
    h_noskip = make(0.0, 0.0, False)

    f_pair, f_pair_max = bench(h_pair, warm=2 * refresh + 1)
    print(f"pair-compacted: {f_pair:.2f} fps (max {f_pair_max:.2f})",
          flush=True)
    f_pred, _ = bench(h_pred)
    print(f"predicated:     {f_pred:.2f} fps", flush=True)
    h_noskip(0).block_until_ready()
    t0 = time.time()
    for i in range(4):
        out = h_noskip(i)
    out.block_until_ready()
    print(f"noskip:         {4 / (time.time() - t0):.2f} fps", flush=True)
    errs = [float(jnp.abs(h_pair(i) - h_noskip(i)).max())
            for i in range(max(2 * refresh, 3))]
    print(f"pair max_err vs noskip: {max(errs):.5f}", flush=True)
    errs2 = [float(jnp.abs(h_pred(i) - h_noskip(i)).max())
             for i in range(3)]
    print(f"pred max_err vs noskip: {max(errs2):.5f}", flush=True)


if __name__ == "__main__":
    main()
