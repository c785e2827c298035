"""Serving-lever diagnostics: times each skip mechanism separately on a
trained+baked model and reports occupancy-flag density + error vs no-skip.

Trains + bakes the synthetic 450p scene once and caches the state in /tmp
so perf iteration is cheap. Not a committed-benchmark entry point; see
serve_trained.py for the headline number.
"""

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

from dfanerf_tpu.config import ExperimentConfig, RenderConfig, TrainConfig
from dfanerf_tpu.data import make_synthetic_dataset
from dfanerf_tpu.render.renderer import encode_frame_signals, make_frame_renderer
from dfanerf_tpu.train import dataset_to_device, init_train_state, make_train_step

CKPT = "/tmp/probe_baked_450.npz"
H = W = 450


def get_state(ds, cfg, n_train=4000, n_bake=800, lam=5e-4):
    from dfanerf_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    state = init_train_state(jax.random.PRNGKey(0), cfg)
    if os.path.exists(CKPT):
        state = load_checkpoint(CKPT, state)
        print("loaded cached baked state", file=sys.stderr)
        return state
    data = dataset_to_device(ds)
    key = jax.random.PRNGKey(1)
    for step_fn, n in ((make_train_step(cfg, ds), n_train),
                       (make_train_step(cfg, ds, sparsity_lambda=lam), n_bake)):
        for _ in range(n):
            key, sub = jax.random.split(key)
            state, m = step_fn(state, data, sub)
        jax.block_until_ready(m["loss"])
    print(f"trained+baked psnr={float(m['psnr_com']):.2f}", file=sys.stderr)
    save_checkpoint(CKPT, state)
    return state


def bench_variant(name, cfg, ds, state, data, n=20, ref=None):
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

    out = frame(0)
    out.block_until_ready()
    t0 = time.time()
    for i in range(n):
        out = frame(i)
    out.block_until_ready()
    fps = n / (time.time() - t0)
    err = float(jnp.abs(frame(3) - ref).max()) if ref is not None else 0.0
    print(json.dumps({"variant": name, "fps": round(fps, 3),
                      "max_err_vs_noskip": round(err, 5)}))
    return frame(3)


def occ_density(cfg, ds, state, data, thresh, grid_res=64):
    from dfanerf_tpu.core.rays import get_rays
    from dfanerf_tpu.ops.fused_render import (
        conservative_occupancy, spatial_tile_permutation,
    )
    from dfanerf_tpu.ops.pack import pack_field_weights

    Hh, Ww, focal, cx, cy = ds.hwfcxy
    sig_fn = jax.jit(
        lambda p, i: encode_frame_signals(
            p, data["auds"], data["exps"], data["poses"], i,
            data["auds"].shape[0], cfg, True,
        )
    )
    sig, sig_t = sig_fn(state["params"], jnp.int32(0))
    pose = data["poses"][0]
    rays_o, rays_d = get_rays(int(Hh), int(Ww), focal, pose, cx, cy)
    perm = spatial_tile_permutation(int(Hh), int(Ww))
    ro = rays_o.reshape(-1, 3)[perm]
    rd = rays_d.reshape(-1, 3)[perm]
    z_vals = jnp.linspace(ds.near, ds.far, cfg.render.n_samples)
    pw_h = pack_field_weights(
        state["params"]["decoder"], cfg.decoder, sig, state["z_shape"][0],
        state["z_app"][0], "head",
    )
    pw_t = pack_field_weights(
        state["params"]["decoder"], cfg.decoder, sig_t, state["z_shape"][1],
        state["z_app"][1], "torso",
    )
    occ_fn = jax.jit(lambda: conservative_occupancy(
        pw_h, pw_t, ro, rd, ro, rd, z_vals, thresh, grid_res=grid_res))
    occ = occ_fn()
    occ.block_until_ready()
    t0 = time.time()
    for _ in range(10):
        occ = occ_fn()
    occ.block_until_ready()
    ms = (time.time() - t0) / 10 * 1000
    joint = np.asarray(occ).max(0)
    print(json.dumps({
        "grid_res": grid_res,
        "occ_density_head": round(float(occ[0].mean()), 4),
        "occ_density_torso": round(float(occ[1].mean()), 4),
        "occ_density_joint": round(float(joint.mean()), 4),
        "occ_compute_ms": round(ms, 2),
        "thresh": thresh,
    }))


def main(thresh=0.3):
    ds = make_synthetic_dataset(n_frames=8, H=H, W=W, n_samples_gt=64)
    base = dict(n_samples=64, use_fused_kernel=True, compute_dtype="bfloat16")
    cfg0 = ExperimentConfig(
        render=RenderConfig(**base, ert_eps=0.0),
        train=TrainConfig(n_rand=2048),
    )
    state = get_state(ds, cfg0)
    data = dataset_to_device(ds)

    ref = bench_variant("noskip", cfg0, ds, state, data)
    occ_density(cfg0, ds, state, data, thresh, 64)
    occ_density(cfg0, ds, state, data, thresh, 48)
    for name, rc in (
        ("g48_r4", RenderConfig(**base, ert_eps=1e-4, spatial_tiles=True,
                                occ_sigma_thresh=thresh, occ_grid_res=48,
                                occ_refresh_every=4)),
        ("g48_r8", RenderConfig(**base, ert_eps=1e-4, spatial_tiles=True,
                                occ_sigma_thresh=thresh, occ_grid_res=48,
                                occ_refresh_every=8)),
        ("g48_r4_t05", RenderConfig(**base, ert_eps=1e-4, spatial_tiles=True,
                                    occ_sigma_thresh=0.5, occ_grid_res=48,
                                    occ_refresh_every=4)),
        ("g32_r4", RenderConfig(**base, ert_eps=1e-4, spatial_tiles=True,
                                occ_sigma_thresh=thresh, occ_grid_res=32,
                                occ_refresh_every=4)),
    ):
        cfg = ExperimentConfig(render=rc, train=cfg0.train)
        bench_variant(name, cfg, ds, state, data, ref=ref)


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.3)
