"""Serving benchmark on a TRAINED model (BASELINE configs 3/4 flavor).

The honest serving pipeline, end to end on one chip:

1. train the synthetic audio-driven 450p scene with the SHIPPED loss
   (identical semantics to run_nerf_com_trainExpLater.py:738-931);
2. serving bake: a brief fine-tune with a Cauchy density-sparsity prior at
   random frustum points (train/step.py sparsity_lambda) — an opt-in
   serving-prep pass that clears unsupervised-space density floaters so
   empty-space skipping can pay (quality is re-measured, not assumed);
3. render held-out frames with the fused kernel: no-skip baseline, then
   ERT + conservative occupancy flags;
4. report fps for both, val PSNR before/after the bake, and the max pixel
   error of the skipped render vs the no-skip render of the SAME weights.

    python benchmarks/serve_trained.py [n_train] [occ_thresh] [bake_steps]
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

H = W = 450


def run_steps(step, state, data, n, key):
    for _ in range(n):
        key, sub = jax.random.split(key)
        state, m = step(state, data, sub)
    jax.block_until_ready(m["loss"])
    return state, m, key


def make_frame_fn(cfg, ds, state, data):
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

    frame.render = render
    frame.sig_fn = sig_fn
    return frame


def bench_fps(frame, n=20, passes=3):
    """Timed passes; returns (median, max) fps over the passes.

    The per-frame Python dispatch makes the wall clock sensitive to
    transient host contention, which can only slow a pass — max is the
    steady-state throughput, median the typical one. The artifact reports
    BOTH; the headline uses the median."""
    frame(0).block_until_ready()
    rates = []
    for _ in range(passes):
        t0 = time.time()
        for i in range(n):
            out = frame(i)
        out.block_until_ready()
        rates.append(n / (time.time() - t0))
    return float(np.median(rates)), float(max(rates))


def val_psnr(cfg, ds, state, data):
    """Full-frame PSNR on the held-out frames (the reference's quality
    metric, run_nerf_com_trainExpLater.py:1070-1077). Returns
    (psnr_composite vs com_imgs, psnr_head-only vs head_imgs) — the second
    is the direct check that the HEAD field carries the head (its target is
    the head-only composite, load_audface.py:86-91)."""
    frame = make_frame_fn(cfg, ds, state, data)
    ses_com, ses_head = [], []
    for i in np.asarray(ds.i_val):
        sig, sig_t = frame.sig_fn(state["params"], jnp.int32(int(i)))
        head, com = frame.render(
            state["params"], state["z_shape"], state["z_app"],
            data["poses"][int(i)], data["poses"][0], sig, sig_t,
            data["bc_img"],
        )
        gt_com = np.asarray(ds.imgs_com[int(i)]).astype(np.float32) / 255.0
        gt_head = np.asarray(ds.imgs_head[int(i)]).astype(np.float32) / 255.0
        ses_com.append(float(np.mean(
            (np.asarray(jnp.clip(com, 0.0, 1.0)) - gt_com) ** 2)))
        ses_head.append(float(np.mean(
            (np.asarray(jnp.clip(head, 0.0, 1.0)) - gt_head) ** 2)))
    to_psnr = lambda ses: float(-10.0 * np.log10(max(np.mean(ses), 1e-12)))
    return to_psnr(ses_com), to_psnr(ses_head)


def _log(msg):
    print(f"[serve_trained] {msg}", file=sys.stderr, flush=True)


def run(n_train=6000, occ_thresh=2.0, bake_steps=1200, bake_lambda=2e-2,
        bake_mode="deadzone", bake_cutoff=1.0):
    """Train + bake + serve; returns the result dict (main() prints it).

    Recipe notes (measured on the 450p synthetic scene):
    - n_train 6000: +1.5-2 dB com PSNR over 4000 (the scene is still
      improving; training costs ~18 s/1000 steps);
    - bake: DEADZONE mode with cutoff 1.0 — penalize only sigma below
      junk scale, which provably cannot touch surfaces. The unrestricted
      Cauchy prior is collapse-UNSTABLE from a converged state: even
      lambda 5e-4 measured killing the head field outright (head 46.9 ->
      25.5 dB, the billboard basin) — hence the post-bake quality gate
      below;
    - occ_thresh 2.0 with the supersampled grid; refresh_every=8 with
      the max skip error measured on this exact scene.
    """
    base = dict(n_samples=64, use_fused_kernel=True, compute_dtype="bfloat16")
    cfg0 = ExperimentConfig(
        render=RenderConfig(**base, ert_eps=0.0),
        train=TrainConfig(n_rand=2048),
    )
    ds = make_synthetic_dataset(n_frames=8, H=H, W=W, n_samples_gt=64)
    state = init_train_state(jax.random.PRNGKey(0), cfg0)
    data = dataset_to_device(ds)

    t0 = time.time()
    _log("training...")
    step = make_train_step(cfg0, ds)
    state, m, key = run_steps(step, state, data, n_train, jax.random.PRNGKey(1))
    train_s = time.time() - t0
    _log(f"trained in {train_s:.0f}s; eval psnr...")
    psnr_trained, psnr_head_trained = val_psnr(cfg0, ds, state, data)

    t0 = time.time()
    _log("baking...")
    state_prebake = state
    bake = make_train_step(cfg0, ds, sparsity_lambda=bake_lambda,
                           sparsity_points=16384,
                           sparsity_mode=bake_mode,
                           sparsity_cutoff=bake_cutoff)
    state, m, key = run_steps(bake, state, data, bake_steps, key)
    bake_s = time.time() - t0
    _log(f"baked in {bake_s:.0f}s; eval psnr...")
    psnr_baked, psnr_head_baked = val_psnr(cfg0, ds, state, data)

    # collapse gate: the head-field death basin (docs/SERVING.md) is
    # reachable from a converged state under sparsity pressure — a bake
    # that costs >2 dB on either metric is REJECTED and serving runs on
    # the un-baked weights (slower, honest; the artifact records it)
    bake_rejected = (psnr_baked < psnr_trained - 2.0
                     or psnr_head_baked < psnr_head_trained - 2.0)
    if bake_rejected:
        _log(f"bake REJECTED (com {psnr_trained:.2f}->{psnr_baked:.2f}, "
             f"head {psnr_head_trained:.2f}->{psnr_head_baked:.2f}); "
             "serving un-baked weights")
        state = state_prebake

    # serving: no-skip baseline vs the pair-compacted occupancy path on
    # the SAME weights
    _log("bench noskip...")
    frame0 = make_frame_fn(cfg0, ds, state, data)
    fps_noskip, fps_noskip_max = bench_fps(frame0)
    ref_img = frame0(19)

    cfg1 = ExperimentConfig(
        render=RenderConfig(**base, ert_eps=1e-4, spatial_tiles=True,
                            occ_sigma_thresh=occ_thresh, occ_grid_res=48,
                            occ_refresh_every=8, occ_pair_compaction=True),
        train=cfg0.train,
    )
    _log(f"noskip {fps_noskip:.2f} fps; bench skip...")
    frame1 = make_frame_fn(cfg1, ds, state, data)
    fps_skip, fps_skip_max = bench_fps(frame1)
    # skip-lever error on THIS trained scene, across several frames (each
    # frame = a different conditioning signal; flags refresh every 8 frames
    # so later frames also measure the stale-flag error)
    errs = [float(jnp.abs(frame1(i) - frame0(i)).max()) for i in range(8)]
    max_err = max(errs)
    occ_frac, head_psnr_vs_bg = scene_diagnostics(cfg0, ds, state, data,
                                                  occ_thresh, frame0)

    _log(f"skip {fps_skip:.2f} fps err {max_err:.4f}; bench hierarchical...")
    hier = hierarchical_fps(ds, state, data, occ_thresh)

    return {
        "metric": "450p trained+baked serving fps (fused kernel, ERT+occupancy)",
        "value": round(fps_skip, 3),
        "unit": "fps",
        "vs_baseline": round(fps_skip / 30.0, 4),
        "extra": {
            "fps_skip_max": round(fps_skip_max, 3),
            "fps_noskip": round(fps_noskip, 3),
            "fps_noskip_max": round(fps_noskip_max, 3),
            "speedup_vs_noskip": round(fps_skip / fps_noskip, 2),
            "max_abs_err_vs_noskip": round(max_err, 5),
            "val_psnr_trained": round(psnr_trained, 2),
            "val_psnr_after_bake": round(psnr_baked, 2),
            "val_psnr_head_trained": round(psnr_head_trained, 2),
            "val_psnr_head_after_bake": round(psnr_head_baked, 2),
            "train_steps": n_train,
            "bake_steps": bake_steps,
            "bake_lambda": bake_lambda,
            "bake_mode": bake_mode,
            "bake_cutoff": bake_cutoff,
            "bake_rejected": bool(bake_rejected),
            "occ_sigma_thresh": occ_thresh,
            "occ_grid_res": 48,
            "occ_refresh_every": 8,
            "train_seconds": round(train_s, 1),
            "bake_seconds": round(bake_s, 1),
            # scene-regime transparency (see docs/SERVING.md "What the
            # trained scene converges to"): the fraction of (tile, slab)
            # occupancy flags set, and how far the HEAD-only render is
            # from the plain background (0 dB apart = the composite is
            # carried entirely by the per-ray catch-all sample)
            "occ_flag_density": occ_frac,
            "head_render_vs_bg_psnr": head_psnr_vs_bg,
            # BASELINE config 2 on the SAME trained+baked weights:
            # head-only hierarchical 64 coarse (sigma-only kernel) + 128
            # fine (per-ray-z kernel), occupancy on both passes + ERT
            "hierarchical_64p128_fps": hier["fps"],
            "hierarchical_64p128_fps_max": hier["fps_max"],
            "hierarchical_noskip_fps": hier["fps_noskip"],
            "hierarchical_max_err_vs_noskip": hier["max_err"],
        },
    }


def hierarchical_fps(ds, state, data, occ_thresh):
    """BASELINE config 2 measured on the trained+baked state: 450p
    head-only coarse+fine (64+128) through the fused sigma + per-ray-z
    kernels, with and without occupancy/ERT."""
    from dfanerf_tpu.render.renderer import make_head_hierarchical_renderer

    def make(thresh, ert):
        cfg = ExperimentConfig(
            render=RenderConfig(
                n_samples=64, n_importance=128, compute_dtype="bfloat16",
                use_fused_kernel=True, ert_eps=ert,
                occ_sigma_thresh=thresh, occ_grid_res=48,
            ),
        )
        render = make_head_hierarchical_renderer(cfg, ds.hwfcxy, ds.near,
                                                 ds.far)
        frame = make_frame_fn(cfg, ds, state, data)

        def hframe(i):
            sig, _ = frame.sig_fn(state["params"], jnp.int32(i % ds.n_frames))
            return render(state["params"], state["z_shape"], state["z_app"],
                          data["poses"][i % ds.n_frames], sig,
                          data["bc_img"])

        return hframe

    h_skip = make(occ_thresh, 1e-4)
    h_noskip = make(0.0, 0.0)
    fps, fps_max = bench_fps(h_skip, n=8, passes=3)
    t0 = time.time()
    h_noskip(0).block_until_ready()
    n = 4
    t0 = time.time()
    for i in range(n):
        out = h_noskip(i)
    out.block_until_ready()
    fps_noskip = n / (time.time() - t0)
    errs = [float(jnp.abs(h_skip(i) - h_noskip(i)).max()) for i in range(3)]
    return {
        "fps": round(fps, 3), "fps_max": round(fps_max, 3),
        "fps_noskip": round(fps_noskip, 3), "max_err": round(max(errs), 5),
    }


def scene_diagnostics(cfg, ds, state, data, occ_thresh, frame0):
    """Occupancy-flag density at the serving threshold + how much content
    the head field itself carries (PSNR between the head-only render and
    the static background; 99 dB cap means byte-identical). Reuses
    frame0's compiled renderer/signal functions."""
    from dfanerf_tpu.core.rays import get_rays
    from dfanerf_tpu.ops.fused_render import (
        conservative_occupancy, spatial_tile_permutation,
    )
    from dfanerf_tpu.ops.pack import pack_field_weights

    Hh, Ww, focal, cx, cy = ds.hwfcxy
    sig, sig_t = frame0.sig_fn(state["params"], jnp.int32(0))
    ro, rd = get_rays(int(Hh), int(Ww), focal, data["poses"][0], cx, cy)
    perm = spatial_tile_permutation(int(Hh), int(Ww))
    ro = ro.reshape(-1, 3)[perm]
    rd = rd.reshape(-1, 3)[perm]
    z = jnp.linspace(ds.near, ds.far, cfg.render.n_samples)
    pw_h = pack_field_weights(
        state["params"]["decoder"], cfg.decoder, sig, state["z_shape"][0],
        state["z_app"][0], "head",
    )
    pw_t = pack_field_weights(
        state["params"]["decoder"], cfg.decoder, sig_t, state["z_shape"][1],
        state["z_app"][1], "torso",
    )
    occ = np.asarray(conservative_occupancy(
        pw_h, pw_t, ro, rd, ro, rd, z, occ_thresh,
        grid_res=cfg.render.occ_grid_res,
    )).max(0)

    head = np.asarray(frame0.render(
        state["params"], state["z_shape"], state["z_app"], data["poses"][0],
        data["poses"][0], sig, sig_t, data["bc_img"],
    )[0])
    bc = np.asarray(ds.bc_img).astype(np.float32) / 255.0
    mse = float(np.mean((np.clip(head, 0.0, 1.0) - bc) ** 2))
    # uncapped: byte-identical head-render-vs-bg reports the true (large)
    # value via the 1e-12 floor rather than a 99 dB cap
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    return round(float(occ.mean()), 4), round(psnr, 2)


def main(*args, **kwargs):
    print(json.dumps(run(*args, **kwargs)))


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 6000,
        float(sys.argv[2]) if len(sys.argv) > 2 else 2.0,
        int(sys.argv[3]) if len(sys.argv) > 3 else 1200,
        float(sys.argv[4]) if len(sys.argv) > 4 else 5e-3,
    )
