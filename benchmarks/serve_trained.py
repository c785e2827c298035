"""Serving benchmark on a TRAINED model (BASELINE configs 3/4 flavor).

The honest serving pipeline, end to end on one chip:

1. train the synthetic audio-driven 450p scene with the SHIPPED loss
   (identical semantics to run_nerf_com_trainExpLater.py:738-931) plus a
   distortion prior (softplus density) that keeps the field serving-sharp
   from the start — no post-hoc sparsity bake needed;
2. polish: a short distortion-off phase that recovers the prior's PSNR
   cost while the field stays compact (quality re-measured, not assumed,
   with a collapse gate);
3. render held-out frames with the fused pair kernels: no-skip baseline,
   then conservative occupancy + contribution pruning + catch-all elision;
4. report median AND max fps for both, val PSNR per phase, and the max
   pixel error of the skipped render vs the no-skip render of the SAME
   weights across a full refresh window.

    python benchmarks/serve_trained.py [n_train] [occ_thresh] [polish_steps]
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
from dfanerf_tpu.models.decoder import DecoderConfig
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


def make_frame_fn(cfg, ds, state, data, per_slot=False):
    """per_slot: serve each frame under its own pinned flag state (the
    offline-window mode after refresh_union(..., per_slot=True))."""
    render = make_frame_renderer(cfg, ds.hwfcxy, ds.near, ds.far)
    sig_fn = jax.jit(
        lambda p, i: encode_frame_signals(
            p, data["auds"], data["exps"], data["poses"], i,
            data["auds"].shape[0], cfg, True,
        )
    )

    def frame(i):
        sig, sig_t = sig_fn(state["params"], jnp.int32(i % ds.n_frames))
        kw = {"window_slot": i % ds.n_frames} if per_slot else {}
        return render(
            state["params"], state["z_shape"], state["z_app"],
            data["poses"][i % ds.n_frames], data["poses"][0],
            sig, sig_t, data["bc_img"], **kw,
        )[1]

    frame.render = render
    frame.sig_fn = sig_fn
    return frame


def bench_fps(frame, n=20, passes=3, warm=1):
    """Timed passes; returns (median, max) fps over the passes.

    The per-frame Python dispatch makes the wall clock sensitive to
    transient host contention, which can only slow a pass — max is the
    steady-state throughput, median the typical one. The artifact reports
    BOTH; the headline uses the median. ``warm`` frames run first so every
    program class compiles outside the timed region (live-mode renderers
    need a full refresh cycle: refresh frame + fast-path frames)."""
    for i in range(warm):
        out = frame(i)
    out.block_until_ready()
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


def run(n_train=12000, occ_thresh=2.0, polish_steps=2000,
        distortion_lambda=3e-3, distortion_from=2000,
        prune_contrib=0.0, far_skip_tol=2e-3, prune_budget=2e-3,
        prune_trans=0.1, budget_color=True):
    """Train + polish + serve; returns the result dict (main() prints it).

    Recipe notes (measured on the 450p synthetic scene; every alternative
    below was measured WORSE — docs/SERVING.md):
    - softplus density + distortion loss (lambda 3e-3 from step 2000):
      trains the field SHARP from the start, so serving needs no separate
      sparsity bake. The bake approaches are all dominated: unrestricted
      Cauchy from a converged state is collapse-unstable (head 46.9 ->
      25.5 dB at lambda 5e-4), deadzone costs 3.5 dB, visibility-gated
      can't keep up with junk the main loss keeps growing;
    - a 2000-step lambda=0 POLISH after the distortion phase recovers
      ~2.5 dB (com 42.4 -> 44.9) while the field stays compact;
    - occ_thresh 2.0 on the supersampled grid; COLOR-budgeted visibility
      pruning at 2e-3 (occ_budget_color: the greedy's ledger bounds the
      first-order per-ray pixel error, so same-colored interior pairs
      drop ~2x harder than the mass/contrib modes at the same realized
      error) + occ_prune_trans 0.1 (pairs behind saturated opacity,
      which never consume budget); the measured knee: budget 0.0015 ->
      err 0.0033, 0.002 -> 0.0041 (the round-3 error bar), 0.004 ->
      0.0069;
    - far_skip_tol 2e-3: elide the catch-all far-plane programs when the
      refresh-time-measured c_mix deviation is under tolerance (softplus
      keeps sigma(far) > 0 everywhere, see config.far_skip_tol).
    """
    base = dict(n_samples=64, use_fused_kernel=True, compute_dtype="bfloat16")
    dec = DecoderConfig(density_activation="softplus")
    cfg0 = ExperimentConfig(
        decoder=dec,
        render=RenderConfig(**base, ert_eps=0.0),
        train=TrainConfig(n_rand=2048, distortion_lambda=distortion_lambda,
                          distortion_from=distortion_from),
    )
    ds = make_synthetic_dataset(n_frames=8, H=H, W=W, n_samples_gt=64)
    state = init_train_state(jax.random.PRNGKey(0), cfg0)
    data = dataset_to_device(ds)
    cfgP = ExperimentConfig(decoder=dec, render=cfg0.render,
                            train=TrainConfig(n_rand=2048))

    # dev-iteration cache (env-gated, never set in driver/bench runs): the
    # train+polish phases are deterministic given the recipe args, so perf
    # work on the serving path can reuse one trained state
    cache_path = os.environ.get("DFANERF_STATE_CACHE", "")
    meta = None
    if cache_path and (os.path.exists(cache_path)
                       or os.path.exists(cache_path + ".npz")):
        from dfanerf_tpu.train.checkpoint import load_checkpoint

        state = load_checkpoint(cache_path, state)
        with open(cache_path + ".json") as f:
            meta = json.load(f)
        _log(f"loaded cached trained state from {cache_path}")
    if meta is None:
        t0 = time.time()
        _log("training (softplus + distortion)...")
        step = make_train_step(cfg0, ds)
        state, m, key = run_steps(step, state, data, n_train,
                                  jax.random.PRNGKey(1))
        train_s = time.time() - t0
        _log(f"trained in {train_s:.0f}s; eval psnr...")
        psnr_trained, psnr_head_trained = val_psnr(cfg0, ds, state, data)

        t0 = time.time()
        _log("polishing (distortion off)...")
        polish = make_train_step(cfgP, ds)
        state_prepolish = state
        state, m, key = run_steps(polish, state, data, polish_steps, key)
        polish_s = time.time() - t0
        _log(f"polished in {polish_s:.0f}s; eval psnr...")
        psnr_polished, psnr_head_polished = val_psnr(cfgP, ds, state, data)

        # collapse gate: the head-field death basin (docs/SERVING.md) is an
        # attractor of the loss itself — any phase that costs >2 dB on
        # either metric is REJECTED and serving runs on the pre-polish
        # weights (slower, honest; the artifact records it)
        polish_rejected = (psnr_polished < psnr_trained - 2.0
                           or psnr_head_polished < psnr_head_trained - 2.0)
        if polish_rejected:
            _log(f"polish REJECTED (com {psnr_trained:.2f}->"
                 f"{psnr_polished:.2f}, head {psnr_head_trained:.2f}->"
                 f"{psnr_head_polished:.2f}); serving pre-polish weights")
            state = state_prepolish
        meta = dict(psnr_trained=psnr_trained,
                    psnr_head_trained=psnr_head_trained,
                    psnr_polished=psnr_polished,
                    psnr_head_polished=psnr_head_polished,
                    polish_rejected=bool(polish_rejected),
                    train_s=train_s, polish_s=polish_s)
        if cache_path:
            from dfanerf_tpu.train.checkpoint import save_checkpoint

            save_checkpoint(cache_path, state)
            with open(cache_path + ".json", "w") as f:
                json.dump(meta, f)
    (psnr_trained, psnr_head_trained, psnr_polished, psnr_head_polished,
     polish_rejected, train_s, polish_s) = (
        meta["psnr_trained"], meta["psnr_head_trained"],
        meta["psnr_polished"], meta["psnr_head_polished"],
        meta["polish_rejected"], meta["train_s"], meta["polish_s"])

    # serving: no-skip baseline vs the pair-compacted occupancy path on
    # the SAME weights, in BOTH serving modes:
    # - offline/window: the reference's own serving shape (render a video
    #   from known poses/signals, scripts/test_obama.sh): refresh_union
    #   preps flags once for the window, every frame runs the 4-program
    #   fast path; the prep cost is reported as stream-start latency;
    # - live: poses/signals arrive frame by frame; conservative flags
    #   refresh every occ_refresh_every frames, prune keep-masks carried
    #   (occ_prune_carry) with a full diagnostic re-derive every 4th
    #   refresh.
    _log("bench noskip...")
    frame0 = make_frame_fn(cfgP, ds, state, data)
    fps_noskip, fps_noskip_max = bench_fps(frame0)

    cfg1 = ExperimentConfig(
        decoder=dec,
        render=RenderConfig(**base, ert_eps=1e-4, spatial_tiles=True,
                            occ_sigma_thresh=occ_thresh, occ_grid_res=96,
                            occ_refresh_every=8, occ_pair_compaction=True,
                            occ_prune_contrib=prune_contrib,
                            occ_prune_budget=prune_budget,
                            occ_budget_color=budget_color,
                            occ_budget_iters=2,
                            occ_prune_trans=prune_trans,
                            far_skip_tol=far_skip_tol, far_subsample=8,
                            occ_prune_carry=3),
        train=cfgP.train,
    )
    _log(f"noskip {fps_noskip:.2f} fps; bench skip (offline window)...")
    frame1 = make_frame_fn(cfg1, ds, state, data, per_slot=True)
    # offline mode: prep each window frame's own pinned flag state once
    # (timed = the stream-start latency), then serve every frame on the
    # fast path under its own pruned pair lists — the union's pair
    # inflation is avoided (refresh_union per_slot docstring)
    frame1.render(
        state["params"], state["z_shape"], state["z_app"],
        data["poses"][0], data["poses"][0],
        *frame1.sig_fn(state["params"], jnp.int32(0)), data["bc_img"],
    )[1].block_until_ready()  # compile inputs_fn/occ/diag programs
    t0 = time.time()
    window = [frame1.render.inputs_fn(
        state["params"], state["z_shape"], state["z_app"],
        data["poses"][i], data["poses"][0],
        *frame1.sig_fn(state["params"], jnp.int32(i)), data["bc_img"],
    ) for i in range(ds.n_frames)]
    frame1.render.refresh_union(window, per_slot=True)
    prep_s = time.time() - t0
    fps_skip, fps_skip_max = bench_fps(frame1, warm=9)
    # skip-lever error on THIS trained scene across the whole window (every
    # frame = a different conditioning signal served under its own pinned
    # flags, so the per-slot prune staleness is included): max/mean pixel
    # error and the PSNR of the skipped render against the no-skip render
    # of the same weights (the VERDICT round-2 "dense-regime error" ask)
    errs, mean_errs, psnrs = [], [], []
    for i in range(8):
        d = jnp.abs(frame1(i) - frame0(i))
        errs.append(float(d.max()))
        mean_errs.append(float(d.mean()))
        psnrs.append(float(-10.0 * jnp.log10(jnp.maximum(
            jnp.mean(d.astype(jnp.float32) ** 2), 1e-12))))
    max_err = max(errs)
    mean_err = float(np.mean(mean_errs))
    psnr_vs_noskip = min(psnrs)

    _log(f"offline {fps_skip:.2f} fps; bench skip (live, async refresh)...")
    import dataclasses

    # live mode: async worker refreshes every 4 frames (+0/1/2 trigger
    # jitter so the derive snapshots rotate through the window's phases)
    # and re-derives the prune at EVERY refresh (carry off) with
    # history-max keys (occ_prune_hist_decay). Round-4 postmortem: the
    # live max-err driver was the prune deriving only from aliased
    # snapshot phases (a fixed refresh-4 cadence vs the 8-frame window —
    # the derive never saw the frames it was applied to) and dropping
    # pairs whose color-key was ~0 under those signals but 0.034 under
    # others. The jittered cadence plus the decayed running max over
    # derive cycles keeps every recently-visible pair's key alive;
    # probe_live_sweep (paced protocol): steady-state error 0.0086 at
    # refresh 4 / 0.0048 at refresh 3, vs 0.0336 frozen — refresh 4 buys
    # ~1 fps of dispatch headroom at error still well under the 0.0123
    # offline-mode bound.
    cfg2 = ExperimentConfig(
        decoder=dec,
        render=dataclasses.replace(cfg1.render, occ_async_refresh=True,
                                   occ_refresh_every=4,
                                   occ_prune_carry=0,
                                   occ_prune_hist_decay=0.8,
                                   occ_live_keys=True),
        train=cfgP.train,
    )
    frame2 = make_frame_fn(cfg2, ds, state, data)
    # warm TWO full refresh cycles so the async worker's program classes
    # compile outside the timed region, then settle any in-flight swap
    fps_live, fps_live_max = bench_fps(frame2, warm=17)
    # live-mode error measured under PACED serving — the product
    # workload: frames arrive at 25 fps (the reference's video rate,
    # scripts/test_obama.sh encodes at 25). Each frame is dispatched no
    # earlier than its arrival time, error-reduced ON DEVICE against the
    # no-skip render (the ledger is fetched ONCE at the end — a per-frame
    # scalar fetch costs a full ~40 ms tunnel round-trip on this
    # environment and alone busts the 25 fps budget), converted to u8 and
    # streamed to the host via copy_to_host_async with a 2-frame pipeline
    # (present deadline = arrival + 80 ms; a miss = the frame's bytes
    # landed on the host after its deadline). Pacing matters both ways:
    # an unbounded dispatch loop enqueues the whole window before the
    # async worker can land a single swap (measured: 48 frames served
    # under ONE frozen flag state), while per-frame blocking fetches
    # starve the worker of the idle slices a real 25 fps stream has
    # (measured: zero swaps landed across 48 frames, error pinned at the
    # frozen-prune 0.0336).
    ref_dev = [frame0(i) for i in range(8)]
    swaps0 = getattr(frame2.render, "cache", {}).get("swaps", 0)
    errs_live, misses = paced_live_protocol(frame2, ref_dev)
    live_swaps = getattr(frame2.render, "cache", {}).get("swaps", 0) - swaps0
    max_err_live = max(errs_live)
    max_err_live_last3 = max(errs_live[-24:])
    occ_frac, head_psnr_vs_bg = scene_diagnostics(cfgP, ds, state, data,
                                                  occ_thresh, frame0)
    _cache = getattr(frame1.render, "cache", {})
    far_cmix_err = _cache.get("far_cmix_err")
    far_skipped = bool(_cache.get("far_skip", False))

    _log(f"skip {fps_skip:.2f} fps err {max_err:.4f}; bench hierarchical...")
    hier = hierarchical_fps(ds, state, data, occ_thresh)

    _log("bench e2e audio->video...")
    e2e = e2e_audio_video(cfg2, ds, state, data)

    return {
        "metric": "450p trained serving fps (offline window, per-slot "
                  "pinned flags, fused pair kernels, occupancy+pruning)",
        "value": round(fps_skip, 3),
        "unit": "fps",
        "vs_baseline": round(fps_skip / 30.0, 4),
        "extra": {
            "fps_skip_max": round(fps_skip_max, 3),
            "fps_live": round(fps_live, 3),
            "fps_live_max": round(fps_live_max, 3),
            "max_abs_err_vs_noskip_live": round(max_err_live, 5),
            "max_abs_err_vs_noskip_live_last3cyc": round(
                max_err_live_last3, 5),
            "live_paced_fps": 25.0,
            "live_paced_deadline_misses": misses,
            "live_paced_swaps": live_swaps,
            "errs_live_by_frame": [round(e, 5) for e in errs_live],
            "occ_prune_hist_decay": cfg2.render.occ_prune_hist_decay,
            "serving_prep_s": round(prep_s, 3),
            "fps_noskip": round(fps_noskip, 3),
            "fps_noskip_max": round(fps_noskip_max, 3),
            "speedup_vs_noskip": round(fps_skip / fps_noskip, 2),
            "max_abs_err_vs_noskip": round(max_err, 5),
            "mean_abs_err_vs_noskip": round(mean_err, 6),
            "psnr_vs_noskip_db": round(psnr_vs_noskip, 2),
            "val_psnr_trained": round(psnr_trained, 2),
            "val_psnr_after_polish": round(psnr_polished, 2),
            "val_psnr_head_trained": round(psnr_head_trained, 2),
            "val_psnr_head_after_polish": round(psnr_head_polished, 2),
            "train_steps": n_train,
            "polish_steps": polish_steps,
            "distortion_lambda": distortion_lambda,
            "distortion_from": distortion_from,
            "density_activation": "softplus",
            "occ_prune_contrib": prune_contrib,
            "occ_prune_budget": prune_budget,
            "occ_budget_color": budget_color,
            "occ_prune_trans": prune_trans,
            "far_skip_tol": far_skip_tol,
            "polish_rejected": bool(polish_rejected),
            "occ_sigma_thresh": occ_thresh,
            "occ_grid_res": cfg1.render.occ_grid_res,
            "occ_refresh_every": cfg1.render.occ_refresh_every,
            "train_seconds": round(train_s, 1),
            "polish_seconds": round(polish_s, 1),
            # scene-regime transparency (see docs/SERVING.md "What the
            # trained scene converges to"): the fraction of (tile, slab)
            # occupancy flags set, and how far the HEAD-only render is
            # from the plain background (0 dB apart = the composite is
            # carried entirely by the per-ray catch-all sample)
            "occ_flag_density": occ_frac,
            "head_render_vs_bg_psnr": head_psnr_vs_bg,
            # catch-all elision: the refresh-time measured max|c_mix - bc|
            # and whether the far programs were actually skipped
            "far_cmix_err": far_cmix_err,
            "far_skipped": far_skipped,
            # BASELINE config 2 on the SAME trained+baked weights:
            # head-only hierarchical 64 coarse (sigma-only kernel) + 128
            # fine (per-ray-z kernel), occupancy on both passes + ERT
            "hierarchical_64p128_fps": hier["fps"],
            "hierarchical_64p128_fps_max": hier["fps_max"],
            "hierarchical_noskip_fps": hier["fps_noskip"],
            "hierarchical_max_err_vs_noskip": hier["max_err"],
            # BASELINE config 4 timed end to end: wav -> wav2exp features
            # -> driving signals -> live-mode render -> encoded video
            "e2e_audio_to_video": e2e,
        },
    }


def paced_live_protocol(frame2, ref_dev, n_paced=120, fps=25.0, depth=4,
                        settle=32):
    """Live-mode error under PACED serving (see run()'s call-site comment
    for the full rationale). Frames arrive at ``fps``; each is dispatched
    no earlier than its arrival, error-reduced ON DEVICE against ref_dev
    (ledger fetched once at the end), converted to u8 and streamed out
    via copy_to_host_async with a ``depth``-frame pipeline. A
    presentation miss = the frame's bytes landed on the host after
    arrival + depth frame times (160 ms at the defaults —
    realtime-conferencing territory). The async copies put the wire time
    in the tunnel's own IO thread, so the host loop keeps real idle
    slices for the refresh worker — the same 25 fps idle a production
    serving host has; a too-shallow ring turns every present into a
    synchronous wire wait and starves the worker (measured: depth 2
    landed ZERO flag swaps across 48 frames, error pinned at the frozen
    prune's 0.0336). n_paced spans 5+ refresh cycles so the reported
    error is steady-state, not first-swap; the first ``settle`` paced
    frames are served identically but NOT measured — any benchmark
    running immediately before this (bench_fps dispatches unpaced and
    starves the worker the same way depth-2 did) leaves a stale swap
    state behind, and a real paced server sheds it within its first
    refresh cycle (measured: the first in-paced swap lands ~0.4 s in and
    the error drops 0.0336 -> 0.004 for the rest of the stream).
    Returns (errs_live list, misses) over the measured frames."""
    from collections import deque

    err_fn = jax.jit(lambda a, b: jnp.abs(a - b).max())
    u8_fn = jax.jit(lambda c: (jnp.clip(c, 0.0, 1.0) * 255.0
                               ).astype(jnp.uint8))
    np.asarray(u8_fn(ref_dev[0]))  # u8 transfer-path warmup (one-time)
    frame_dt = 1.0 / fps
    misses = 0
    errs_dev = []
    ring = deque()
    n_win = len(ref_dev)
    t_start = time.time()
    for i in range(settle + n_paced):
        lag = t_start + i * frame_dt - time.time()
        if lag > 0:
            time.sleep(lag)  # the signal hasn't arrived yet
        f = frame2(i % n_win)
        if i >= settle:
            errs_dev.append(err_fn(f, ref_dev[i % n_win]))
        u8 = u8_fn(f)
        u8.copy_to_host_async()
        ring.append((t_start + (i + depth) * frame_dt, u8))
        while len(ring) > depth:
            dl, fr = ring.popleft()
            np.asarray(fr)  # present
            if time.time() > dl:
                misses += 1
    while ring:
        dl, fr = ring.popleft()
        np.asarray(fr)
        if time.time() > dl:
            misses += 1
    errs = [float(e) for e in np.asarray(jnp.stack(errs_dev))]
    return errs, misses


def e2e_audio_video(cfg_live, ds, state, data, n_frames=80):
    """BASELINE config 4, timed END TO END at 450p: synthesize a wav,
    extract wav2exp features (pipeline/audio — the same mel frontend +
    AudioEncoder the reference's test_w2l_audio.py:115-139 runs), drive
    the trained model with the novel audio in LIVE serving mode (poses
    cycled, signals per frame), and encode the frames to a video file.
    Reports per-stage seconds and the end-to-end fps. Program compiles are
    warm from the preceding benches (a long-running server's steady
    state); the first live refresh is included in render_s. The wav2exp
    feature programs are warmed on a same-shape silent wav BEFORE the
    timed region (feature_warm_s) — a server extracts features from every
    incoming utterance with the same window shapes, so the compile is a
    server-start cost, not a per-request one; feature_s is the
    steady-state per-utterance cost."""
    import tempfile

    import imageio.v2 as imageio

    from dfanerf_tpu.pipeline.audio.wav2exp import (
        Wav2ExpHParams, init_audio_encoder, wav2exp_features,
    )

    hp = Wav2ExpHParams()
    dur = n_frames / 25.0 + 0.4
    t = np.arange(int(dur * hp.sample_rate), dtype=np.float32) / hp.sample_rate
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)
           * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    enc_params = init_audio_encoder(jax.random.PRNGKey(3))
    tw = time.time()
    wav2exp_features(enc_params, np.zeros_like(wav), hp)
    feature_warm_s = time.time() - tw
    t0 = time.time()
    feats = np.asarray(wav2exp_features(enc_params, wav, hp))
    n = int(min(n_frames, feats.shape[0]))
    # driving signals through the scene's OWN feature contract: the
    # novel audio modulates the scalar driving state (1st PC of the
    # wav2exp embedding trajectory, z-scored and squashed), which is
    # featurized exactly like the training auds/exps. The reference
    # drives test audio through the SAME extractor that produced the
    # training features (load_audface.py:14-47); round 4 fed the decoder
    # raw features from a different (untrained) encoder, conditioning it
    # out of distribution — the field went dense and the "novel-audio
    # cliff" was largely that, not serving overhead.
    from dfanerf_tpu.data.synthetic import featurize_audio_state

    f = feats[:n] - feats[:n].mean(0)
    _, _, vt = np.linalg.svd(f, full_matrices=False)
    s = f @ vt[0]
    s = np.tanh(s / max(float(s.std()), 1e-6))
    auds_np, exps_np = featurize_audio_state(s)
    auds = jnp.asarray(auds_np)
    exps = jnp.asarray(exps_np)
    poses = jnp.asarray(np.asarray(data["poses"])[
        np.arange(n) % ds.n_frames])
    feature_s = time.time() - t0

    render = make_frame_renderer(cfg_live, ds.hwfcxy, ds.near, ds.far)
    sig_fn = jax.jit(
        lambda p, i: encode_frame_signals(
            p, auds, exps, poses, i, n, cfg_live, True,
        )
    )

    def live_frame(i):
        sig, sig_t = sig_fn(state["params"], jnp.int32(i))
        _, com = render(
            state["params"], state["z_shape"], state["z_app"],
            poses[i], poses[0], sig, sig_t, data["bc_img"],
        )
        return com

    # steady-state warm: the novel audio's signal trajectory shifts the
    # occupied-pair bucket sizes, so the first refresh cycles compile
    # first-seen fast-path programs (a long-running server pays these
    # once); two refresh cycles outside the timed region, like bench_fps
    warm = min(2 * cfg_live.render.occ_refresh_every + 1, n)
    for i in range(warm):
        live_frame(i).block_until_ready()
    # server-start headroom class (see renderer.precompile_headroom):
    # with occ_class_clamp every later refresh whose drifted pair counts
    # lack an executed class lands on this one instead of tracing a new
    # program mid-stream — the timed region below never loses the single
    # host core to jit tracing
    t_h = time.time()
    sig_w, sig_t_w = sig_fn(state["params"], jnp.int32(warm % n))
    render.precompile_headroom(
        state["params"], state["z_shape"], state["z_app"],
        poses[warm % n], poses[0], sig_w, sig_t_w, data["bc_img"])
    headroom_s = time.time() - t_h
    # pipelined download: convert to u8 ON DEVICE (4x smaller transfer;
    # the axon tunnel moves ~20 MB/s, so a 450p u8 frame costs ~30 ms on
    # the wire) and START the device->host copy at dispatch time
    # (copy_to_host_async) so the wire time overlaps the device's render
    # of the following frames — a blocking per-frame np.asarray serializes
    # dispatch and transfer (measured 13.2 fps; overlapped they pipeline
    # at max(render, wire) instead of the sum). The one-time u8
    # transfer-path setup (first sub-32-bit fetch in a process compiles a
    # conversion program, ~20 s) is warmed outside the timed region like
    # the feature programs — a server-start cost.
    to_u8 = jax.jit(lambda c: (jnp.clip(c, 0.0, 1.0) * 255.0
                               ).astype(jnp.uint8))
    np.asarray(to_u8(live_frame(0)))  # u8 transfer-path warmup
    from collections import deque

    depth = 8
    t1 = time.time()
    frames = []
    ring = deque()
    for i in range(n):
        u8 = to_u8(live_frame(i))
        u8.copy_to_host_async()
        ring.append(u8)
        if len(ring) > depth:
            frames.append(np.asarray(ring.popleft()))
    while ring:
        frames.append(np.asarray(ring.popleft()))
    render_s = time.time() - t1

    t2 = time.time()
    out = os.path.join(tempfile.mkdtemp(prefix="dfanerf_e2e_"),
                       "driven.mp4")
    # cv2's bundled mp4v encoder needs no external ffmpeg binary and
    # encodes 80 frames in ~0.3 s (imageio's gif fallback took 3.1 s)
    try:
        import cv2

        vw = cv2.VideoWriter(out, cv2.VideoWriter_fourcc(*"mp4v"), 25,
                             (frames[0].shape[1], frames[0].shape[0]))
        if not vw.isOpened():
            raise RuntimeError("cv2 VideoWriter failed to open")
        for fr in frames:
            vw.write(fr[:, :, ::-1])  # RGB -> BGR
        vw.release()
    except Exception:
        try:
            imageio.mimwrite(out, frames, fps=25, quality=8)
        except (ValueError, ImportError):
            out = out[:-4] + ".gif"
            imageio.mimwrite(out, frames, duration=1000 / 25)
    encode_s = time.time() - t2
    total = feature_s + render_s + encode_s
    return {
        "fps_e2e": round(n / total, 3),
        "n_frames": n,
        "headroom_s": round(headroom_s, 3),
        "feature_warm_s": round(feature_warm_s, 3),
        "feature_s": round(feature_s, 3),
        "render_s": round(render_s, 3),
        "encode_s": round(encode_s, 3),
        "render_fps": round(n / render_s, 3),
        "video": os.path.basename(out),
    }


def hierarchical_fps(ds, state, data, occ_thresh,
                     dec=DecoderConfig(density_activation="softplus"),
                     skip_kw=None):
    """BASELINE config 2 measured on the trained state: 450p head-only
    coarse+fine (64+128) through the fused sigma + per-ray-z kernels, with
    and without occupancy/ERT. dec must match the training decoder config
    (density activation changes how sigma is read). skip_kw overrides
    RenderConfig fields on the SKIP config only (probe_hier sweeps)."""
    from dfanerf_tpu.render.renderer import make_head_hierarchical_renderer

    def make(thresh, ert, pairs=False):
        kw = dict(
            n_samples=64, n_importance=128, compute_dtype="bfloat16",
            use_fused_kernel=True, ert_eps=ert,
            occ_sigma_thresh=thresh, occ_grid_res=48,
            occ_pair_compaction=pairs,
            occ_refresh_every=4 if pairs else 1,
            occ_prune_contrib=3e-3 if pairs else 0.0,
        )
        if pairs and skip_kw:
            kw.update(skip_kw)
        cfg = ExperimentConfig(decoder=dec, render=RenderConfig(**kw))
        render = make_head_hierarchical_renderer(cfg, ds.hwfcxy, ds.near,
                                                 ds.far)
        frame = make_frame_fn(cfg, ds, state, data)

        def hframe(i):
            sig, _ = frame.sig_fn(state["params"], jnp.int32(i % ds.n_frames))
            return render(state["params"], state["z_shape"], state["z_app"],
                          data["poses"][i % ds.n_frames], sig,
                          data["bc_img"])

        return hframe

    h_skip = make(occ_thresh, 1e-4, pairs=True)
    h_noskip = make(0.0, 0.0)
    # warm one full refresh cycle + the refresh frame's program classes
    fps, fps_max = bench_fps(h_skip, n=8, passes=3, warm=9)
    t0 = time.time()
    h_noskip(0).block_until_ready()
    n = 4
    t0 = time.time()
    for i in range(n):
        out = h_noskip(i)
    out.block_until_ready()
    fps_noskip = n / (time.time() - t0)
    # span a full refresh cycle so the carried-list staleness is in the
    # measured error, not just the refresh frame's exact flags
    errs = [float(jnp.abs(h_skip(i) - h_noskip(i)).max()) for i in range(8)]
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
        act=cfg.decoder.density_activation,
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
    sys.stdout.flush()
    sys.stderr.flush()
    # hard-exit (same rationale as bench.py): the tunnel client's C++
    # teardown can SIGABRT with the async worker's handles live; the JSON
    # contract line is already flushed
    os._exit(0)


if __name__ == "__main__":
    # positional overrides mirror run()'s own defaults — no literals here
    # so the CLI and run() can't drift apart
    _defaults = run.__defaults__
    main(*(
        type(_defaults[k])(sys.argv[k + 1]) if len(sys.argv) > k + 1
        else _defaults[k]
        for k in range(3)
    ))
