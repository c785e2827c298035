"""Host-side training loop: drives the jitted step, logs structured metrics,
checkpoints periodically, renders validation frames.

Observability upgrades over the reference (which prints tqdm lines and
appends to loss.txt, :934-940): metrics go to ``metrics.jsonl`` (one JSON
object per log event), run provenance (full config) is dumped once, and
auto-resume picks up the newest checkpoint after a preemption."""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dfanerf_tpu.config import ExperimentConfig
from dfanerf_tpu.data.dataset import FrameDataset
from dfanerf_tpu.train.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from dfanerf_tpu.train.state import init_train_state
from dfanerf_tpu.train.step import dataset_to_device, make_train_step


def train_loop(
    cfg: ExperimentConfig,
    ds: FrameDataset,
    n_iters: Optional[int] = None,
    resume: Optional[str] = "auto",
    run_dir: Optional[str] = None,
    on_metrics: Optional[Callable[[int, Dict[str, float]], None]] = None,
    profile_dir: Optional[str] = None,
    debug_nans: bool = False,
    val_render: bool = True,
):
    """Run training; returns the final state.

    Args:
        resume: checkpoint path, "auto" (newest in run_dir), or None.
        profile_dir: when set, capture a jax.profiler trace (xprof-
            compatible) of steps 10..20 into this directory.
        debug_nans: opt-in NaN detection (the reference leaves torch's
            detect_anomaly globally ON — run_nerf_helpers.py:5 — which is
            expensive; here it's a flag).
        val_render: render every-100th held-out frame at i_test_person
            steps, writing side-by-side pred|gt and logging PSNR (the
            reference's test-render loop, :943-1077).
    """
    if debug_nans:
        jax.config.update("jax_debug_nans", True)
    run_dir = run_dir or os.path.join(cfg.basedir, cfg.expname)
    os.makedirs(run_dir, exist_ok=True)
    cfg.save(os.path.join(run_dir, "config.json"))

    state = init_train_state(jax.random.PRNGKey(cfg.train.seed), cfg)
    if resume == "auto":
        resume = latest_checkpoint(run_dir)
    if resume:
        state = load_checkpoint(resume, state)
        print(f"[resume] {resume} at step {int(state['step'])}")

    data = dataset_to_device(ds)
    step_fn = make_train_step(cfg, ds)
    n_iters = n_iters or cfg.train.n_iters
    metrics_path = os.path.join(run_dir, "metrics.jsonl")

    key = jax.random.PRNGKey(cfg.train.seed + 1)
    start = int(state["step"])
    t0 = time.time()
    with open(metrics_path, "a") as mf:
        for i in range(start, n_iters):
            if profile_dir and i == start + 10:
                jax.profiler.start_trace(profile_dir)
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, data, sub)
            if profile_dir and i == start + 20:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                print(f"[profile] trace written to {profile_dir}")
            if (i + 1) % cfg.train.i_print == 0 or i == start:
                m = {k: float(v) for k, v in metrics.items()}
                m.update(step=i + 1, wall=round(time.time() - t0, 2))
                mf.write(json.dumps(m) + "\n")
                mf.flush()
                print(
                    f"[train] step {i+1} loss {m['loss']:.5f} "
                    f"psnr_head {m['psnr_head']:.2f} psnr_com {m['psnr_com']:.2f}"
                )
                if on_metrics:
                    on_metrics(i + 1, m)
            if val_render and (i + 1) % cfg.train.i_test_person == 0 and len(ds.i_val):
                _render_val(cfg, ds, data, state, run_dir, i + 1, mf)
            if (i + 1) % cfg.train.i_weights == 0:
                path = os.path.join(run_dir, f"{i+1:06d}.npz")
                save_checkpoint(path, state)
                print(f"[ckpt] {path}")
    return state


def _render_val(cfg, ds, data, state, run_dir, step, mf):
    """Held-out validation renders: every-100th val frame, side-by-side
    pred|gt jpg + PSNR into metrics.jsonl (the reference's loss.txt
    [TEST] lines)."""
    import imageio.v2 as imageio

    from dfanerf_tpu.render.renderer import render_video_frames

    out_dir = os.path.join(run_dir, f"test_{step}")
    os.makedirs(out_dir, exist_ok=True)
    idx = list(ds.i_val[::100]) or [int(ds.i_val[0])]
    frames, _ = render_video_frames(
        state, data, cfg, ds.hwfcxy, ds.near, ds.far, idx,
        pose_body=data["poses"][0],
        use_smoothing=int(state["step"]) >= cfg.signal.nosmo_iters,
    )
    psnrs = []
    for k, fi in enumerate(idx):
        gt = np.asarray(ds.imgs_com[fi])
        pred = frames[k]
        imageio.imwrite(
            os.path.join(out_dir, f"test_{k:03d}.jpg"),
            np.concatenate([pred, gt], axis=1),
        )
        mse = float(np.mean((pred.astype(np.float32) / 255 - gt.astype(np.float32) / 255) ** 2))
        psnrs.append(-10.0 * np.log10(max(mse, 1e-10)))
    m = {"step": step, "val_psnr": float(np.mean(psnrs)), "n_val": len(idx)}
    mf.write(json.dumps(m) + "\n")
    mf.flush()
    print(f"[val] step {step} psnr {m['val_psnr']:.2f} ({len(idx)} frames)")
