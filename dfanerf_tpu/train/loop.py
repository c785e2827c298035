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
):
    """Run training; returns the final state.

    Args:
        resume: checkpoint path, "auto" (newest in run_dir), or None.
    """
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
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, data, sub)
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
            if (i + 1) % cfg.train.i_weights == 0:
                path = os.path.join(run_dir, f"{i+1:06d}.npz")
                save_checkpoint(path, state)
                print(f"[ckpt] {path}")
    return state
