"""Checkpointing: the full train-state pytree (networks, optimizer moments,
latents, step) — the same logical contents as the reference's 10-entry .tar
(run_nerf_com_trainExpLater.py:1099-1115) — saved as a compressed npz of
flattened leaves. Loading tolerates missing keys the way the reference's
resume does (:553-580): absent groups keep their freshly-initialized values,
so checkpoints from earlier capability stages still load."""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree: Any, prefix: str = "") -> dict:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_checkpoint(path: str, state: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **_flatten(state))


def load_checkpoint(path: str, template: Any) -> Any:
    """Restore into the shape of ``template``; missing keys keep template
    values (tolerant resume), extra keys in the file are ignored."""
    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        path = path + ".npz"  # np.savez appends .npz to suffixless paths
    data = np.load(path)
    keys = set(data.keys())

    def restore(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: restore(v, f"{prefix}{k}/") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            seq = [restore(v, f"{prefix}{i}/") for i, v in enumerate(tree)]
            return type(tree)(seq) if isinstance(tree, tuple) else seq
        key = prefix[:-1]
        if key in keys:
            return jnp.asarray(data[key])
        return tree

    return restore(template)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Newest ``{step:06d}.npz`` in a run dir (auto-resume support — the
    failure-recovery capability the reference leaves manual)."""
    paths = glob.glob(os.path.join(ckpt_dir, "*.npz"))
    best, best_step = None, -1
    for p in paths:
        m = re.match(r"(\d+)\.npz$", os.path.basename(p))
        if m and int(m.group(1)) > best_step:
            best, best_step = p, int(m.group(1))
    return best
