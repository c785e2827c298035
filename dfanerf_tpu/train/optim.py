"""Staged Adam: per-group Adam with traced on/off gates.

The reference builds five torch.optim.Adam instances and steps a subset of
them depending on the global step (run_nerf_com_trainExpLater.py:916-931):
decoder and AudNet always; AudAttNet/PoseAttNet only once
``step >= nosmo_iters``; ExpNet only once ``step >= noexp_iters``. A gated
group's moments and step-count must NOT advance while it is off — torch
Adam semantics. Each group also carries its own learning-rate multiplier
(the attention nets train at 2x: :1090-1094).

Expressed here as a pure pytree transform with a traced ``gate`` scalar, so
the whole 600k-step schedule runs inside a single compiled program with no
stage recompiles.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Pytree = Any


def adam_init(params: Pytree) -> Dict[str, Pytree]:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return {
        "m": zeros,
        "v": jax.tree.map(jnp.zeros_like, params),
        "t": jnp.zeros((), jnp.int32),
    }


def adam_update(
    opt: Dict[str, Pytree],
    grads: Pytree,
    params: Pytree,
    lr: jnp.ndarray,
    gate: jnp.ndarray,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> Tuple[Pytree, Dict[str, Pytree]]:
    """One (possibly gated-off) Adam step. ``gate`` is a traced 0/1 scalar;
    when 0, params, moments, and step count are all left untouched."""
    g = gate.astype(jnp.float32)
    t = opt["t"] + gate.astype(jnp.int32)
    tf = jnp.maximum(t.astype(jnp.float32), 1.0)
    c1 = 1.0 - b1 ** tf
    c2 = 1.0 - b2 ** tf

    m_new = jax.tree.map(
        lambda m, gr: jnp.where(g > 0, b1 * m + (1.0 - b1) * gr, m),
        opt["m"],
        grads,
    )
    v_new = jax.tree.map(
        lambda v, gr: jnp.where(g > 0, b2 * v + (1.0 - b2) * gr * gr, v),
        opt["v"],
        grads,
    )
    params_new = jax.tree.map(
        lambda p, m, v: p - g * lr * (m / c1) / (jnp.sqrt(v / c2) + eps),
        params,
        m_new,
        v_new,
    )
    return params_new, {"m": m_new, "v": v_new, "t": t}


def exp_decay_lr(
    step: jnp.ndarray, lrate: float, lrate_decay: int, decay_unit: int = 1500
) -> jnp.ndarray:
    """lr(step) = lrate * 0.1^(step / (lrate_decay * decay_unit)) — the
    reference schedule at run_nerf_com_trainExpLater.py:1081-1083."""
    decay_steps = float(lrate_decay * decay_unit)
    return lrate * jnp.power(0.1, step.astype(jnp.float32) / decay_steps)
