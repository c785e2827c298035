"""Per-identity 3DMM landmark fitting and bundle adjustment — jitted.

Re-design of the reference's two most expensive CPU/GPU-Python loops:

- ``face_tracker.py`` runs 20 sequential focal candidates x 2000 Adam steps
  (each step a Python-side optimizer round-trip), then a full-sequence
  refit. Here a single fit is ONE jitted ``lax.fori_loop`` (fixed-shape
  batched matmuls + fused Adam — ideal MXU work), and the focal sweep is a
  ``vmap`` over all candidates at once: 20 independent fits evaluate as one
  batched program instead of 20 serial runs.
- ``bundle_adjustment.py`` (200 pts-only + 1000 joint Adam steps) becomes
  two fori_loop fits in one jit.

Semantics preserved: landmark MSE on the last 51 landmarks, id reg x8,
exp reg x0.5, id/exp optimizers gated to iter > 1000, Adam lr 0.3
(face_tracker.py:61-141); BA phases with lr 1e-2 / 1e-4
(bundle_adjustment.py:39-60).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dfanerf_tpu.core.geometry import forward_transform
from dfanerf_tpu.pipeline.face3dmm import Face3DMM, forward_geo_sub
from dfanerf_tpu.train.optim import adam_init, adam_update


class TrackParams(NamedTuple):
    """Contents of track_params_ba.pt (face_tracker.py:144-146)."""

    id: jnp.ndarray      # [1, id_dim]
    exp: jnp.ndarray     # [N, exp_dim]
    euler: jnp.ndarray   # [N, 3]
    trans: jnp.ndarray   # [N, 3]
    focal: jnp.ndarray   # [1]


def lan_loss(proj: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean squared landmark error (util.py cal_lan_loss)."""
    return jnp.mean((proj - target) ** 2)


def _fit_once(
    model: Face3DMM,
    lms: jnp.ndarray,       # [N, 51, 2] target landmarks (already last-51)
    lands_idx: jnp.ndarray, # [51] vertex indices
    focal: jnp.ndarray,     # scalar
    cxy: jnp.ndarray,       # [2]
    n_iters: int,
    id_dim: int,
    exp_dim: int,
    id_exp_after: int = 1000,
    lr: float = 0.3,
):
    """One full landmark fit at a fixed focal; returns params + final loss."""
    n = lms.shape[0]
    params = {
        "id": jnp.zeros((1, id_dim)),
        "exp": jnp.zeros((n, exp_dim)),
        "euler": jnp.zeros((n, 3)),
        "trans": jnp.zeros((n, 3)).at[:, 2].add(-600.0),
    }
    # three optimizers like the reference: id, exp, frame(euler+trans)
    opt = {
        "id": adam_init(params["id"]),
        "exp": adam_init(params["exp"]),
        "frame": adam_init({"euler": params["euler"], "trans": params["trans"]}),
    }

    def loss_fn(p):
        geometry = forward_geo_sub(
            model, jnp.broadcast_to(p["id"], (n, id_dim)), p["exp"], lands_idx
        )
        proj = forward_transform(geometry, p["euler"], p["trans"], focal, cxy)
        l_lan = lan_loss(proj[..., :2], lms)
        l_reg = jnp.mean(p["id"] ** 2) * 8.0 + jnp.mean(p["exp"] ** 2) * 0.5
        return l_lan + l_reg, l_lan

    grad_fn = jax.grad(loss_fn, has_aux=True)

    def body(i, carry):
        p, opt_s, _ = carry
        g, l_lan = grad_fn(p)
        gate_idexp = (i > id_exp_after).astype(jnp.int32)
        one = jnp.int32(1)
        new_id, opt_id = adam_update(opt_s["id"], g["id"], p["id"], lr, gate_idexp)
        new_exp, opt_exp = adam_update(opt_s["exp"], g["exp"], p["exp"], lr, gate_idexp)
        frame_p = {"euler": p["euler"], "trans": p["trans"]}
        frame_g = {"euler": g["euler"], "trans": g["trans"]}
        new_frame, opt_fr = adam_update(opt_s["frame"], frame_g, frame_p, lr, one)
        p2 = {"id": new_id, "exp": new_exp, **new_frame}
        return p2, {"id": opt_id, "exp": opt_exp, "frame": opt_fr}, l_lan

    params, _, final_lan = jax.lax.fori_loop(
        0, n_iters, body, (params, opt, jnp.float32(0.0))
    )
    return params, final_lan


def fit_landmarks(
    model: Face3DMM,
    lms: jnp.ndarray,
    cxy,
    focal_candidates=tuple(range(500, 1500, 50)),
    sweep_stride: int = 10,
    n_iters: int = 2000,
    id_dim: int = 100,
    exp_dim: int = 79,
) -> Tuple[TrackParams, float]:
    """Full tracker: vmapped focal sweep on every ``sweep_stride``-th frame,
    then a full-sequence fit at the winning focal.

    Args:
        lms: [N, 68, 2] detected landmarks (the fit uses the last 51).
    Returns:
        (TrackParams, final landmark loss).
    """
    cxy = jnp.asarray(cxy, jnp.float32)
    lands_idx = jnp.asarray(model.lands_info[-51:], jnp.int32)
    target = lms[:, -51:, :].astype(jnp.float32)

    sweep_target = target[::sweep_stride]
    focals = jnp.asarray(focal_candidates, jnp.float32)

    @jax.jit
    def sweep(focals):
        fit = lambda f: _fit_once(
            model, sweep_target, lands_idx, f, cxy, n_iters, id_dim, exp_dim
        )[1]
        return jax.vmap(fit)(focals)

    losses = sweep(focals)
    best = int(jnp.argmin(losses))
    best_focal = jnp.float32(focal_candidates[best])

    @jax.jit
    def full_fit(focal):
        return _fit_once(
            model, target, lands_idx, focal, cxy, n_iters, id_dim, exp_dim
        )

    params, final_lan = full_fit(best_focal)
    return (
        TrackParams(
            id=params["id"],
            exp=params["exp"],
            euler=params["euler"],
            trans=params["trans"],
            focal=best_focal[None],
        ),
        float(final_lan),
    )


def bundle_adjust(
    track_xys: jnp.ndarray,   # [N, K, 2] flow-tracked keypoints
    euler: jnp.ndarray,       # [N, 3] from the tracker
    trans: jnp.ndarray,       # [N, 3] (caller divides by 1000 like the
                              #  reference: bundle_adjustment.py:26)
    focal: jnp.ndarray,
    cxy,
    iters_pts: int = 200,
    iters_joint: int = 1000,
) -> Dict[str, jnp.ndarray]:
    """Two-phase bundle adjustment; returns {'euler','trans','focal'}
    (the bundle_adjustment.pt contract)."""
    cxy = jnp.asarray(cxy, jnp.float32)
    n, k = track_xys.shape[0], track_xys.shape[1]

    @jax.jit
    def run(track_xys, euler, trans, focal):
        def proj_loss(pts, eul, tr):
            proj = forward_transform(
                jnp.broadcast_to(pts[None], (n, k, 3)), eul, tr, focal, cxy
            )
            return lan_loss(proj[..., :2], track_xys)

        # phase 1: 3D points only, lr 1e-2
        pts = jnp.zeros((k, 3))
        opt = adam_init(pts)
        one = jnp.int32(1)

        def body1(i, carry):
            pts, opt = carry
            g = jax.grad(proj_loss, argnums=0)(pts, euler, trans)
            pts, opt = adam_update(opt, g, pts, 1e-2, one)
            return pts, opt

        pts, _ = jax.lax.fori_loop(0, iters_pts, body1, (pts, opt))

        # phase 2: joint pts + pose, lr 1e-4
        joint = {"pts": pts, "euler": euler, "trans": trans}
        opt2 = adam_init(joint)

        def body2(i, carry):
            j, opt = carry
            g = jax.grad(lambda q: proj_loss(q["pts"], q["euler"], q["trans"]))(j)
            j, opt = adam_update(opt, g, j, 1e-4, one)
            return j, opt

        joint, _ = jax.lax.fori_loop(0, iters_joint, body2, (joint, opt2))
        loss = proj_loss(joint["pts"], joint["euler"], joint["trans"])
        return joint, loss

    joint, loss = run(jnp.asarray(track_xys, jnp.float32), euler, trans, focal)
    return {
        "euler": joint["euler"],
        "trans": joint["trans"],
        "focal": jnp.asarray(focal),
        "pts": joint["pts"],
        "loss": float(loss),
    }
