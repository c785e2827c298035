"""Expression disentanglement: split a 79-dim 3DMM expression code into a
mouth part and an everything-else part (the "DFA" in DFA-NeRF).

Re-design of face_disentangle_3dmm (reference network.py:8-90,
train_with_cycle.py:120-240, test_model.py:93-129):

- ``Distangler``: 79 -> 128 -> 256 -> 256 shared trunk, then two linear
  branches (others: dim_o, mouth: dim_m; shipped checkpoints use 64/32).
- ``Concatenater``: inverse map (dim_o + dim_m) -> 128 -> 256 -> 79.
- ``MouthExp2KptsNet``: mouth code -> mouth landmark offsets (training
  tooling; Linear+BatchNorm+ReLU stack).

Training = mouth-swap + cycle consistency: split each batch in half, swap
mouth codes between halves, supervise via 3DMM LANDMARK geometry (mouth
landmarks 31:51 must follow the donor, others 0:31 must stay), re-
disentangle the swapped codes and require the cycle to reconstruct the
original geometry. Quirk faithfully noted: the reference comments out
``loss_lan.backward`` (train_with_cycle.py:177) so ONLY the cycle loss
actually trains there; we expose ``swap_weight`` (default 1.0 — the loss
the architecture was designed for) and setting it to 0 reproduces the
reference's effective objective.

Inference (pipeline step 10) maps per-frame exp params to
{'exp_o': [N, dim_o], 'exp_m': [N, dim_m]} — the trainer consumes exp_o.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dfanerf_tpu.models.layers import init_linear, linear
from dfanerf_tpu.pipeline.face3dmm import Face3DMM, forward_geo_sub
from dfanerf_tpu.train.optim import adam_init, adam_update

Params = Dict[str, Any]

MOUTH_IDX = (31, 51)   # landmark rows [31, 51) of the last-51 set
OTHER_IDX = (0, 31)


# --- networks ---------------------------------------------------------------


def init_distangler(key, input_dim=79, dim_o=64, dim_m=32) -> Params:
    ks = jax.random.split(key, 5)
    return {
        "fc1": init_linear(ks[0], input_dim, 128),
        "fc2": init_linear(ks[1], 128, 256),
        "fc3": init_linear(ks[2], 256, 256),
        "branch1": init_linear(ks[3], 256, dim_o),
        "branch2": init_linear(ks[4], 256, dim_m),
    }


def apply_distangler(p: Params, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    h = jax.nn.relu(linear(p["fc1"], x))
    h = jax.nn.relu(linear(p["fc2"], h))
    h = jax.nn.relu(linear(p["fc3"], h))
    return linear(p["branch1"], h), linear(p["branch2"], h)


def init_concatenater(key, dim_o=64, dim_m=32, output_dim=79) -> Params:
    ks = jax.random.split(key, 3)
    return {
        "fc1": init_linear(ks[0], dim_o + dim_m, 128),
        "fc2": init_linear(ks[1], 128, 256),
        "fc3": init_linear(ks[2], 256, output_dim),
    }


def apply_concatenater(p: Params, x_o: jnp.ndarray, x_m: jnp.ndarray) -> jnp.ndarray:
    x = jnp.concatenate([x_o, x_m], axis=-1)
    h = jax.nn.relu(linear(p["fc1"], x))
    h = jax.nn.relu(linear(p["fc2"], h))
    return linear(p["fc3"], h)


def init_mouth_exp2kpts(
    key, input_dims=32, hidden_dims=64, num_hidden_layers=0, output_dims=40
) -> Params:
    ks = jax.random.split(key, 2 + num_hidden_layers)
    p = {
        "input": init_linear(ks[0], input_dims, hidden_dims),
        "input_bn": {
            "gamma": jnp.ones((hidden_dims,)),
            "beta": jnp.zeros((hidden_dims,)),
            "mean": jnp.zeros((hidden_dims,)),
            "var": jnp.ones((hidden_dims,)),
        },
        "hidden": [init_linear(ks[1 + i], hidden_dims, hidden_dims)
                   for i in range(num_hidden_layers)],
        "hidden_bn": [
            {
                "gamma": jnp.ones((hidden_dims,)),
                "beta": jnp.zeros((hidden_dims,)),
                "mean": jnp.zeros((hidden_dims,)),
                "var": jnp.ones((hidden_dims,)),
            }
            for _ in range(num_hidden_layers)
        ],
        "output": init_linear(ks[-1], hidden_dims, output_dims),
    }
    return p


def _bn(bn, x, train: bool, eps=1e-5):
    if train:
        mean = x.mean(0)
        var = x.var(0)
    else:
        mean, var = bn["mean"], bn["var"]
    return bn["gamma"] * (x - mean) / jnp.sqrt(var + eps) + bn["beta"]


def apply_mouth_exp2kpts(p: Params, x: jnp.ndarray, train: bool = False):
    h = jax.nn.relu(_bn(p["input_bn"], linear(p["input"], x), train))
    for lin, bn in zip(p["hidden"], p["hidden_bn"]):
        h = jax.nn.relu(_bn(bn, linear(lin, h), train))
    return linear(p["output"], h)


# --- torch checkpoint converters (pretrained_models/{64_32,32_16}) ----------


def distangler_from_torch(sd) -> Params:
    from dfanerf_tpu.compat.torch_ckpt import _lin

    return {k: _lin(sd, k) for k in ("fc1", "fc2", "fc3", "branch1", "branch2")}


def concatenater_from_torch(sd) -> Params:
    from dfanerf_tpu.compat.torch_ckpt import _lin

    return {k: _lin(sd, k) for k in ("fc1", "fc2", "fc3")}


# --- training ---------------------------------------------------------------


def make_disentangle_train_step(
    model: Face3DMM,
    lands_idx: jnp.ndarray,
    lr: float = 1e-3,
    coord_dim: int = 2,
    swap_weight: float = 1.0,
    use_vec_loss: bool = False,
    use_exp_loss: bool = False,
    id_dim: int = 100,
):
    """Jitted mouth-swap + cycle train step over an exp batch [B, 79]."""
    mouth = slice(*MOUTH_IDX)
    other = slice(*OTHER_IDX)

    def geo(exp):
        zid = jnp.zeros((exp.shape[0], id_dim))
        return forward_geo_sub(model, zid, exp, lands_idx)

    def loss_fn(params, exp_batch):
        dis, cat = params["dis"], params["cat"]
        half = exp_batch.shape[0] // 2
        e1, e2 = exp_batch[:half], exp_batch[half:]
        o1, m1 = apply_distangler(dis, e1)
        o2, m2 = apply_distangler(dis, e2)
        e_1o2m = apply_concatenater(cat, o1, m2)
        e_2o1m = apply_concatenater(cat, o2, m1)
        g1 = jax.lax.stop_gradient(geo(e1))
        g2 = jax.lax.stop_gradient(geo(e2))
        g_sw1 = geo(e_1o2m)
        g_sw2 = geo(e_2o1m)

        def ll(a, b):
            return jnp.mean((a[..., :coord_dim] - b[..., :coord_dim]) ** 2)

        loss_swap = (
            ll(g_sw1[:, other], g1[:, other]) + ll(g_sw1[:, mouth], g2[:, mouth])
            + ll(g_sw2[:, other], g2[:, other]) + ll(g_sw2[:, mouth], g1[:, mouth])
        )

        # cycle: re-disentangle the swapped codes, swap back, compare geometry
        o1b, m2b = apply_distangler(dis, e_1o2m)
        o2b, m1b = apply_distangler(dis, e_2o1m)
        e_back1 = apply_concatenater(cat, o1b, m1b)
        e_back2 = apply_concatenater(cat, o2b, m2b)
        loss_cycle = ll(geo(e_back1), g1) + ll(geo(e_back2), g2)
        if use_vec_loss:
            loss_cycle = loss_cycle + (
                jnp.abs(o1b - o1).mean() + jnp.abs(o2b - o2).mean()
                + jnp.abs(m1b - m1).mean() + jnp.abs(m2b - m2).mean()
            )
        if use_exp_loss:
            loss_cycle = loss_cycle + jnp.mean((e1 - e_back1) ** 2) + jnp.mean(
                (e2 - e_back2) ** 2
            )
        total = swap_weight * loss_swap + loss_cycle
        return total, {"swap": loss_swap, "cycle": loss_cycle}

    @jax.jit
    def step(params, opt, exp_batch, lr_now):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, exp_batch
        )
        params, opt = adam_update(opt, grads, params, lr_now, jnp.int32(1))
        aux["total"] = loss
        return params, opt, aux

    def init(key, dim_o=64, dim_m=32):
        k1, k2 = jax.random.split(key)
        params = {
            "dis": init_distangler(k1, dim_o=dim_o, dim_m=dim_m),
            "cat": init_concatenater(k2, dim_o=dim_o, dim_m=dim_m),
        }
        return params, adam_init(params)

    return init, step


def disentangle_sequence(
    dis_params: Params, exps: jnp.ndarray
) -> Dict[str, np.ndarray]:
    """Inference (pipeline step 10b): per-frame exp [N,79] -> the
    ``{id}_64_32.pt`` contract {'exp_o', 'exp_m'}."""
    o, m = jax.jit(apply_distangler)(dis_params, exps)
    return {"exp_o": np.asarray(o), "exp_m": np.asarray(m)}
