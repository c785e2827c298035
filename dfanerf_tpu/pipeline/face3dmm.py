"""Basel-style 3DMM face model as pure-function linear bases.

Re-design of the reference ``Face_3DMM`` (face_tracking_ba/facemodel.py:
7-68): bases are loaded once (binary layout documented below), scaled by
1/1000 into the working unit, the mean shape is centered per axis, and the
per-component sigmas premultiply the parameters. Geometry synthesis is a
single [B, K] x [K, 3P] matmul — textbook MXU work.

Binary asset layout (the reference gitignores its ``3DMM/`` directory; the
assets are external — same policy here):
    sub_b_shape.bin  float32 [>=id_dim, 3*point_num]   identity basis
    sub_mushape.bin  float32 [3*point_num]             identity mean
    sub_b_exp.bin    float32 [>=exp_dim, 3*point_num]  expression basis
    sub_muexp.bin    float32 [3*point_num]             expression mean
    sub_b_tex.bin    float32 [>=tex_dim, 3*point_num]  texture basis
    sub_mutex.bin    float32 [3*point_num]             texture mean
    sig_shape.bin / sig_exp.bin / sig_tex.bin          per-component sigmas
    lands_info.txt   int32 landmark vertex indices (last 51 = non-jaw 68-set)
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class Face3DMM:
    base_id: jnp.ndarray    # [id_dim, 3P] (already /1000)
    base_exp: jnp.ndarray   # [exp_dim, 3P] (already /1000)
    mu: jnp.ndarray         # [3P] centered mean (already /1000)
    base_tex: jnp.ndarray   # [tex_dim, 3P]
    mu_tex: jnp.ndarray     # [3P]
    sig_id: jnp.ndarray     # [id_dim]
    sig_exp: jnp.ndarray    # [exp_dim]
    sig_tex: jnp.ndarray    # [tex_dim]
    lands_info: Optional[np.ndarray] = None  # landmark vertex ids

    @property
    def point_num(self) -> int:
        return self.mu.shape[0] // 3


def load_face3dmm(
    modelpath: str,
    id_dim: int = 100,
    exp_dim: int = 79,
    tex_dim: int = 100,
    point_num: int = 34650,
) -> Face3DMM:
    def load(name):
        return np.fromfile(os.path.join(modelpath, name), np.float32)

    base_id = load("sub_b_shape.bin").reshape(-1, 3 * point_num)[:id_dim]
    base_exp = load("sub_b_exp.bin").reshape(-1, 3 * point_num)[:exp_dim]
    mu = (load("sub_mushape.bin") + load("sub_muexp.bin")).reshape(-1, 3)
    mu = mu - mu.mean(axis=0, keepdims=True)
    lands = None
    lands_path = os.path.join(modelpath, "lands_info.txt")
    if os.path.isfile(lands_path):
        lands = np.loadtxt(lands_path, dtype=np.int32)
    return Face3DMM(
        base_id=jnp.asarray(base_id / 1000.0),
        base_exp=jnp.asarray(base_exp / 1000.0),
        mu=jnp.asarray(mu.reshape(-1) / 1000.0),
        base_tex=jnp.asarray(load("sub_b_tex.bin").reshape(-1, 3 * point_num)[:tex_dim]),
        mu_tex=jnp.asarray(load("sub_mutex.bin")),
        sig_id=jnp.asarray(load("sig_shape.bin")[:id_dim]),
        sig_exp=jnp.asarray(load("sig_exp.bin")[:exp_dim]),
        sig_tex=jnp.asarray(load("sig_tex.bin")[:tex_dim]),
        lands_info=lands,
    )


def make_synthetic_3dmm(
    key: jax.Array, point_num: int = 200, id_dim: int = 20, exp_dim: int = 12,
    tex_dim: int = 8,
) -> Face3DMM:
    """Random small 3DMM for tests — same shapes/semantics, no assets."""
    ks = jax.random.split(key, 6)
    mu = jax.random.normal(ks[0], (point_num, 3)) * 80.0
    mu = (mu - mu.mean(0)).reshape(-1)
    return Face3DMM(
        base_id=jax.random.normal(ks[1], (id_dim, 3 * point_num)) * 2e-3,
        base_exp=jax.random.normal(ks[2], (exp_dim, 3 * point_num)) * 1e-3,
        mu=mu / 1000.0,
        base_tex=jax.random.normal(ks[3], (tex_dim, 3 * point_num)),
        mu_tex=jnp.zeros((3 * point_num,)),
        sig_id=jnp.abs(jax.random.normal(ks[4], (id_dim,))) + 0.5,
        sig_exp=jnp.abs(jax.random.normal(ks[5], (exp_dim,))) + 0.5,
        sig_tex=jnp.ones((tex_dim,)),
        lands_info=np.arange(point_num, dtype=np.int32),
    )


def forward_geo(model: Face3DMM, id_para: jnp.ndarray, exp_para: jnp.ndarray):
    """[B, id_dim], [B, exp_dim] -> [B, P, 3] world geometry."""
    g = (id_para * model.sig_id) @ model.base_id + (
        exp_para * model.sig_exp
    ) @ model.base_exp + model.mu
    return g.reshape(-1, model.point_num, 3)


def forward_geo_sub(
    model: Face3DMM, id_para: jnp.ndarray, exp_para: jnp.ndarray,
    sub_index: jnp.ndarray,
):
    """Geometry restricted to a vertex subset (e.g. the 51 non-jaw
    landmarks) — the fit-time hot path. sub_index: [K] vertex ids."""
    cols = (3 * sub_index[:, None] + jnp.arange(3)[None, :]).reshape(-1)
    g = (id_para * model.sig_id) @ model.base_id[:, cols] + (
        exp_para * model.sig_exp
    ) @ model.base_exp[:, cols] + model.mu[cols]
    return g.reshape(-1, sub_index.shape[0], 3)


def forward_tex(model: Face3DMM, tex_para: jnp.ndarray):
    t = (tex_para * model.sig_tex) @ model.base_tex + model.mu_tex
    return t.reshape(-1, model.point_num, 3)
