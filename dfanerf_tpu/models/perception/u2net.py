"""U^2-Net landmark-heatmap backbone (model-zoo alternative).

JAX/NHWC reimplementation of lib/models/face_u2net.py: the RSU (ReSidual
U-block) family expressed once, parameterized by depth, instead of five
near-identical torch classes:

- ``RSU-L`` (face_u2net.py RSU7/RSU6/RSU5/RSU4, :29-280): conv_in, an
  encoder chain of L-1 convs with ceil-mode 2x2 max-pools between them, a
  dilation-2 bottom conv, and a decoder chain with upsample+concat, plus
  the residual add of conv_in's output.
- ``RSU-4F`` (:282-315): the pooling-free variant — dilations 1/2/4/8 down,
  4/2/1 up.
- ``U2NET`` (:319-421): the full net the training tool instantiates with
  out_ch = NUM_FACE_JOINTS (tools/train_u2net.py:94) — six RSU stages with
  ceil-mode pools between, five decoder stages, six 3x3 side heads
  upsampled to stage-1 resolution, and a 1x1 fusion conv. Returns
  (d0, d2..d6) exactly like the reference forward (:398-420 — note d1 is
  produced but NOT returned there; quirk preserved).
- ``U2NETP_S5`` (:424-515): the small 5-stage variant, returns (d0, d1..d5).

Every conv is 3x3 (side heads) or 3x3-dilated (RSU bodies) except the 1x1
fusion; upsampling is bilinear with half-pixel centers (torch
F.upsample(mode='bilinear', align_corners=False), :22-26).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Mapping, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dfanerf_tpu.models.perception.common import (
    _np32,
    batchnorm,
    bn_from_torch,
    conv2d,
    conv_from_torch,
)

Params = Dict[str, Any]

# (stage encoder spec, decoder spec) for the full U2NET:
# each entry: (rsu_depth_or_'F', in_ch, mid_ch, out_ch)
U2NET_STAGES = (
    (7, 3, 32, 64),
    (6, 64, 32, 128),
    (5, 128, 64, 256),
    (4, 256, 128, 512),
    ("F", 512, 256, 512),
    ("F", 512, 256, 512),
)
U2NET_DECODE = (
    ("F", 1024, 256, 512),
    (4, 1024, 128, 256),
    (5, 512, 64, 128),
    (6, 256, 32, 64),
    (7, 128, 16, 64),
)
U2NETP_S5_STAGES = (
    (6, 3, 16, 64),
    (5, 64, 16, 64),
    (4, 64, 16, 64),
    ("F", 64, 16, 64),
    ("F", 64, 16, 64),
)
U2NETP_S5_DECODE = (
    ("F", 128, 16, 64),
    (4, 128, 16, 64),
    (5, 128, 16, 64),
    (6, 128, 16, 64),
)


def _init_rebnconv(key, c_in, c_out):
    k1, _ = jax.random.split(key)
    fan = c_in * 9
    bound = 1.0 / math.sqrt(fan)
    ks = jax.random.split(k1, 2)
    return {
        "conv": {
            "w": jax.random.uniform(ks[0], (3, 3, c_in, c_out), jnp.float32,
                                    -bound, bound),
            "b": jax.random.uniform(ks[1], (c_out,), jnp.float32, -bound, bound),
        },
        "bn": {
            "gamma": jnp.ones((c_out,)),
            "beta": jnp.zeros((c_out,)),
            "mean": jnp.zeros((c_out,)),
            "var": jnp.ones((c_out,)),
        },
    }


def _rebnconv(p, x, dirate=1):
    x = conv2d(p["conv"], x, padding=dirate, dilation=dirate)
    return jax.nn.relu(batchnorm(p["bn"], x))


def _pool_ceil(x):
    """2x2 stride-2 max pool with ceil_mode=True (odd sizes round up)."""
    h, w = x.shape[1], x.shape[2]
    pad_h, pad_w = h % 2, w % 2
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
        ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
    )


def _upsample_like(src, tar):
    return jax.image.resize(
        src, (src.shape[0], tar.shape[1], tar.shape[2], src.shape[3]), "linear"
    )


def init_rsu(key, depth, c_in, mid, c_out) -> Params:
    """depth = 4..7 for pooled RSUs, 'F' for the dilation-only RSU4F."""
    n_enc = 4 if depth == "F" else depth
    keys = iter(jax.random.split(key, 2 * n_enc + 2))
    p = {"in": _init_rebnconv(next(keys), c_in, c_out)}
    p["enc"] = [_init_rebnconv(next(keys), c_out, mid)]
    for _ in range(n_enc - 1):
        p["enc"].append(_init_rebnconv(next(keys), mid, mid))
    p["dec"] = [
        _init_rebnconv(next(keys), mid * 2, mid) for _ in range(n_enc - 2)
    ]
    p["dec"].append(_init_rebnconv(next(keys), mid * 2, c_out))
    return p


def apply_rsu(p: Params, x: jnp.ndarray, depth) -> jnp.ndarray:
    hxin = _rebnconv(p["in"], x)
    if depth == "F":
        dirates = (1, 2, 4, 8)
        hs = []
        h = hxin
        for q, d in zip(p["enc"], dirates):
            h = _rebnconv(q, h, d)
            hs.append(h)
        h = hs[-1]
        for i, q in enumerate(p["dec"]):
            lvl = len(hs) - 2 - i
            h = _rebnconv(q, jnp.concatenate([h, hs[lvl]], -1), dirates[lvl])
        return h + hxin
    n_enc = depth
    hs = []
    h = hxin
    for i, q in enumerate(p["enc"][:-1]):
        h = _rebnconv(q, h)
        hs.append(h)
        if i < n_enc - 2:
            h = _pool_ceil(h)
    h = _rebnconv(p["enc"][-1], h, dirate=2)  # bottom conv, no pooling
    for i, q in enumerate(p["dec"]):
        lvl = len(hs) - 1 - i
        h = _rebnconv(q, jnp.concatenate([h, hs[lvl]], -1))
        if lvl > 0:
            h = _upsample_like(h, hs[lvl - 1])
    return h + hxin


def _init_side(key, c_in, c_out):
    ks = jax.random.split(key, 2)
    bound = 1.0 / math.sqrt(c_in * 9)
    return {
        "w": jax.random.uniform(ks[0], (3, 3, c_in, c_out), jnp.float32,
                                -bound, bound),
        "b": jax.random.uniform(ks[1], (c_out,), jnp.float32, -bound, bound),
    }


def init_u2net(key, out_ch: int = 68, small: bool = False) -> Params:
    stages = U2NETP_S5_STAGES if small else U2NET_STAGES
    decode = U2NETP_S5_DECODE if small else U2NET_DECODE
    n_side = len(stages)
    keys = iter(jax.random.split(key, len(stages) + len(decode) + n_side + 1))
    p = {
        "stages": [init_rsu(next(keys), d, ci, m, co) for d, ci, m, co in stages],
        "decode": [init_rsu(next(keys), d, ci, m, co) for d, ci, m, co in decode],
        "sides": [],
    }
    side_in = ([64] * 6) if small else [64, 64, 128, 256, 512, 512]
    for i in range(n_side):
        p["sides"].append(_init_side(next(keys), side_in[i], out_ch))
    fuse_in = out_ch * n_side
    kf = jax.random.split(next(keys), 2)
    bound = 1.0 / math.sqrt(fuse_in)
    p["fuse"] = {
        "w": jax.random.uniform(kf[0], (1, 1, fuse_in, out_ch), jnp.float32,
                                -bound, bound),
        "b": jax.random.uniform(kf[1], (out_ch,), jnp.float32, -bound, bound),
    }
    return p


def apply_u2net(p: Params, x: jnp.ndarray, small: bool = False):
    """x [N, H, W, 3] -> (d0, side maps...) each [N, H, W, out_ch].

    Full U2NET returns (d0, d2, d3, d4, d5, d6) — the reference drops d1
    from the return (face_u2net.py:420); the small variant returns
    (d0, d1..d5) (:514)."""
    stages = U2NETP_S5_STAGES if small else U2NET_STAGES
    hs = []
    h = x
    for i, (d, *_rest) in enumerate(stages):
        h = apply_rsu(p["stages"][i], h, d)
        hs.append(h)
        if i < len(stages) - 1:
            h = _pool_ceil(h)
    decode = U2NETP_S5_DECODE if small else U2NET_DECODE
    h = hs[-1]
    decs = []  # hx5d..hx1d (full) / hx4d..hx1d (small)
    for i, (d, *_rest) in enumerate(decode):
        lvl = len(hs) - 2 - i
        h = _upsample_like(h, hs[lvl])
        h = apply_rsu(p["decode"][i], jnp.concatenate([h, hs[lvl]], -1), d)
        decs.append(h)

    # side outputs: d1 from the last decoder ... dN from the deepest stage
    side_feats = decs[::-1] + [hs[-1]]
    sides = []
    for q, f in zip(p["sides"], side_feats):
        s = conv2d(q, f, padding=1)
        sides.append(_upsample_like(s, side_feats[0]) if f is not side_feats[0]
                     else s)
    d0 = conv2d(p["fuse"], jnp.concatenate(sides, -1))
    if small:
        return (d0, *sides)
    return (d0, *sides[1:])


# --- converter ---------------------------------------------------------------


def u2net_from_torch(sd: Mapping[str, Any], out_ch: int = 68,
                     small: bool = False) -> Params:
    """Map a torch U2NET/U2NETP_S5 state dict onto the JAX pytree."""
    def reb(prefix):
        return {
            "conv": conv_from_torch(sd, f"{prefix}.conv_s1"),
            "bn": bn_from_torch(sd, f"{prefix}.bn_s1"),
        }

    def rsu(prefix, depth):
        n_enc = 4 if depth == "F" else depth
        return {
            "in": reb(f"{prefix}.rebnconvin"),
            "enc": [reb(f"{prefix}.rebnconv{i + 1}") for i in range(n_enc)],
            "dec": [
                reb(f"{prefix}.rebnconv{n_enc - 1 - i}d") for i in range(n_enc - 1)
            ],
        }

    stages = U2NETP_S5_STAGES if small else U2NET_STAGES
    decode = U2NETP_S5_DECODE if small else U2NET_DECODE
    p = {
        "stages": [
            rsu(f"stage{i + 1}", d) for i, (d, *_r) in enumerate(stages)
        ],
        "decode": [
            rsu(f"stage{len(stages) - 1 - i}d", d)
            for i, (d, *_r) in enumerate(decode)
        ],
        "sides": [
            conv_from_torch(sd, f"side{i + 1}") for i in range(len(stages))
        ],
        "fuse": conv_from_torch(sd, "outconv"),
    }
    return p
