"""GhostNet eye-landmark encoder-decoder — functional JAX reimplementation
of lib/models/eye_encoder_decoder_300w.py with the shipped
eye_300w_menpo/ghostnet_en_de.yaml configuration: grayscale 48x32 eye crop
-> 6-keypoint heatmaps at 24x16 via GhostModules (primary conv + cheap
depthwise 'ghost' features), SE layers (clamped [0,1] gate) and bilinear
upsampling decoder blocks.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp

from dfanerf_tpu.models.perception.common import (
    batchnorm,
    bn_from_torch,
    conv2d,
    conv_from_torch,
    init_bn,
    init_conv,
)

Params = Dict[str, Any]

# (kernel, hidden, out, use_se, stride) — get_eye_net encoder/decoder sets
ENCODER_SETS = [
    (3, 16, 16, 0, 1),
    (3, 48, 24, 0, 2),
    (3, 72, 24, 0, 1),
    (5, 72, 40, 1, 2),
    (5, 120, 40, 1, 1),
    (3, 240, 80, 0, 2),
]
DECODER_SETS = [  # each preceded by 2x bilinear upsample
    (4, 120, 40, 1, 2),
    (4, 72, 40, 1, 2),
    (4, 72, 24, 1, 2),
]
NUM_EYE_JOINTS = 6


def _divisible(v, divisor=4):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


# --- init ---------------------------------------------------------------------


def _init_ghost_module(key, inp, oup, kernel=1, dw_size=3):
    init_ch = math.ceil(oup / 2)
    new_ch = init_ch
    k1, k2 = jax.random.split(key)
    return {
        "primary": {"conv": init_conv(k1, inp, init_ch, kernel, bias=False),
                     "bn": init_bn(init_ch)},
        # depthwise (groups=init_ch): HWIO with I=1
        "cheap": {"conv": {"w": jax.random.normal(k2, (dw_size, dw_size, 1, new_ch)) * 0.01},
                   "bn": init_bn(new_ch)},
    }


def _init_se(key, ch, reduction=4):
    k1, k2 = jax.random.split(key)
    import jax.random as jr

    def lin(k, i, o):
        bound = 1.0 / math.sqrt(i)
        ka, kb = jax.random.split(k)
        return {"w": jr.uniform(ka, (i, o), jnp.float32, -bound, bound),
                "b": jr.uniform(kb, (o,), jnp.float32, -bound, bound)}

    return {"fc1": lin(k1, ch, ch // reduction), "fc2": lin(k2, ch // reduction, ch)}


def _init_bottleneck(key, inp, hidden, oup, kernel, stride, use_se):
    ks = jax.random.split(key, 6)
    p = {
        "ghost1": _init_ghost_module(ks[0], inp, hidden),
        "ghost2": _init_ghost_module(ks[1], hidden, oup),
    }
    if stride == 2:
        # depthwise: HWIO with I=1
        p["dw"] = {"conv": {"w": jax.random.normal(ks[2], (kernel, kernel, 1, hidden)) * 0.01},
                    "bn": init_bn(hidden)}
    if use_se:
        p["se"] = _init_se(ks[3], hidden)
    if not (stride == 1 and inp == oup):
        p["shortcut"] = {
            "dw": {"conv": {"w": jax.random.normal(ks[4], (3, 3, 1, inp)) * 0.01},
                    "bn": init_bn(inp)},
            "pw": {"conv": init_conv(ks[5], inp, oup, 1, bias=False),
                    "bn": init_bn(oup)},
        }
    return p


def init_eye_net(key: jax.Array) -> Params:
    ks = jax.random.split(key, 2 + len(ENCODER_SETS) + len(DECODER_SETS))
    ki = iter(ks)
    p: Params = {
        "stem": {"conv": init_conv(next(ki), 1, 16, 3, bias=False), "bn": init_bn(16)},
        "features": [],
        "head": [],
    }
    inp = 16
    for k, hidden, c, use_se, s in ENCODER_SETS:
        p["features"].append(
            _init_bottleneck(next(ki), inp, _divisible(hidden), _divisible(c), k, s, use_se)
        )
        inp = _divisible(c)
    for k, hidden, c, use_se, s in DECODER_SETS:
        p["head"].append(
            _init_bottleneck(next(ki), inp, _divisible(hidden), _divisible(c), k, 1, use_se)
        )
        inp = _divisible(c)
    p["final"] = init_conv(next(ki), inp, NUM_EYE_JOINTS, 1, bias=True)
    return p


# --- forward -------------------------------------------------------------------


def _ghost_module(p, x, oup, kernel=1, dw_size=3, relu=True):
    x1 = batchnorm(p["primary"]["bn"],
                   conv2d(p["primary"]["conv"], x, padding=kernel // 2))
    if relu:
        x1 = jax.nn.relu(x1)
    x2 = batchnorm(p["cheap"]["bn"],
                   conv2d(p["cheap"]["conv"], x1, padding=dw_size // 2,
                          groups=x1.shape[-1]))
    if relu:
        x2 = jax.nn.relu(x2)
    return jnp.concatenate([x1, x2], axis=-1)[..., :oup]


def _se(p, x):
    y = jnp.mean(x, axis=(1, 2))
    y = jax.nn.relu(y @ p["fc1"]["w"] + p["fc1"]["b"])
    y = y @ p["fc2"]["w"] + p["fc2"]["b"]
    y = jnp.clip(y, 0.0, 1.0)
    return x * y[:, None, None, :]


def _bottleneck(p, x, hidden, oup, kernel, stride, use_se):
    h = _ghost_module(p["ghost1"], x, hidden, relu=True)
    if stride == 2:
        h = batchnorm(p["dw"]["bn"],
                      conv2d(p["dw"]["conv"], h, stride=stride,
                             padding=kernel // 2, groups=h.shape[-1]))
    if use_se:
        h = _se(p["se"], h)
    h = _ghost_module(p["ghost2"], h, oup, relu=False)
    if "shortcut" in p:
        s = batchnorm(p["shortcut"]["dw"]["bn"],
                      conv2d(p["shortcut"]["dw"]["conv"], x, stride=stride,
                             padding=1, groups=x.shape[-1]))
        s = jax.nn.relu(s)
        s = batchnorm(p["shortcut"]["pw"]["bn"], conv2d(p["shortcut"]["pw"]["conv"], s))
    else:
        s = x
    return h + s


def apply_eye_net(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: [N, 32, 48, 1] grayscale eye crops -> heatmaps [N, 16, 24, 6]."""
    x = jax.nn.relu(batchnorm(params["stem"]["bn"],
                              conv2d(params["stem"]["conv"], x, stride=2, padding=1)))
    inp = 16
    for p, (k, hidden, c, use_se, s) in zip(params["features"], ENCODER_SETS):
        x = _bottleneck(p, x, _divisible(hidden), _divisible(c), k, s, use_se)
    for p, (k, hidden, c, use_se, s) in zip(params["head"], DECODER_SETS):
        x = jax.image.resize(
            x, (x.shape[0], x.shape[1] * 2, x.shape[2] * 2, x.shape[3]), "linear"
        )
        x = _bottleneck(p, x, _divisible(hidden), _divisible(c), k, 1, use_se)
    return conv2d(params["final"], x)


# --- converter -------------------------------------------------------------------


def eye_net_from_torch(sd: Mapping[str, Any]) -> Params:
    def convbn(cname, bname):
        return {"conv": conv_from_torch(sd, cname), "bn": bn_from_torch(sd, bname)}

    def ghost(prefix):
        return {
            "primary": convbn(f"{prefix}.primary_conv.0", f"{prefix}.primary_conv.1"),
            "cheap": convbn(f"{prefix}.cheap_operation.0", f"{prefix}.cheap_operation.1"),
        }

    def lin(name):
        import numpy as np

        def np32(x):
            if hasattr(x, "detach"):
                x = x.detach().cpu().numpy()
            return np.array(x, np.float32)  # copy: never alias torch storage

        return {"w": jnp.asarray(np32(sd[f"{name}.weight"]).T),
                "b": jnp.asarray(np32(sd[f"{name}.bias"]))}

    def bottleneck(prefix, stride, use_se):
        p = {"ghost1": ghost(f"{prefix}.conv.0")}
        if stride == 2:
            p["dw"] = convbn(f"{prefix}.conv.1.0", f"{prefix}.conv.1.1")
        if use_se:
            p["se"] = {"fc1": lin(f"{prefix}.conv.2.fc.0"), "fc2": lin(f"{prefix}.conv.2.fc.2")}
        p["ghost2"] = ghost(f"{prefix}.conv.3")
        if f"{prefix}.shortcut.0.0.weight" in sd:
            p["shortcut"] = {
                "dw": convbn(f"{prefix}.shortcut.0.0", f"{prefix}.shortcut.0.1"),
                "pw": convbn(f"{prefix}.shortcut.1", f"{prefix}.shortcut.2"),
            }
        return p

    p: Params = {
        "stem": convbn("features.0.0", "features.0.1"),
        "features": [
            bottleneck(f"features.{i+1}", s, se)
            for i, (k, h, c, se, s) in enumerate(ENCODER_SETS)
        ],
        # head: Upsample at even indices, bottleneck at odd
        "head": [
            bottleneck(f"head.{2*i+1}", 1, se)
            for i, (k, h, c, se, s) in enumerate(DECODER_SETS)
        ],
        "final": conv_from_torch(sd, "final_layer"),
    }
    return p
