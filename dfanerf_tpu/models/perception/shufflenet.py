"""ShuffleNetV2 backbone (model-zoo alternative).

JAX/NHWC reimplementation of lib/models/shufflenetv2.py — the torchvision
ShuffleNetV2 the zoo keeps as a lightweight backbone option (no in-tree
face head consumes it; it is exposed exactly as the reference exposes it,
as the classifier-topped backbone with the x0.5..x2.0 width presets).

Semantics reproduced: channel_shuffle with 2 groups (:19-32), the
InvertedResidual split/concat blocks (:35-81 — stride-1 blocks transform
only the second channel half), stem conv + 3x3/2 max pool, stages of
[4, 8, 4] blocks, the 1x1 conv5, global mean pool and the fc head.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Mapping, Sequence, Tuple

import jax
import jax.numpy as jnp

from dfanerf_tpu.models.perception.common import (
    _np32,
    batchnorm,
    bn_from_torch,
    conv2d,
    conv_from_torch,
    init_bn,
    init_conv,
    max_pool,
)

Params = Dict[str, Any]

PRESETS = {  # stages_repeats, stages_out_channels (shufflenetv2.py:148-201)
    "x0.5": ((4, 8, 4), (24, 48, 96, 192, 1024)),
    "x1.0": ((4, 8, 4), (24, 116, 232, 464, 1024)),
    "x1.5": ((4, 8, 4), (24, 176, 352, 704, 1024)),
    "x2.0": ((4, 8, 4), (24, 244, 488, 976, 2048)),
}


def channel_shuffle(x: jnp.ndarray, groups: int = 2) -> jnp.ndarray:
    """NHWC channel shuffle: [.., g*cpg] -> interleave groups (:19-32)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(n, h, w, c)


def _init_convbn(key, cin, cout, ks, groups=1):
    cin_eff = cin // groups
    k = jax.random.split(key, 1)[0]
    return {
        "conv": {"w": jax.random.normal(k, (ks, ks, cin_eff, cout)) * 0.01},
        "bn": init_bn(cout),
    }


def _init_block(key, inp, oup, stride):
    branch_features = oup // 2
    ks = jax.random.split(key, 5)
    p = {}
    if stride > 1:
        p["branch1"] = {
            "dw": _init_convbn(ks[0], inp, inp, 3, groups=inp),
            "pw": _init_convbn(ks[1], inp, branch_features, 1),
        }
    cin2 = inp if stride > 1 else branch_features
    p["branch2"] = {
        "pw1": _init_convbn(ks[2], cin2, branch_features, 1),
        "dw": _init_convbn(ks[3], branch_features, branch_features, 3,
                           groups=branch_features),
        "pw2": _init_convbn(ks[4], branch_features, branch_features, 1),
    }
    return p


def init_shufflenet_v2(key: jax.Array, preset: str = "x1.0",
                       num_classes: int = 1000) -> Params:
    repeats, out_ch = PRESETS[preset]
    keys = iter(jax.random.split(key, 3 + sum(repeats)))
    p: Params = {"conv1": _init_convbn(next(keys), 3, out_ch[0], 3)}
    inp = out_ch[0]
    for si, (rep, oc) in enumerate(zip(repeats, out_ch[1:4])):
        blocks = [_init_block(next(keys), inp, oc, 2)]
        blocks += [_init_block(next(keys), oc, oc, 1) for _ in range(rep - 1)]
        p[f"stage{si + 2}"] = blocks
        inp = oc
    p["conv5"] = _init_convbn(next(keys), inp, out_ch[4], 1)
    kf = jax.random.split(next(keys), 2)
    bound = 1.0 / math.sqrt(out_ch[4])
    p["fc"] = {
        "w": jax.random.uniform(kf[0], (out_ch[4], num_classes), jnp.float32,
                                -bound, bound),
        "b": jax.random.uniform(kf[1], (num_classes,), jnp.float32,
                                -bound, bound),
    }
    return p


def _convbn_relu(p, x, stride=1, padding=0, groups=1, relu=True):
    y = batchnorm(p["bn"], conv2d(p["conv"], x, stride=stride, padding=padding,
                                  groups=groups))
    return jax.nn.relu(y) if relu else y


def _block(p, x, stride):
    if stride == 1:
        c = x.shape[-1] // 2
        x1, x2 = x[..., :c], x[..., c:]
        b2 = _convbn_relu(p["branch2"]["pw1"], x2)
        b2 = _convbn_relu(p["branch2"]["dw"], b2, padding=1,
                          groups=b2.shape[-1], relu=False)
        b2 = _convbn_relu(p["branch2"]["pw2"], b2)
        out = jnp.concatenate([x1, b2], axis=-1)
    else:
        b1 = _convbn_relu(p["branch1"]["dw"], x, stride=stride, padding=1,
                          groups=x.shape[-1], relu=False)
        b1 = _convbn_relu(p["branch1"]["pw"], b1)
        b2 = _convbn_relu(p["branch2"]["pw1"], x)
        b2 = _convbn_relu(p["branch2"]["dw"], b2, stride=stride, padding=1,
                          groups=b2.shape[-1], relu=False)
        b2 = _convbn_relu(p["branch2"]["pw2"], b2)
        out = jnp.concatenate([b1, b2], axis=-1)
    return channel_shuffle(out, 2)


def apply_shufflenet_v2(params: Params, x: jnp.ndarray,
                        preset: str = "x1.0") -> jnp.ndarray:
    """x [N, H, W, 3] -> logits [N, num_classes]."""
    repeats, _ = PRESETS[preset]
    x = _convbn_relu(params["conv1"], x, stride=2, padding=1)
    x = max_pool(x, ks=3, stride=2, padding=1)
    for si, rep in enumerate(repeats):
        for bi, p in enumerate(params[f"stage{si + 2}"]):
            x = _block(p, x, 2 if bi == 0 else 1)
    x = _convbn_relu(params["conv5"], x)
    x = jnp.mean(x, axis=(1, 2))
    return x @ params["fc"]["w"] + params["fc"]["b"]


def shufflenet_v2_from_torch(sd: Mapping[str, Any],
                             preset: str = "x1.0") -> Params:
    repeats, _ = PRESETS[preset]

    def convbn(base, ci, bi):
        return {"conv": conv_from_torch(sd, f"{base}.{ci}"),
                "bn": bn_from_torch(sd, f"{base}.{bi}")}

    def block(prefix, stride):
        p = {}
        if stride > 1:
            p["branch1"] = {
                "dw": convbn(f"{prefix}.branch1", 0, 1),
                "pw": convbn(f"{prefix}.branch1", 2, 3),
            }
        p["branch2"] = {
            "pw1": convbn(f"{prefix}.branch2", 0, 1),
            "dw": convbn(f"{prefix}.branch2", 3, 4),
            "pw2": convbn(f"{prefix}.branch2", 5, 6),
        }
        return p

    p: Params = {"conv1": convbn("conv1", 0, 1)}
    for si, rep in enumerate(repeats):
        p[f"stage{si + 2}"] = [
            block(f"stage{si + 2}.{bi}", 2 if bi == 0 else 1)
            for bi in range(rep)
        ]
    p["conv5"] = convbn("conv5", 0, 1)
    p["fc"] = {"w": jnp.asarray(_np32(sd["fc.weight"]).T),
               "b": jnp.asarray(_np32(sd["fc.bias"]))}
    return p
