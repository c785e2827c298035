"""GhostNet face-landmark backbone (model-zoo alternative).

lib/models/face_ghostnet.py get_face_net (:237-290): the same
GhostModule/GhostBottleneck encoder-decoder as the eye net (our
ghostnet_eye.py implements those primitives once; this module reuses them)
with an RGB stem, the face encoder/decoder set tables, optional extra
encoder layers (EXTRA.ADDITION_ENCODER_LAYER, with the deeper decoder
table when ADDITION_DECODER_LAYER is set), and a 1x1 head to
NUM_FACE_JOINTS heatmaps. Decoder levels are bilinear 2x upsamples
followed by stride-1 bottlenecks (face_ghostnet.py:142-149; upsample
align_corners=False).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp

from dfanerf_tpu.models.perception.common import (
    bn_from_torch,
    conv_from_torch,
    init_bn,
    init_conv,
    batchnorm,
    conv2d,
)
from dfanerf_tpu.models.perception.ghostnet_eye import (
    _bottleneck,
    _divisible,
    _init_bottleneck,
)

Params = Dict[str, Any]

# (kernel, hidden, out, use_se, stride) — face_ghostnet.py:250-258
FACE_ENCODER_SETS = [
    (3, 16, 16, 0, 1),
    (3, 48, 24, 0, 2),
    (3, 72, 24, 0, 1),
    (5, 72, 40, 1, 2),
    (5, 120, 40, 1, 1),
    (3, 240, 80, 0, 2),
]
FACE_ENCODER_ADD_SETS = [  # :260-267
    (3, 200, 80, 0, 1),
    (3, 184, 80, 0, 1),
    (3, 184, 80, 0, 1),
    (3, 480, 112, 1, 1),
    (3, 672, 112, 1, 1),
]
FACE_DECODER_SETS = [  # :278-283 (no-addition variant)
    (4, 120, 40, 1, 2),
    (4, 72, 40, 1, 2),
    (4, 72, 24, 1, 2),
]
FACE_DECODER_ADD_SETS = [  # :272-277 (ADDITION_DECODER_LAYER variant)
    (4, 184, 80, 1, 2),
    (4, 120, 80, 1, 2),
    (4, 72, 40, 1, 2),
]


def _sets(addition_encoder: Optional[int], addition_decoder: bool):
    enc = list(FACE_ENCODER_SETS)
    if addition_encoder:
        assert addition_encoder < 6
        enc += FACE_ENCODER_ADD_SETS[:addition_encoder]
    dec = FACE_DECODER_ADD_SETS if addition_decoder else FACE_DECODER_SETS
    return enc, dec


def init_face_ghostnet(
    key: jax.Array,
    num_joints: int = 68,
    addition_encoder: Optional[int] = None,
    addition_decoder: bool = False,
) -> Params:
    enc, dec = _sets(addition_encoder, addition_decoder)
    ks = jax.random.split(key, 2 + len(enc) + len(dec))
    ki = iter(ks)
    p: Params = {
        "stem": {"conv": init_conv(next(ki), 3, 16, 3, bias=False),
                 "bn": init_bn(16)},
        "features": [],
        "head": [],
    }
    inp = 16
    for k, hidden, c, use_se, s in enc:
        p["features"].append(
            _init_bottleneck(next(ki), inp, _divisible(hidden), _divisible(c),
                             k, s, use_se)
        )
        inp = _divisible(c)
    for k, hidden, c, use_se, s in dec:
        p["head"].append(
            _init_bottleneck(next(ki), inp, _divisible(hidden), _divisible(c),
                             k, 1, use_se)
        )
        inp = _divisible(c)
    p["final"] = init_conv(next(ki), inp, num_joints, 1, bias=True)
    return p


def apply_face_ghostnet(
    params: Params,
    x: jnp.ndarray,
    addition_encoder: Optional[int] = None,
    addition_decoder: bool = False,
) -> jnp.ndarray:
    """x [N, 256, 256, 3] -> heatmaps [N, 64, 64, num_joints] (the torch
    forward's output dict carries this under 'heatmap')."""
    enc, dec = _sets(addition_encoder, addition_decoder)
    x = jax.nn.relu(batchnorm(
        params["stem"]["bn"], conv2d(params["stem"]["conv"], x, stride=2,
                                     padding=1)
    ))
    for p, (k, hidden, c, use_se, s) in zip(params["features"], enc):
        x = _bottleneck(p, x, _divisible(hidden), _divisible(c), k, s, use_se)
    for p, (k, hidden, c, use_se, s) in zip(params["head"], dec):
        x = jax.image.resize(
            x, (x.shape[0], x.shape[1] * s, x.shape[2] * s, x.shape[3]),
            "linear",
        )
        x = _bottleneck(p, x, _divisible(hidden), _divisible(c), k, 1, use_se)
    return conv2d(params["final"], x)


def face_ghostnet_from_torch(
    sd: Mapping[str, Any],
    addition_encoder: Optional[int] = None,
    addition_decoder: bool = False,
) -> Params:
    enc, dec = _sets(addition_encoder, addition_decoder)

    def convbn(cname, bname):
        return {"conv": conv_from_torch(sd, cname), "bn": bn_from_torch(sd, bname)}

    def ghost(prefix):
        return {
            "primary": convbn(f"{prefix}.primary_conv.0", f"{prefix}.primary_conv.1"),
            "cheap": convbn(f"{prefix}.cheap_operation.0",
                            f"{prefix}.cheap_operation.1"),
        }

    def lin(name):
        from dfanerf_tpu.models.perception.common import _np32

        return {"w": jnp.asarray(_np32(sd[f"{name}.weight"]).T),
                "b": jnp.asarray(_np32(sd[f"{name}.bias"]))}

    def bottleneck(prefix, stride, use_se):
        p = {"ghost1": ghost(f"{prefix}.conv.0")}
        if stride == 2:
            p["dw"] = convbn(f"{prefix}.conv.1.0", f"{prefix}.conv.1.1")
        if use_se:
            p["se"] = {"fc1": lin(f"{prefix}.conv.2.fc.0"),
                       "fc2": lin(f"{prefix}.conv.2.fc.2")}
        p["ghost2"] = ghost(f"{prefix}.conv.3")
        if f"{prefix}.shortcut.0.0.weight" in sd:
            p["shortcut"] = {
                "dw": convbn(f"{prefix}.shortcut.0.0", f"{prefix}.shortcut.0.1"),
                "pw": convbn(f"{prefix}.shortcut.1", f"{prefix}.shortcut.2"),
            }
        return p

    return {
        "stem": convbn("features.0.0", "features.0.1"),
        "features": [
            bottleneck(f"features.{i + 1}", s, se)
            for i, (k, h, c, se, s) in enumerate(enc)
        ],
        # head: Upsample modules sit at even indices, bottlenecks at odd
        "head": [
            bottleneck(f"head.{2 * i + 1}", 1, se)
            for i, (k, h, c, se, s) in enumerate(dec)
        ],
        "final": conv_from_torch(sd, "final_layer"),
    }
