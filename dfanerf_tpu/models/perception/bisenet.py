"""BiSeNet face parser (19 classes) — functional JAX reimplementation of
face_parsing/model.py + resnet.py:

- ResNet18 context path (this fork's variant: feat8 from layer2 doubles as
  the spatial path — model.py:240-244);
- AttentionRefinementModules on feat16/feat32 with a global-context head;
- FeatureFusionModule merging feat8 with the refined 1/8 context;
- three BiSeNetOutput heads upsampled bilinearly (align_corners=True).

Used by pipeline step 3 to produce parsing/{:06d}.png class maps that drive
background extraction and head/com composition.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp

from dfanerf_tpu.models.perception.common import (
    batchnorm,
    bn_from_torch,
    conv2d,
    conv_bn_relu,
    conv_from_torch,
    global_avg_pool,
    init_bn,
    init_conv,
    max_pool,
    resize_bilinear_align,
    resize_nearest,
)

Params = Dict[str, Any]


# --- init --------------------------------------------------------------------


def _init_convbn(key, cin, cout, ks):
    return {"conv": init_conv(key, cin, cout, ks, bias=False), "bn": init_bn(cout)}


def _init_basic_block(key, cin, cout, stride):
    ks = jax.random.split(key, 3)
    p = {
        "conv1": init_conv(ks[0], cin, cout, 3, bias=False),
        "bn1": init_bn(cout),
        "conv2": init_conv(ks[1], cout, cout, 3, bias=False),
        "bn2": init_bn(cout),
    }
    if cin != cout or stride != 1:
        p["down_conv"] = init_conv(ks[2], cin, cout, 1, bias=False)
        p["down_bn"] = init_bn(cout)
    return p


def _init_arm(key, cin, cout):
    k1, k2 = jax.random.split(key)
    return {
        "conv": _init_convbn(k1, cin, cout, 3),
        "conv_atten": init_conv(k2, cout, cout, 1, bias=False),
        "bn_atten": init_bn(cout),
    }


def _init_output(key, cin, cmid, n_classes):
    k1, k2 = jax.random.split(key)
    return {
        "conv": _init_convbn(k1, cin, cmid, 3),
        "conv_out": init_conv(k2, cmid, n_classes, 1, bias=False),
    }


def init_bisenet(key: jax.Array, n_classes: int = 19) -> Params:
    ks = jax.random.split(key, 16)
    layers = {}
    spec = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
    for li, (cin, cout, stride) in enumerate(spec, start=1):
        kk = jax.random.split(ks[li], 2)
        layers[f"layer{li}"] = [
            _init_basic_block(kk[0], cin, cout, stride),
            _init_basic_block(kk[1], cout, cout, 1),
        ]
    return {
        "resnet": {
            "conv1": init_conv(ks[0], 3, 64, 7, bias=False),
            "bn1": init_bn(64),
            **layers,
        },
        "arm16": _init_arm(ks[5], 256, 128),
        "arm32": _init_arm(ks[6], 512, 128),
        "conv_head32": _init_convbn(ks[7], 128, 128, 3),
        "conv_head16": _init_convbn(ks[8], 128, 128, 3),
        "conv_avg": _init_convbn(ks[9], 512, 128, 1),
        "ffm": {
            "convblk": _init_convbn(ks[10], 256, 256, 1),
            "conv1": init_conv(ks[11], 256, 64, 1, bias=False),
            "conv2": init_conv(ks[12], 64, 256, 1, bias=False),
        },
        "conv_out": _init_output(ks[13], 256, 256, n_classes),
        "conv_out16": _init_output(ks[14], 128, 64, n_classes),
        "conv_out32": _init_output(ks[15], 128, 64, n_classes),
    }


# --- forward -------------------------------------------------------------------


def _basic_block(p, x, stride):
    r = conv_bn_relu(p["conv1"], p["bn1"], x, stride=stride, padding=1)
    r = batchnorm(p["bn2"], conv2d(p["conv2"], r, stride=1, padding=1))
    sc = x
    if "down_conv" in p:
        sc = batchnorm(p["down_bn"], conv2d(p["down_conv"], x, stride=stride))
    return jax.nn.relu(sc + r)


def _resnet18(p, x):
    x = conv_bn_relu(p["conv1"], p["bn1"], x, stride=2, padding=3)
    x = max_pool(x, 3, 2, 1)
    strides = {"layer1": 1, "layer2": 2, "layer3": 2, "layer4": 2}
    feats = {}
    for name in ("layer1", "layer2", "layer3", "layer4"):
        x = _basic_block(p[name][0], x, strides[name])
        x = _basic_block(p[name][1], x, 1)
        feats[name] = x
    return feats["layer2"], feats["layer3"], feats["layer4"]


def _convbn(p, x, stride=1, padding=1, relu=True):
    return conv_bn_relu(p["conv"], p["bn"], x, stride=stride, padding=padding, relu=relu)


def _arm(p, x):
    feat = _convbn(p["conv"], x, padding=1)
    atten = global_avg_pool(feat)
    atten = jax.nn.sigmoid(batchnorm(p["bn_atten"], conv2d(p["conv_atten"], atten)))
    return feat * atten


def _output_head(p, x):
    return conv2d(p["conv_out"], _convbn(p["conv"], x, padding=1))


def apply_bisenet(params: Params, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """x: [N, H, W, 3] normalized input -> three [N, H, W, n_classes] logit
    maps (main, aux16, aux32), bilinear-align upsampled like the reference."""
    H, W = x.shape[1], x.shape[2]
    feat8, feat16, feat32 = _resnet18(params["resnet"], x)

    avg = _convbn(params["conv_avg"], global_avg_pool(feat32), padding=0)
    avg_up = resize_nearest(avg, (feat32.shape[1], feat32.shape[2]))
    feat32_sum = _arm(params["arm32"], feat32) + avg_up
    feat32_up = resize_nearest(feat32_sum, (feat16.shape[1], feat16.shape[2]))
    feat32_up = _convbn(params["conv_head32"], feat32_up, padding=1)

    feat16_sum = _arm(params["arm16"], feat16) + feat32_up
    feat16_up = resize_nearest(feat16_sum, (feat8.shape[1], feat8.shape[2]))
    feat16_up = _convbn(params["conv_head16"], feat16_up, padding=1)

    # FFM: spatial path == feat8 in this fork
    fcat = jnp.concatenate([feat8, feat16_up], axis=-1)
    feat = _convbn(params["ffm"]["convblk"], fcat, padding=0)
    atten = global_avg_pool(feat)
    atten = jax.nn.relu(conv2d(params["ffm"]["conv1"], atten))
    atten = jax.nn.sigmoid(conv2d(params["ffm"]["conv2"], atten))
    feat_fuse = feat * atten + feat

    out = _output_head(params["conv_out"], feat_fuse)
    out16 = _output_head(params["conv_out16"], feat16_up)
    out32 = _output_head(params["conv_out32"], feat32_up)
    return (
        resize_bilinear_align(out, (H, W)),
        resize_bilinear_align(out16, (H, W)),
        resize_bilinear_align(out32, (H, W)),
    )


# --- converter ------------------------------------------------------------------


def bisenet_from_torch(sd: Mapping[str, Any]) -> Params:
    """Convert the reference 79999_iter.pth state_dict."""

    def convbn(name):
        return {"conv": conv_from_torch(sd, f"{name}.conv"),
                "bn": bn_from_torch(sd, f"{name}.bn")}

    def block(name):
        p = {
            "conv1": conv_from_torch(sd, f"{name}.conv1"),
            "bn1": bn_from_torch(sd, f"{name}.bn1"),
            "conv2": conv_from_torch(sd, f"{name}.conv2"),
            "bn2": bn_from_torch(sd, f"{name}.bn2"),
        }
        if f"{name}.downsample.0.weight" in sd:
            p["down_conv"] = conv_from_torch(sd, f"{name}.downsample.0")
            p["down_bn"] = bn_from_torch(sd, f"{name}.downsample.1")
        return p

    def arm(name):
        return {
            "conv": convbn(f"{name}.conv"),
            "conv_atten": conv_from_torch(sd, f"{name}.conv_atten"),
            "bn_atten": bn_from_torch(sd, f"{name}.bn_atten"),
        }

    def out_head(name):
        return {
            "conv": convbn(f"{name}.conv"),
            "conv_out": conv_from_torch(sd, f"{name}.conv_out"),
        }

    resnet = {
        "conv1": conv_from_torch(sd, "cp.resnet.conv1"),
        "bn1": bn_from_torch(sd, "cp.resnet.bn1"),
    }
    for li in range(1, 5):
        resnet[f"layer{li}"] = [block(f"cp.resnet.layer{li}.{b}") for b in range(2)]
    return {
        "resnet": resnet,
        "arm16": arm("cp.arm16"),
        "arm32": arm("cp.arm32"),
        "conv_head32": convbn("cp.conv_head32"),
        "conv_head16": convbn("cp.conv_head16"),
        "conv_avg": convbn("cp.conv_avg"),
        "ffm": {
            "convblk": convbn("ffm.convblk"),
            "conv1": conv_from_torch(sd, "ffm.conv1"),
            "conv2": conv_from_torch(sd, "ffm.conv2"),
        },
        "conv_out": out_head("conv_out"),
        "conv_out16": out_head("conv_out16"),
        "conv_out32": out_head("conv_out32"),
    }
