"""MobileNetV2 landmark backbone — the representative alternative backbone
of the reference's face-alignment model zoo (lib/models/face_mobilenet.py:
MobileNetV2 + heatmap head; the zoo's other variants are config
permutations of the same blocks).

Provides:
- ``MobileNetV2`` feature extractor (torchvision-compatible inverted
  residuals, ReLU6, width multiplier) with a converter for ImageNet /
  reference checkpoints;
- ``apply_face_mobilenet_heatmap``: backbone -> bilinear-upsample +
  pointwise head -> K landmark heatmaps, the zoo's heatmap-branch shape.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dfanerf_tpu.models.perception.common import (
    batchnorm,
    bn_from_torch,
    conv2d,
    conv_from_torch,
    init_bn,
    init_conv,
)

Params = Dict[str, Any]

# (expand_ratio t, channels c, repeats n, stride s) — torchvision defaults
INVERTED_RESIDUAL_SETTING = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


def _make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def _block_plan(width_mult: float = 1.0):
    """Sequence of ('convbn', cin, cout, k, s, groups) / inverted-residual
    specs mirroring MobileNetV2.features construction."""
    input_channel = _make_divisible(32 * width_mult)
    last_channel = _make_divisible(1280 * max(1.0, width_mult))
    plan: List = [("stem", 3, input_channel, 3, 2)]
    for t, c, n, s in INVERTED_RESIDUAL_SETTING:
        out = _make_divisible(c * width_mult)
        for i in range(n):
            plan.append(("ir", input_channel, out, s if i == 0 else 1, t))
            input_channel = out
    plan.append(("last", input_channel, last_channel, 1, 1))
    return plan, last_channel


def init_mobilenet_v2(key: jax.Array, width_mult: float = 1.0) -> Params:
    plan, _ = _block_plan(width_mult)
    ki = iter(jax.random.split(key, len(plan) * 3 + 2))

    def convbn(cin, cout, k, groups=1):
        return {
            "conv": init_conv(next(ki), cin // groups * groups, cout, k,
                              bias=False) if groups == 1 else
                    {"w": jax.random.normal(next(ki), (k, k, 1, cout)) * 0.01},
            "bn": init_bn(cout),
        }

    blocks = []
    for spec in plan:
        if spec[0] in ("stem", "last"):
            _, cin, cout, k, s = spec
            blocks.append({"kind": spec[0], "convbn": convbn(cin, cout, k)})
        else:
            _, cin, cout, s, t = spec
            hidden = int(round(cin * t))
            b: Params = {"kind": "ir"}
            if t != 1:
                b["expand"] = convbn(cin, hidden, 1)
            b["dw"] = convbn(hidden, hidden, 3, groups=hidden)
            b["project"] = convbn(hidden, cout, 1)
            blocks.append(b)
    return {"blocks": blocks, "plan": None}  # plan is reconstructed statically


def apply_mobilenet_v2(
    params: Params, x: jnp.ndarray, width_mult: float = 1.0,
    n_blocks: int = None
) -> jnp.ndarray:
    """x: [N, H, W, 3] -> features [N, H/32, W/32, 1280]. ``n_blocks``
    truncates the feature stack (the ghost-head variant consumes
    features[:14] — 1/16 resolution, 96 channels)."""
    plan, _ = _block_plan(width_mult)
    if n_blocks is not None:
        plan = plan[:n_blocks]
    for spec, b in zip(plan, params["blocks"]):
        if spec[0] in ("stem", "last"):
            _, cin, cout, k, s = spec
            x = _relu6(batchnorm(b["convbn"]["bn"],
                                 conv2d(b["convbn"]["conv"], x, stride=s,
                                        padding=(k - 1) // 2)))
        else:
            _, cin, cout, s, t = spec
            h = x
            if "expand" in b:
                h = _relu6(batchnorm(b["expand"]["bn"], conv2d(b["expand"]["conv"], h)))
            hidden = h.shape[-1]
            h = _relu6(batchnorm(b["dw"]["bn"],
                                 conv2d(b["dw"]["conv"], h, stride=s, padding=1,
                                        groups=hidden)))
            h = batchnorm(b["project"]["bn"], conv2d(b["project"]["conv"], h))
            if s == 1 and cin == cout:
                h = h + x
            x = h
    return x


def mobilenet_v2_from_torch(sd: Mapping[str, Any], width_mult: float = 1.0,
                            prefix: str = "features",
                            n_blocks: int = None) -> Params:
    """Convert a torchvision-layout MobileNetV2 ``features`` state_dict
    (the reference's MobileNetV2 class uses the same module names)."""
    plan, _ = _block_plan(width_mult)
    if n_blocks is not None:
        plan = plan[:n_blocks]
    blocks = []
    for fi, spec in enumerate(plan):
        if spec[0] in ("stem", "last"):
            blocks.append({
                "kind": spec[0],
                "convbn": {"conv": conv_from_torch(sd, f"{prefix}.{fi}.0"),
                            "bn": bn_from_torch(sd, f"{prefix}.{fi}.1")},
            })
        else:
            t = spec[4]
            b: Params = {"kind": "ir"}
            ci = 0
            if t != 1:
                b["expand"] = {"conv": conv_from_torch(sd, f"{prefix}.{fi}.conv.{ci}.0"),
                                "bn": bn_from_torch(sd, f"{prefix}.{fi}.conv.{ci}.1")}
                ci += 1
            b["dw"] = {"conv": conv_from_torch(sd, f"{prefix}.{fi}.conv.{ci}.0"),
                        "bn": bn_from_torch(sd, f"{prefix}.{fi}.conv.{ci}.1")}
            b["project"] = {"conv": conv_from_torch(sd, f"{prefix}.{fi}.conv.{ci+1}"),
                             "bn": bn_from_torch(sd, f"{prefix}.{fi}.conv.{ci+2}")}
            blocks.append(b)
    return {"blocks": blocks, "plan": None}


# --- heatmap head (the zoo's USE_HEATMAP_BRANCH shape) -----------------------


def init_face_mobilenet_heatmap(
    key: jax.Array, n_joints: int = 68, width_mult: float = 1.0
) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    _, last = _block_plan(width_mult)
    return {
        "backbone": init_mobilenet_v2(k1, width_mult),
        "head1": {"conv": init_conv(k2, last, 256, 3, bias=False), "bn": init_bn(256)},
        "head2": {"conv": init_conv(k3, 256, 128, 3, bias=False), "bn": init_bn(128)},
        "final": init_conv(k4, 128, n_joints, 1),
    }


def apply_face_mobilenet_heatmap(
    params: Params, x: jnp.ndarray, width_mult: float = 1.0
) -> jnp.ndarray:
    """x: [N, 256, 256, 3] -> heatmaps [N, 64, 64, n_joints]: backbone to
    1/32 then two (2x bilinear upsample + ConvBNReLU6) stages to 1/8 and a
    pointwise head — the mobile_head.py upsample-block shape."""
    f = apply_mobilenet_v2(params["backbone"], x, width_mult)
    for head in ("head1", "head2"):
        f = jax.image.resize(
            f, (f.shape[0], f.shape[1] * 2, f.shape[2] * 2, f.shape[3]), "linear"
        )
        f = _relu6(batchnorm(params[head]["bn"],
                             conv2d(params[head]["conv"], f, padding=1)))
    return conv2d(params["final"], f)


# --- ghost-module head variant (face_mobilenet_ghostHead.py) -----------------

# one entry per head level: (num_layers, exp_size, out_ch, kernel, use_se,
# stride) — stride 2 inserts a 2x bilinear upsample BEFORE the bottlenecks
# (face_mobilenet_ghostHead.py:338-371). No yaml ships for this variant; the
# default mirrors the eye-ghostnet decoder proportions at face widths.
DEFAULT_GHOSTHEAD_SPEC = (
    (1, 200, 96, 3, 1, 2),
    (1, 120, 64, 3, 1, 2),
)
_GHOSTHEAD_BACKBONE_BLOCKS = 14  # before_layer3 = features[:14] (:200-202)


def init_face_mobilenet_ghosthead(
    key: jax.Array, n_joints: int = 68, spec=DEFAULT_GHOSTHEAD_SPEC,
    final_kernel: int = 1, width_mult: float = 1.0,
) -> Params:
    """FaceMobilenet with the GhostBottleneck decoder head
    (face_mobilenet_ghostHead.py get_face_net): MobileNetV2 features[:14]
    (96ch at 1/16) -> ghost head -> final conv to n_joints heatmaps."""
    from dfanerf_tpu.models.perception.ghostnet_eye import _init_bottleneck

    n_bn = sum(n for n, *_ in spec)
    ks = jax.random.split(key, 2 + n_bn)
    ki = iter(ks)
    p: Params = {"backbone": init_mobilenet_v2(next(ki), width_mult)}
    p["backbone"]["blocks"] = p["backbone"]["blocks"][:_GHOSTHEAD_BACKBONE_BLOCKS]
    inp = 96
    head = []
    for n_layer, exp, out, k, use_se, s in spec:
        for _ in range(n_layer):
            head.append(_init_bottleneck(next(ki), inp, exp, out, k, 1, use_se))
            inp = out
    p["head"] = head
    p["final"] = init_conv(next(ki), inp, n_joints, final_kernel)
    return p


def apply_face_mobilenet_ghosthead(
    params: Params, x: jnp.ndarray, spec=DEFAULT_GHOSTHEAD_SPEC,
    final_kernel: int = 1, width_mult: float = 1.0,
) -> jnp.ndarray:
    """x [N, 256, 256, 3] -> heatmaps [N, 64, 64, n_joints] with the
    default spec (1/16 backbone + two 2x upsampled ghost levels -> 1/4...
    actually 1/16 * 2 * 2 = 1/4; the head resolution follows the spec)."""
    from dfanerf_tpu.models.perception.ghostnet_eye import _bottleneck

    f = apply_mobilenet_v2(params["backbone"], x, width_mult,
                           n_blocks=_GHOSTHEAD_BACKBONE_BLOCKS)
    hi = 0
    for n_layer, exp, out, k, use_se, s in spec:
        if s == 2:
            f = jax.image.resize(
                f, (f.shape[0], f.shape[1] * 2, f.shape[2] * 2, f.shape[3]),
                "linear",
            )
        for _ in range(n_layer):
            f = _bottleneck(params["head"][hi], f, exp, out, k, 1, use_se)
            hi += 1
    pad = 1 if final_kernel == 3 else 0
    return conv2d(params["final"], f, padding=pad)


def face_mobilenet_ghosthead_from_torch(
    sd: Mapping[str, Any], spec=DEFAULT_GHOSTHEAD_SPEC,
    width_mult: float = 1.0,
) -> Params:
    def convbn(cname, bname):
        return {"conv": conv_from_torch(sd, cname), "bn": bn_from_torch(sd, bname)}

    def ghost(prefix):
        return {
            "primary": convbn(f"{prefix}.primary_conv.0",
                              f"{prefix}.primary_conv.1"),
            "cheap": convbn(f"{prefix}.cheap_operation.0",
                            f"{prefix}.cheap_operation.1"),
        }

    def lin(name):
        from dfanerf_tpu.models.perception.common import _np32

        return {"w": jnp.asarray(_np32(sd[f"{name}.weight"]).T),
                "b": jnp.asarray(_np32(sd[f"{name}.bias"]))}

    def bottleneck(prefix, use_se):
        p = {"ghost1": ghost(f"{prefix}.conv.0")}
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

    p: Params = {
        "backbone": mobilenet_v2_from_torch(
            sd, width_mult, prefix="before_layer3",
            n_blocks=_GHOSTHEAD_BACKBONE_BLOCKS,
        ),
    }
    head, seq_i = [], 0
    for n_layer, exp, out, k, use_se, s in spec:
        if s == 2:
            seq_i += 1  # the parameter-free Upsample module occupies a slot
        for _ in range(n_layer):
            head.append(bottleneck(f"head_layers.{seq_i}", use_se))
            seq_i += 1
    p["head"] = head
    p["final"] = conv_from_torch(sd, "head_final_layer")
    return p
