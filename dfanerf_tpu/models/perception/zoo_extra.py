"""Remaining distinct model-zoo architecture families.

The face-alignment training zoo contains several backbones that are NOT
config permutations of the already-ported blocks. This module covers the
distinct families:

- ``PoseResNet`` — SimpleBaseline-style ResNet trunk + transposed-conv
  head (data_util/face-alignment/lib/models/pose_resnet.py:102-270;
  resnet_spec at :251-257).
- ``DReLU`` dynamic activation + the MobileNetV2-DReLU face net
  (face_mobilenet_DReLU.py:43-110 for the block, :153-330 for the net):
  a squeeze-excite-style FC predicts per-channel (alpha, beta) pairs and
  the activation is max_k(alpha_k * x + beta_k).
- ``FaceMobilenet`` deconv-head family — the regress / heatmap / aux-head
  trio shared by face_mobilenet.py:200-330 and the DReLU variant (the
  plain-ReLU6 backbone member of this family lives in mobilenet.py).

All functional JAX: NHWC layouts, parameter pytrees, converters from the
torch state_dicts, weight-for-weight parity tested in tests/test_zoo.py.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Sequence, Tuple

import jax
import jax.numpy as jnp

from dfanerf_tpu.models.perception.common import (
    _np32,
    batchnorm,
    bn_from_torch,
    conv2d,
    conv_from_torch,
    conv_transpose2d,
    deconv_from_torch,
    init_bn,
    init_conv,
    init_deconv,
    max_pool,
)
from dfanerf_tpu.models.perception.mobilenet import (
    INVERTED_RESIDUAL_SETTING,
    _make_divisible,
)

Params = Dict[str, Any]

# --------------------------------------------------------------------------
# PoseResNet (pose_resnet.py) — ResNet trunk + deconv head
# --------------------------------------------------------------------------

# depth -> (block kind, per-stage block counts); pose_resnet.py:251-257
RESNET_SPEC = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}
_STAGE_PLANES = (64, 128, 256, 512)


def _deconv_pad(kernel: int) -> Tuple[int, int]:
    """pose_resnet.py:152-163 _get_deconv_cfg."""
    return {4: (1, 0), 3: (1, 1), 2: (0, 0)}[kernel]


def init_pose_resnet(
    key: jax.Array,
    depth: int = 50,
    num_joints: int = 17,
    deconv_filters: Sequence[int] = (256, 256, 256),
    deconv_kernels: Sequence[int] = (4, 4, 4),
    final_kernel: int = 1,
    deconv_with_bias: bool = False,
) -> Params:
    kind, layers = RESNET_SPEC[depth]
    expansion = 1 if kind == "basic" else 4
    n_keys = 2 + sum(layers) * 4 + len(deconv_filters) + 1
    ki = iter(jax.random.split(key, n_keys))

    def convbn(cin, cout, ks):
        return {"conv": init_conv(next(ki), cin, cout, ks, bias=False),
                "bn": init_bn(cout)}

    p: Params = {"stem": convbn(3, 64, 7)}
    inplanes = 64
    stages = []
    for si, n_blocks in enumerate(layers):
        planes = _STAGE_PLANES[si]
        stride = 1 if si == 0 else 2
        blocks = []
        for bi in range(n_blocks):
            b: Params = {}
            if kind == "basic":
                b["conv1"] = convbn(inplanes, planes, 3)
                b["conv2"] = convbn(planes, planes, 3)
            else:
                b["conv1"] = convbn(inplanes, planes, 1)
                b["conv2"] = convbn(planes, planes, 3)
                b["conv3"] = convbn(planes, planes * expansion, 1)
            if bi == 0 and (stride != 1 or inplanes != planes * expansion):
                b["downsample"] = convbn(inplanes, planes * expansion, 1)
            blocks.append(b)
            inplanes = planes * expansion
        stages.append(blocks)
    p["stages"] = stages
    deconvs = []
    for cout, ks in zip(deconv_filters, deconv_kernels):
        deconvs.append({
            "deconv": init_deconv(next(ki), inplanes, cout, ks,
                                  bias=deconv_with_bias),
            "bn": init_bn(cout),
        })
        inplanes = cout
    p["deconvs"] = deconvs
    p["final"] = init_conv(next(ki), inplanes, num_joints, final_kernel)
    return p


def _resnet_trunk(params: Params, x: jnp.ndarray, depth: int) -> jnp.ndarray:
    kind, _ = RESNET_SPEC[depth]
    h = jax.nn.relu(
        batchnorm(params["stem"]["bn"],
                  conv2d(params["stem"]["conv"], x, stride=2, padding=3))
    )
    h = max_pool(h, ks=3, stride=2, padding=1)
    for si, blocks in enumerate(params["stages"]):
        stride = 1 if si == 0 else 2
        for bi, b in enumerate(blocks):
            s = stride if bi == 0 else 1
            residual = h
            if kind == "basic":
                out = jax.nn.relu(batchnorm(
                    b["conv1"]["bn"], conv2d(b["conv1"]["conv"], h, stride=s,
                                             padding=1)))
                out = batchnorm(b["conv2"]["bn"],
                                conv2d(b["conv2"]["conv"], out, padding=1))
            else:
                out = jax.nn.relu(batchnorm(
                    b["conv1"]["bn"], conv2d(b["conv1"]["conv"], h)))
                out = jax.nn.relu(batchnorm(
                    b["conv2"]["bn"], conv2d(b["conv2"]["conv"], out,
                                             stride=s, padding=1)))
                out = batchnorm(b["conv3"]["bn"],
                                conv2d(b["conv3"]["conv"], out))
            if "downsample" in b:
                residual = batchnorm(
                    b["downsample"]["bn"],
                    conv2d(b["downsample"]["conv"], h, stride=s))
            h = jax.nn.relu(out + residual)
    return h


def _deconv_head(deconvs, final, h, deconv_kernels, final_kernel):
    for d, ks in zip(deconvs, deconv_kernels):
        pad, opad = _deconv_pad(ks)
        h = jax.nn.relu(batchnorm(
            d["bn"], conv_transpose2d(d["deconv"], h, stride=2, padding=pad,
                                      output_padding=opad)))
    return conv2d(final, h, padding=1 if final_kernel == 3 else 0)


def apply_pose_resnet(
    params: Params,
    x: jnp.ndarray,
    depth: int = 50,
    deconv_kernels: Sequence[int] = (4, 4, 4),
    final_kernel: int = 1,
) -> jnp.ndarray:
    """x [N, H, W, 3] -> heatmaps [N, H/4 * 2^(d-3), ..., num_joints]
    (pose_resnet.py:192-206: /32 trunk, x2 per deconv)."""
    h = _resnet_trunk(params, x, depth)
    return _deconv_head(params["deconvs"], params["final"], h,
                        deconv_kernels, final_kernel)


def pose_resnet_from_torch(
    sd: Mapping[str, Any],
    depth: int = 50,
    n_deconvs: int = 3,
) -> Params:
    kind, layers = RESNET_SPEC[depth]

    def convbn(cname, bname):
        return {"conv": conv_from_torch(sd, cname),
                "bn": bn_from_torch(sd, bname)}

    p: Params = {"stem": convbn("conv1", "bn1")}
    stages = []
    for si, n_blocks in enumerate(layers):
        blocks = []
        for bi in range(n_blocks):
            pre = f"layer{si + 1}.{bi}"
            b = {"conv1": convbn(f"{pre}.conv1", f"{pre}.bn1"),
                 "conv2": convbn(f"{pre}.conv2", f"{pre}.bn2")}
            if kind == "bottleneck":
                b["conv3"] = convbn(f"{pre}.conv3", f"{pre}.bn3")
            if f"{pre}.downsample.0.weight" in sd:
                b["downsample"] = convbn(f"{pre}.downsample.0",
                                         f"{pre}.downsample.1")
            blocks.append(b)
        stages.append(blocks)
    p["stages"] = stages
    p["deconvs"] = [
        {"deconv": deconv_from_torch(sd, f"deconv_layers.{3 * i}"),
         "bn": bn_from_torch(sd, f"deconv_layers.{3 * i + 1}")}
        for i in range(n_deconvs)
    ]
    p["final"] = conv_from_torch(sd, "final_layer")
    return p


# --------------------------------------------------------------------------
# pose_face_resnet.py: PoseResNet trunk + TWO deconv heads (pose + face),
# outputs channel-concatenated (:217-225).
# --------------------------------------------------------------------------


def apply_pose_face_resnet(
    params: Params,
    x: jnp.ndarray,
    depth: int = 18,
    deconv_kernels: Sequence[int] = (4, 4, 4),
    final_kernel: int = 1,
) -> jnp.ndarray:
    h = _resnet_trunk(params, x, depth)
    pose = _deconv_head(params["deconvs"], params["final"], h,
                        deconv_kernels, final_kernel)
    face = _deconv_head(params["face_deconvs"], params["face_final"], h,
                        deconv_kernels, final_kernel)
    return jnp.concatenate([pose, face], axis=-1)


def pose_face_resnet_from_torch(sd: Mapping[str, Any], depth: int = 18,
                                n_deconvs: int = 3) -> Params:
    p = pose_resnet_from_torch(sd, depth, n_deconvs)
    p["face_deconvs"] = [
        {"deconv": deconv_from_torch(sd, f"face_deconv_layers.{3 * i}"),
         "bn": bn_from_torch(sd, f"face_deconv_layers.{3 * i + 1}")}
        for i in range(n_deconvs)
    ]
    p["face_final"] = conv_from_torch(sd, "face_final_layer")
    return p


# --------------------------------------------------------------------------
# DReLU dynamic activation (face_mobilenet_DReLU.py:43-110, type 'B', k=2)
# --------------------------------------------------------------------------


def init_drelu(key: jax.Array, channels: int, k: int = 2,
               ratio: int = 8) -> Params:
    hidden = max(channels // ratio, 8)
    k1, k2 = jax.random.split(key)
    lin = lambda kk, cin, cout: {
        "w": jax.random.normal(kk, (cin, cout)) * 0.01,
        "b": jnp.zeros((cout,)),
    }
    return {
        "fc1": lin(k1, channels, channels // ratio),
        "fc2": lin(k2, channels // ratio, 2 * k * channels),
        # frozen buffers (requires_grad=False parameters in the reference)
        "alpha0": jnp.array([1.0, 0.0]),
        "beta0": jnp.array([0.0, 0.0]),
        "gamma": jnp.array([1.0, 0.5]),
    }


def apply_drelu(p: Params, x: jnp.ndarray, k: int = 2) -> jnp.ndarray:
    """Dynamic ReLU type B: per-(batch, channel) k-fold max of affine
    pieces whose coefficients come from a global-pool FC (the reference's
    forward, face_mobilenet_DReLU.py:84-110). x is NHWC."""
    b, h, w, c = x.shape
    y = jnp.mean(x, axis=(1, 2))  # [b, c] adaptive avg pool
    y = jax.nn.relu(y @ p["fc1"]["w"] + p["fc1"]["b"])
    y = y @ p["fc2"]["w"] + p["fc2"]["b"]  # [b, 2*c*k]
    y = 2.0 * jax.nn.sigmoid(y) - 1.0
    y = y.reshape(b, 2, c, k)
    alpha = p["alpha0"] + p["gamma"][0] * y[:, 0]  # [b, c, k]
    beta = p["beta0"] + p["gamma"][1] * y[:, 1]
    # [b, 1, 1, c, k] affine pieces over [b, h, w, c, 1] activations
    out = x[..., None] * alpha[:, None, None] + beta[:, None, None]
    return jnp.max(out, axis=-1)


def drelu_from_torch(sd: Mapping[str, Any], prefix: str) -> Params:
    lin = lambda name: {"w": jnp.asarray(_np32(sd[f"{name}.weight"]).T),
                        "b": jnp.asarray(_np32(sd[f"{name}.bias"]))}
    return {
        "fc1": lin(f"{prefix}.fc.0"),
        "fc2": lin(f"{prefix}.fc.2"),
        "alpha0": jnp.asarray(_np32(sd[f"{prefix}.init_param_alpha"]).reshape(-1)),
        "beta0": jnp.asarray(_np32(sd[f"{prefix}.init_param_beta"]).reshape(-1)),
        "gamma": jnp.asarray(_np32(sd[f"{prefix}.init_param_gamma"])),
    }


# --------------------------------------------------------------------------
# MobileNetV2 backbone with DReLU activations + FaceMobilenet deconv heads
# (face_mobilenet_DReLU.py:153-330). Structure mirrors mobilenet.py's
# _block_plan but every ConvBNReLU carries a DReLU block instead of ReLU6.
# --------------------------------------------------------------------------


def _drelu_block_plan(width_mult: float = 1.0):
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


def init_mobilenet_v2_drelu(key: jax.Array, width_mult: float = 1.0) -> Params:
    plan, _ = _drelu_block_plan(width_mult)
    ki = iter(jax.random.split(key, len(plan) * 8))

    def convbn_drelu(cin, cout, ks, groups=1):
        return {
            "conv": init_conv(next(ki), cin // groups, cout, ks, bias=False),
            "bn": init_bn(cout),
            "drelu": init_drelu(next(ki), cout),
        }

    blocks = []
    for spec in plan:
        if spec[0] in ("stem", "last"):
            _, cin, cout, k, s = spec
            blocks.append({"convbn": convbn_drelu(cin, cout, k)})
        else:
            _, cin, cout, s, t = spec
            hidden = int(round(cin * t))
            b: Params = {}
            if t != 1:
                b["expand"] = convbn_drelu(cin, hidden, 1)
            b["dw"] = convbn_drelu(hidden, hidden, 3, groups=hidden)
            b["project"] = {
                "conv": init_conv(next(ki), hidden, cout, 1, bias=False),
                "bn": init_bn(cout),
            }
            blocks.append(b)
    return {"blocks": blocks}


def apply_mobilenet_v2_drelu(
    params: Params, x: jnp.ndarray, width_mult: float = 1.0,
    start: int = 0, stop: int = None,
) -> jnp.ndarray:
    """MobileNetV2 features with DReLU activations; [start:stop] selects a
    feature sub-stack (before_layer3 = [:14], layer4 = [14:],
    face_mobilenet_DReLU.py:259-260)."""
    plan, _ = _drelu_block_plan(width_mult)
    sl = slice(start, stop)
    for spec, b in zip(plan[sl], params["blocks"][sl]):
        if spec[0] in ("stem", "last"):
            _, cin, cout, k, s = spec
            cb = b["convbn"]
            x = apply_drelu(cb["drelu"], batchnorm(
                cb["bn"], conv2d(cb["conv"], x, stride=s,
                                 padding=(k - 1) // 2)))
        else:
            _, cin, cout, s, t = spec
            h = x
            if "expand" in b:
                e = b["expand"]
                h = apply_drelu(e["drelu"],
                                batchnorm(e["bn"], conv2d(e["conv"], h)))
            hidden = h.shape[-1]
            dw = b["dw"]
            h = apply_drelu(dw["drelu"], batchnorm(
                dw["bn"], conv2d(dw["conv"], h, stride=s, padding=1,
                                 groups=hidden)))
            h = batchnorm(b["project"]["bn"], conv2d(b["project"]["conv"], h))
            if s == 1 and cin == cout:
                h = h + x
            x = h
    return x


def mobilenet_v2_drelu_from_torch(
    sd: Mapping[str, Any],
    width_mult: float = 1.0,
    prefixes: Tuple[str, str] = ("before_layer3", "layer4"),
    split: int = 14,
) -> Params:
    """Convert the FaceMobilenet backbone split into before_layer3 /
    layer4 (features[:14] / features[14:], face_mobilenet_DReLU.py:259-260;
    nn.Sequential slicing PRESERVES the original module indices, so
    layer4's children keep names 14..18)."""
    plan, _ = _drelu_block_plan(width_mult)

    def loc(fi):
        return (f"{prefixes[0]}.{fi}" if fi < split
                else f"{prefixes[1]}.{fi}")

    def convbn_drelu(base):
        return {"conv": conv_from_torch(sd, f"{base}.0"),
                "bn": bn_from_torch(sd, f"{base}.1"),
                "drelu": drelu_from_torch(sd, f"{base}.2")}

    blocks = []
    for fi, spec in enumerate(plan):
        base = loc(fi)
        if spec[0] in ("stem", "last"):
            blocks.append({"convbn": convbn_drelu(base)})
        else:
            t = spec[4]
            b: Params = {}
            ci = 0
            if t != 1:
                b["expand"] = convbn_drelu(f"{base}.conv.{ci}")
                ci += 1
            b["dw"] = convbn_drelu(f"{base}.conv.{ci}")
            b["project"] = {"conv": conv_from_torch(sd, f"{base}.conv.{ci + 1}"),
                            "bn": bn_from_torch(sd, f"{base}.conv.{ci + 2}")}
            blocks.append(b)
    return {"blocks": blocks}


def init_face_mobilenet_drelu(
    key: jax.Array,
    num_joints: int = 68,
    width_mult: float = 1.0,
    use_regress: bool = False,
    use_heatmap: bool = True,
    use_aux: bool = False,
    deconv_filters: Sequence[int] = (256, 256, 256),
    deconv_kernels: Sequence[int] = (4, 4, 4),
    final_kernel: int = 1,
    deconv_with_bias: bool = False,
) -> Params:
    plan, last = _drelu_block_plan(width_mult)
    ks = iter(jax.random.split(key, 16))
    p: Params = {"backbone": init_mobilenet_v2_drelu(next(ks), width_mult)}
    if use_regress:
        p["fc"] = {
            "w": jax.random.normal(next(ks), (last, num_joints * 2)) * 0.01,
            "b": jnp.zeros((num_joints * 2,)),
        }
    def deconv_stack(cin, filters, kernels):
        out = []
        for cout, kk in zip(filters, kernels):
            out.append({"deconv": init_deconv(next(ks), cin, cout, kk,
                                              bias=deconv_with_bias),
                        "bn": init_bn(cout)})
            cin = cout
        return out, cin
    if use_heatmap:
        p["deconvs"], cin = deconv_stack(last, deconv_filters, deconv_kernels)
        p["final"] = init_conv(next(ks), cin, num_joints, final_kernel)
    if use_aux:
        p["aux_deconvs"], cin = deconv_stack(
            96, deconv_filters[1:], deconv_kernels[1:])
        p["aux_final"] = init_conv(next(ks), cin, num_joints, final_kernel)
    return p


def apply_face_mobilenet_drelu(
    params: Params,
    x: jnp.ndarray,
    width_mult: float = 1.0,
    deconv_kernels: Sequence[int] = (4, 4, 4),
    final_kernel: int = 1,
) -> Dict[str, jnp.ndarray]:
    """FaceMobilenet-DReLU forward (face_mobilenet_DReLU.py:303-324):
    returns whichever of regress / heatmap / heatmap_aux heads the params
    carry. c3 = features[:14] (96ch, 1/16), c4 = features[14:]."""
    c3 = apply_mobilenet_v2_drelu(params["backbone"], x, width_mult, stop=14)
    c4 = apply_mobilenet_v2_drelu(params["backbone"], c3, width_mult, start=14)
    out: Dict[str, jnp.ndarray] = {}
    if "fc" in params:
        pooled = jnp.mean(c4, axis=(1, 2))
        out["regress"] = pooled @ params["fc"]["w"] + params["fc"]["b"]

    def run_head(h, deconvs, kernels, final):
        for d, kk in zip(deconvs, kernels):
            pad, opad = _deconv_pad(kk)
            h = jax.nn.relu(batchnorm(
                d["bn"], conv_transpose2d(d["deconv"], h, stride=2,
                                          padding=pad, output_padding=opad)))
        return conv2d(final, h, padding=1 if final_kernel == 3 else 0)

    if "deconvs" in params:
        out["heatmap"] = run_head(c4, params["deconvs"], deconv_kernels,
                                  params["final"])
    if "aux_deconvs" in params:
        out["heatmap_aux"] = run_head(c3, params["aux_deconvs"],
                                      deconv_kernels[1:],
                                      params["aux_final"])
    return out


# --------------------------------------------------------------------------
# MobileHead (mobile_head.py:14-72): bilinear-upsample + mobile_block
# InvertedResidual stages + 1x1 final conv — the use_mobile_head heatmap
# decoder of the denseReg/eyeBranch/mutiScale FaceMobilenet variants.
# --------------------------------------------------------------------------

MOBILE_HEAD_SETTING = ((3, 256, 3, 2), (3, 128, 3, 2), (3, 64, 3, 1))


def _fixed_pad(x, kernel_size, dilation=1):
    """mobile_block.py fixed_padding: SAME-style asymmetric pad."""
    eff = kernel_size + (kernel_size - 1) * (dilation - 1)
    beg = (eff - 1) // 2
    end = eff - 1 - beg
    return jnp.pad(x, ((0, 0), (beg, end), (beg, end), (0, 0)))


def init_mobile_head(key: jax.Array, inp: int, out: int,
                     setting=MOBILE_HEAD_SETTING) -> Params:
    n = sum(s[3] for s in setting)
    ki = iter(jax.random.split(key, 3 * n + 1))
    blocks = []
    inplanes = inp
    for expand, planes, k, nums in setting:
        for _ in range(nums):
            hidden = min(round(inplanes * expand), 768)
            b: Params = {}
            if expand != 1:
                b["expand"] = {"conv": init_conv(next(ki), inplanes, hidden,
                                                 1, bias=False),
                               "bn": init_bn(hidden)}
            b["dw"] = {"conv": init_conv(next(ki), 1, hidden, k, bias=False),
                       "bn": init_bn(hidden)}
            b["project"] = {"conv": init_conv(next(ki), hidden, planes, 1,
                                              bias=False),
                            "bn": init_bn(planes)}
            blocks.append(b)
            inplanes = planes
    return {"blocks": blocks,
            "final": init_conv(next(ki), inplanes, out, 1)}


def apply_mobile_head(params: Params, x: jnp.ndarray,
                      setting=MOBILE_HEAD_SETTING,
                      upsample_scale: int = 2) -> jnp.ndarray:
    """mobile_head.py MobileHead.forward: per stage a bilinear 2x upsample
    (align_corners=False) then `nums` kernel-k stride-1 InvertedResiduals
    (mobile_block.py:24-66, fixed padding, 768 hidden cap), then final
    1x1 conv."""
    from dfanerf_tpu.models.perception.mobilenet import _relu6

    bi = 0
    inplanes = x.shape[-1]
    for expand, planes, k, nums in setting:
        n, h, w, c = x.shape
        x = jax.image.resize(
            x, (n, h * upsample_scale, w * upsample_scale, c), "linear"
        )
        for _ in range(nums):
            b = params["blocks"][bi]
            bi += 1
            res = x
            hpad = _fixed_pad(x, k)
            hcur = hpad
            if "expand" in b:
                hcur = _relu6(batchnorm(b["expand"]["bn"],
                                        conv2d(b["expand"]["conv"], hpad)))
            hidden = hcur.shape[-1]
            hcur = _relu6(batchnorm(b["dw"]["bn"],
                                    conv2d(b["dw"]["conv"], hcur, stride=1,
                                           padding=0, groups=hidden)))
            hcur = batchnorm(b["project"]["bn"],
                             conv2d(b["project"]["conv"], hcur))
            if inplanes == planes:
                hcur = res + hcur
            x = hcur
            inplanes = planes
    return conv2d(params["final"], x)


def mobile_head_from_torch(sd: Mapping[str, Any],
                           setting=MOBILE_HEAD_SETTING,
                           prefix: str = "") -> Params:
    """Convert a torch MobileHead state_dict. Upsample modules own a
    sequential slot but no params; InvertedResidual conv indices follow
    mobile_block.py (expand 0-1, dw 3-4, project 6-7 / expand-free 0-1,
    3-4)."""
    pfx = f"{prefix}." if prefix else ""

    def convbn(cname, bname):
        return {"conv": conv_from_torch(sd, cname),
                "bn": bn_from_torch(sd, bname)}

    blocks = []
    seq = 0
    for expand, planes, k, nums in setting:
        seq += 1  # the Upsample slot
        for _ in range(nums):
            base = f"{pfx}mobile_module.{seq}.conv"
            b: Params = {}
            if expand != 1:
                b["expand"] = convbn(f"{base}.0", f"{base}.1")
                b["dw"] = convbn(f"{base}.3", f"{base}.4")
                b["project"] = convbn(f"{base}.6", f"{base}.7")
            else:
                b["dw"] = convbn(f"{base}.0", f"{base}.1")
                b["project"] = convbn(f"{base}.3", f"{base}.4")
            blocks.append(b)
            seq += 1
    return {"blocks": blocks,
            "final": conv_from_torch(sd, f"{pfx}final_layer")}


# --------------------------------------------------------------------------
# FaceMobilenet regress-head variants (face_mobilenet_denseReg.py,
# _eyeBranch.py, _mutiScale.py). Only their functional paths are
# implemented: in all three reference files the use_heatmap branch
# references an undefined `c4` (e.g. face_mobilenet_denseReg.py:279 in a
# forward that only computes c3) and would raise NameError — broken
# upstream, so it is explicitly out of contract here.
# --------------------------------------------------------------------------


def apply_face_mobilenet_densereg(
    params: Params, x: jnp.ndarray, dense: bool = True,
    width_mult: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """denseReg variant (face_mobilenet_denseReg.py:262-292): c3 =
    features[:14]; regress = 1x1 conv on c3 (dense) or FC on pooled c3;
    optional aux deconv heatmap head on c3."""
    c3 = _apply_mnv2_slice(params["backbone"], x, 0, 14, width_mult)
    out: Dict[str, jnp.ndarray] = {}
    if dense:
        out["regress"] = conv2d(params["regress_conv"], c3)
    else:
        pooled = jnp.mean(c3, axis=(1, 2))
        out["regress"] = pooled @ params["fc"]["w"] + params["fc"]["b"]
    if "aux_deconvs" in params:
        h = c3
        for d in params["aux_deconvs"]:
            pad, opad = _deconv_pad(4)
            h = jax.nn.relu(batchnorm(
                d["bn"], conv_transpose2d(d["deconv"], h, stride=2,
                                          padding=pad, output_padding=opad)))
        out["heatmap_aux"] = conv2d(params["aux_final"], h)
    return out


def face_mobilenet_densereg_from_torch(sd: Mapping[str, Any],
                                       width_mult: float = 1.0) -> Params:
    from dfanerf_tpu.models.perception.mobilenet import mobilenet_v2_from_torch

    p: Params = {"backbone": mobilenet_v2_from_torch(
        sd, width_mult, prefix="before_layer3", n_blocks=14)}
    if "last_regress_layer.weight" in sd:
        p["regress_conv"] = conv_from_torch(sd, "last_regress_layer")
    elif "last_regress_layer.1.weight" in sd:
        p["fc"] = {"w": jnp.asarray(_np32(sd["last_regress_layer.1.weight"]).T),
                   "b": jnp.asarray(_np32(sd["last_regress_layer.1.bias"]))}
    if "aux_deconv_layers.0.weight" in sd:
        n_aux = len([k for k in sd
                     if k.startswith("aux_deconv_layers")
                     and k.endswith(".weight")
                     and "running" not in k]) // 2
        p["aux_deconvs"] = [
            {"deconv": deconv_from_torch(sd, f"aux_deconv_layers.{3 * i}"),
             "bn": bn_from_torch(sd, f"aux_deconv_layers.{3 * i + 1}")}
            for i in range(n_aux)
        ]
        p["aux_final"] = conv_from_torch(sd, "aux_deconv_final_layer")
    return p


# the staged split shared by eyeBranch/mutiScale
# (face_mobilenet_eyeBranch.py:203-208): plan-index boundaries of
# down_sample / stage1..4 / final_stage
_STAGE_BOUNDS = (1, 3, 5, 8, 15, 19)


def _staged_features(params, x, width_mult=1.0):
    feats = []
    start = 0
    for stop in _STAGE_BOUNDS:
        x = _apply_mnv2_slice(params["backbone"], x, start, stop, width_mult)
        feats.append(x)
        start = stop
    return feats  # [down, s1, s2, s3(x1), s4(x2), final(x3)]


def apply_face_mobilenet_eyebranch(
    params: Params, x: jnp.ndarray, width_mult: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """eyeBranch variant (face_mobilenet_eyeBranch.py:281-306): face
    regress FC on pooled final features + an eye branch (grouped ConvBNReLU
    stack on stage4, pooled, FC -> NUM_EYE_JOINTS*4)."""
    from dfanerf_tpu.models.perception.mobilenet import _relu6

    feats = _staged_features(params, x, width_mult)
    x2, x3 = feats[4], feats[5]
    pooled = jnp.mean(x3, axis=(1, 2))
    out = {"regress": pooled @ params["fc"]["w"] + params["fc"]["b"]}
    h = x2
    for i, cb in enumerate(params["s4_conv"]):
        groups = 1 if i == 0 else 8
        h = _relu6(batchnorm(cb["bn"], conv2d(cb["conv"], h, padding=1,
                                              groups=groups)))
    hp = jnp.mean(h, axis=(1, 2))
    out["s4_regress"] = hp @ params["s4_fc"]["w"] + params["s4_fc"]["b"]
    return out


def apply_face_mobilenet_mutiscale(
    params: Params, x: jnp.ndarray, width_mult: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """mutiScale variant (face_mobilenet_mutiScale.py:266-288): regress FC
    on the concat of pooled stage3/stage4/final features (64+160+1280)."""
    feats = _staged_features(params, x, width_mult)
    x1 = jnp.mean(feats[3], axis=(1, 2))
    x2 = jnp.mean(feats[4], axis=(1, 2))
    x3 = jnp.mean(feats[5], axis=(1, 2))
    multi = jnp.concatenate([x1, x2, x3], axis=1)
    return {"regress": multi @ params["fc"]["w"] + params["fc"]["b"]}


def _lin_from_torch(sd, name):
    return {"w": jnp.asarray(_np32(sd[f"{name}.weight"]).T),
            "b": jnp.asarray(_np32(sd[f"{name}.bias"]))}


def face_mobilenet_staged_from_torch(sd: Mapping[str, Any],
                                     width_mult: float = 1.0) -> Params:
    """Converter for the eyeBranch/mutiScale staged backbones: modules are
    named down_sample / stage1..4 / final_stage with ORIGINAL feature
    indices preserved by nn.Sequential slicing."""
    from dfanerf_tpu.models.perception.mobilenet import _block_plan

    plan, _ = _block_plan(width_mult)
    names = ["down_sample"] + [
        f"stage{i}" for i in range(1, 5)
    ] + ["final_stage"]

    def group_of(fi):
        for gi, stop in enumerate(_STAGE_BOUNDS):
            if fi < stop:
                return names[gi]
        raise IndexError(fi)

    def convbn(cname, bname):
        return {"conv": conv_from_torch(sd, cname),
                "bn": bn_from_torch(sd, bname)}

    blocks = []
    for fi, spec in enumerate(plan):
        g = group_of(fi)
        base = g if g == "down_sample" else f"{g}.{fi}"
        if spec[0] in ("stem", "last"):
            blocks.append({"kind": spec[0],
                           "convbn": convbn(f"{base}.0", f"{base}.1")})
        else:
            t = spec[4]
            b: Params = {"kind": "ir"}
            ci = 0
            if t != 1:
                b["expand"] = convbn(f"{base}.conv.{ci}.0",
                                     f"{base}.conv.{ci}.1")
                ci += 1
            b["dw"] = convbn(f"{base}.conv.{ci}.0", f"{base}.conv.{ci}.1")
            b["project"] = convbn(f"{base}.conv.{ci + 1}",
                                  f"{base}.conv.{ci + 2}")
            blocks.append(b)
    p: Params = {"backbone": {"blocks": blocks}}
    if "fc_layers.1.weight" in sd:
        p["fc"] = _lin_from_torch(sd, "fc_layers.1")
    if "s4_conv_layer.0.0.weight" in sd:
        p["s4_conv"] = [convbn(f"s4_conv_layer.{i}.0", f"s4_conv_layer.{i}.1")
                        for i in range(3)]
        p["s4_fc"] = _lin_from_torch(sd, "s4_fc_layers.1")
    return p


# --------------------------------------------------------------------------
# FAN stacked hourglass with CoordConv (face_net.py + core/coord_conv.py):
# pre-activation ConvBlocks (BN-ReLU-conv x3, split-channel concat),
# recursive hourglass with avg-pool down / nearest up, CoordConvTh stem
# and per-module boundary-aware CoordConv.
# --------------------------------------------------------------------------


def _add_coords(x: jnp.ndarray, heatmap=None, with_r=True,
                with_boundary=False):
    """AddCoordsTh.forward (coord_conv.py:13-75) in NHWC: xx varies along
    H normalized by (H-1), yy along W by (W-1), both in [-1, 1]; optional
    radius channel and boundary-masked coords from heatmap[..., -1]."""
    n, h, w, c = x.shape
    xx = jnp.broadcast_to(
        (jnp.arange(h, dtype=jnp.float32)[:, None] / (h - 1)) * 2 - 1,
        (h, w))[None, :, :, None]
    yy = jnp.broadcast_to(
        (jnp.arange(w, dtype=jnp.float32)[None, :] / (w - 1)) * 2 - 1,
        (h, w))[None, :, :, None]
    xx = jnp.broadcast_to(xx, (n, h, w, 1))
    yy = jnp.broadcast_to(yy, (n, h, w, 1))
    parts = [x, xx, yy]
    if with_r:
        rr = jnp.sqrt(xx ** 2 + yy ** 2)
        parts.append(rr / jnp.max(rr))
    if with_boundary and heatmap is not None:
        b = jnp.clip(heatmap[..., -1:], 0.0, 1.0)
        parts += [jnp.where(b > 0.05, xx, 0.0), jnp.where(b > 0.05, yy, 0.0)]
    return jnp.concatenate(parts, axis=-1)


def _conv_block(p, x):
    """face_net.py ConvBlock: three BN-ReLU-conv stages producing
    out/2 + out/4 + out/4 concat, with a BN-ReLU-1x1 downsample shortcut
    when channels change."""
    o1 = conv2d(p["conv1"], jax.nn.relu(batchnorm(p["bn1"], x)), padding=1)
    o2 = conv2d(p["conv2"], jax.nn.relu(batchnorm(p["bn2"], o1)), padding=1)
    o3 = conv2d(p["conv3"], jax.nn.relu(batchnorm(p["bn3"], o2)), padding=1)
    out = jnp.concatenate([o1, o2, o3], axis=-1)
    if "down" in p:
        res = conv2d(p["down"]["conv"], jax.nn.relu(
            batchnorm(p["down"]["bn"], x)))
    else:
        res = x
    return out + res


def _avg_pool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def _hourglass(p, level, x):
    """HourGlass._forward (face_net.py:108-138), depth-recursive."""
    from dfanerf_tpu.models.perception.common import resize_nearest

    up1 = _conv_block(p[f"b1_{level}"], x)
    low1 = _conv_block(p[f"b2_{level}"], _avg_pool2(x))
    if level > 1:
        low2 = _hourglass(p, level - 1, low1)
    else:
        low2 = _conv_block(p[f"b2_plus_{level}"], low1)
    low3 = _conv_block(p[f"b3_{level}"], low2)
    up2 = resize_nearest(low3, (up1.shape[1], up1.shape[2]))
    return up1 + up2


def apply_fan(params: Params, x: jnp.ndarray, num_modules: int = 1,
              end_relu: bool = False):
    """FAN.forward (face_net.py:193-228): CoordConv stem -> ConvBlocks ->
    stacked (CoordConv hourglass -> top ConvBlock -> 1x1 head) with
    intermediate supervision. Returns (outputs, boundary_channels)."""
    h_in = _add_coords(x, with_r=True, with_boundary=False)
    h = conv2d(params["conv1"], h_in, stride=2, padding=3)
    h = jax.nn.relu(batchnorm(params["bn1"], h))
    h = _avg_pool2(_conv_block(params["conv2"], h))
    h = _conv_block(params["conv3"], h)
    h = _conv_block(params["conv4"], h)
    previous = h
    outputs, boundaries = [], []
    tmp_out = None
    for i in range(num_modules):
        m = params[f"m{i}"]
        hg_in = _add_coords(previous, tmp_out, with_r=True,
                            with_boundary=True)
        boundary = hg_in[..., -2:]
        hg = _hourglass(m, 4, conv2d(m["coordconv"], hg_in))
        ll = _conv_block(params[f"top_m_{i}"], hg)
        ll = jax.nn.relu(batchnorm(params[f"bn_end{i}"],
                                   conv2d(params[f"conv_last{i}"], ll)))
        tmp_out = conv2d(params[f"l{i}"], ll)
        if end_relu:
            tmp_out = jax.nn.relu(tmp_out)
        outputs.append(tmp_out)
        boundaries.append(boundary)
        if i < num_modules - 1:
            ll = conv2d(params[f"bl{i}"], ll)
            previous = previous + ll + conv2d(params[f"al{i}"], tmp_out)
    return outputs, boundaries


def fan_from_torch(sd: Mapping[str, Any], num_modules: int = 1) -> Params:
    def convblock(prefix):
        p = {
            "bn1": bn_from_torch(sd, f"{prefix}.bn1"),
            "conv1": conv_from_torch(sd, f"{prefix}.conv1"),
            "bn2": bn_from_torch(sd, f"{prefix}.bn2"),
            "conv2": conv_from_torch(sd, f"{prefix}.conv2"),
            "bn3": bn_from_torch(sd, f"{prefix}.bn3"),
            "conv3": conv_from_torch(sd, f"{prefix}.conv3"),
        }
        if f"{prefix}.downsample.0.weight" in sd:
            p["down"] = {"bn": bn_from_torch(sd, f"{prefix}.downsample.0"),
                         "conv": conv_from_torch(sd, f"{prefix}.downsample.2")}
        return p

    p: Params = {
        "conv1": conv_from_torch(sd, "conv1.conv"),
        "bn1": bn_from_torch(sd, "bn1"),
        "conv2": convblock("conv2"),
        "conv3": convblock("conv3"),
        "conv4": convblock("conv4"),
    }
    for i in range(num_modules):
        m: Params = {"coordconv": conv_from_torch(sd, f"m{i}.coordconv.conv")}
        for level in range(4, 0, -1):
            m[f"b1_{level}"] = convblock(f"m{i}.b1_{level}")
            m[f"b2_{level}"] = convblock(f"m{i}.b2_{level}")
            m[f"b3_{level}"] = convblock(f"m{i}.b3_{level}")
            if level == 1:
                m[f"b2_plus_{level}"] = convblock(f"m{i}.b2_plus_{level}")
        p[f"m{i}"] = m
        p[f"top_m_{i}"] = convblock(f"top_m_{i}")
        p[f"conv_last{i}"] = conv_from_torch(sd, f"conv_last{i}")
        p[f"bn_end{i}"] = bn_from_torch(sd, f"bn_end{i}")
        p[f"l{i}"] = conv_from_torch(sd, f"l{i}")
        if i < num_modules - 1:
            p[f"bl{i}"] = conv_from_torch(sd, f"bl{i}")
            p[f"al{i}"] = conv_from_torch(sd, f"al{i}")
    return p


# --------------------------------------------------------------------------
# Mobile HRNet (pose_mobile_hrnet.py): the HRNet multi-branch skeleton
# with 'MOBILE' InvertedResidual blocks — biased convs, ReLU6, fixed
# padding applied to the BLOCK INPUT (so the 1x1 expand sees the zero
# border), nearest-upsample fuse, IR layer1 stem.
# --------------------------------------------------------------------------

# (num_modules, num_branches, num_blocks_per_branch, channels) per stage
MOBILE_HRNET_STAGES = (
    (1, 2, (4, 4), (18, 36)),
    (4, 3, (4, 4, 4), (18, 36, 72)),
    (3, 4, (4, 4, 4, 4), (18, 36, 72, 144)),
)


def _mobile_ir(p, x, stride=1):
    """pose_mobile_hrnet.py InvertedResidual (expansion 6, k=3, biased
    convs, ReLU6, fixed input padding)."""
    from dfanerf_tpu.models.perception.mobilenet import _relu6

    xp = _fixed_pad(x, 3)
    h = _relu6(batchnorm(p["pw1"]["bn"], conv2d(p["pw1"]["conv"], xp)))
    h = _relu6(batchnorm(p["dw"]["bn"],
                         conv2d(p["dw"]["conv"], h, stride=stride, padding=0,
                                groups=h.shape[-1])))
    h = batchnorm(p["pw2"]["bn"], conv2d(p["pw2"]["conv"], h))
    if stride == 1 and x.shape[-1] == h.shape[-1]:
        h = h + x
    return h


def apply_mobile_hrnet(
    params: Params, x: jnp.ndarray, stages=MOBILE_HRNET_STAGES,
) -> jnp.ndarray:
    """pose_mobile_hrnet.py PoseHighResolutionNet.forward: /4 stem, 4 IR
    layer1 blocks, 3 HR stages with MOBILE branches + SUM fuse (nearest
    upsample), final conv on branch 0."""
    from dfanerf_tpu.models.perception.common import resize_nearest

    h = jax.nn.relu(batchnorm(params["bn1"],
                              conv2d(params["conv1"], x, stride=2, padding=1)))
    h = jax.nn.relu(batchnorm(params["bn2"],
                              conv2d(params["conv2"], h, stride=2, padding=1)))
    for b in params["layer1"]:
        h = _mobile_ir(b, h)
    feats = [h]
    for si, (n_modules, n_branches, n_blocks, channels) in enumerate(stages):
        trans = params[f"transition{si + 1}"]
        new_feats = []
        for bi in range(n_branches):
            if trans[bi] is not None:
                # a non-None transition always reads the LAST prior branch
                # (pose_mobile_hrnet.py:492-507 y_list[-1])
                t = feats[-1]
                for cb in trans[bi]:
                    stride = 2 if bi >= len(feats) else 1
                    t = jax.nn.relu(batchnorm(
                        cb["bn"], conv2d(cb["conv"], t, stride=stride,
                                         padding=1)))
                new_feats.append(t)
            else:
                new_feats.append(feats[bi])
        feats = new_feats
        for mi in range(n_modules):
            mod = params[f"stage{si + 2}"][mi]
            multi_out = not (si == len(stages) - 1 and mi == n_modules - 1)
            outs = []
            bs = []
            for bi in range(n_branches):
                hb = feats[bi]
                for blk in mod["branches"][bi]:
                    hb = _mobile_ir(blk, hb)
                bs.append(hb)
            n_out = n_branches if multi_out else 1
            for i in range(n_out):
                fl = mod["fuse"][i]
                y = None
                for j in range(n_branches):
                    if i == j:
                        contrib = bs[j]
                    elif j > i:
                        f = fl[j]
                        contrib = batchnorm(f["bn"], conv2d(f["conv"], bs[j]))
                        contrib = resize_nearest(
                            contrib, (bs[i].shape[1], bs[i].shape[2]))
                    else:
                        contrib = bs[j]
                        for k, f in enumerate(fl[j]):
                            contrib = batchnorm(
                                f["bn"], conv2d(f["conv"], contrib, stride=2,
                                                padding=1))
                            if k < len(fl[j]) - 1:
                                contrib = jax.nn.relu(contrib)
                    y = contrib if y is None else y + contrib
                outs.append(jax.nn.relu(y))
            feats = outs
    return conv2d(params["final"], feats[0])


def mobile_hrnet_from_torch(
    sd: Mapping[str, Any], stages=MOBILE_HRNET_STAGES,
) -> Params:
    def convbn(cname, bname):
        return {"conv": conv_from_torch(sd, cname),
                "bn": bn_from_torch(sd, bname)}

    def ir(prefix):
        # expansion 6 layout: conv.{0 pw1, 1 bn, 3 dw, 4 bn, 6 pw2, 7 bn}
        return {"pw1": convbn(f"{prefix}.conv.0", f"{prefix}.conv.1"),
                "dw": convbn(f"{prefix}.conv.3", f"{prefix}.conv.4"),
                "pw2": convbn(f"{prefix}.conv.6", f"{prefix}.conv.7")}

    p: Params = {
        "conv1": conv_from_torch(sd, "conv1"),
        "bn1": bn_from_torch(sd, "bn1"),
        "conv2": conv_from_torch(sd, "conv2"),
        "bn2": bn_from_torch(sd, "bn2"),
        "layer1": [ir(f"layer1.{i}") for i in range(4)],
    }
    prev_branches = 1
    for si, (n_modules, n_branches, n_blocks, channels) in enumerate(stages):
        trans = []
        for bi in range(n_branches):
            base = f"transition{si + 1}.{bi}"
            if f"{base}.0.weight" in sd:
                trans.append([convbn(f"{base}.0", f"{base}.1")])
            elif f"{base}.0.0.weight" in sd:
                seq = []
                k = 0
                while f"{base}.{k}.0.weight" in sd:
                    seq.append(convbn(f"{base}.{k}.0", f"{base}.{k}.1"))
                    k += 1
                trans.append(seq)
            else:
                trans.append(None)
        p[f"transition{si + 1}"] = trans
        mods = []
        for mi in range(n_modules):
            mb = f"stage{si + 2}.{mi}"
            branches = [
                [ir(f"{mb}.branches.{bi}.{blk}")
                 for blk in range(n_blocks[bi])]
                for bi in range(n_branches)
            ]
            multi_out = not (si == len(stages) - 1 and mi == n_modules - 1)
            n_out = n_branches if multi_out else 1
            fuse = []
            for i in range(n_out):
                fl = []
                for j in range(n_branches):
                    fb = f"{mb}.fuse_layers.{i}.{j}"
                    if i == j:
                        fl.append(None)
                    elif j > i:
                        fl.append(convbn(f"{fb}.0", f"{fb}.1"))
                    else:
                        fl.append([convbn(f"{fb}.{k}.0", f"{fb}.{k}.1")
                                   for k in range(i - j)])
                fuse.append(fl)
            mods.append({"branches": branches, "fuse": fuse})
        p[f"stage{si + 2}"] = mods
        prev_branches = n_branches
    p["final"] = conv_from_torch(sd, "final_layer")
    return p


# --------------------------------------------------------------------------
# Generalized GhostNet eye encoder-decoder (eye_encoder_decoder.py /
# _half.py): the ported 300w variant (ghostnet_eye.py) plus this family's
# extra knobs — RGB input, brow channels (+9), optional gaussian-modulate
# depthwise conv on the heatmaps, addition encoder/decoder layers, and
# per-stage decoder upsample scales.
# --------------------------------------------------------------------------

EYE_ENCODER_SETS = (
    (3, 16, 16, 0, 1), (3, 48, 24, 0, 2), (3, 72, 24, 0, 1),
    (5, 72, 40, 1, 2), (5, 120, 40, 1, 1), (3, 240, 80, 0, 2),
)
EYE_ENCODER_ADD_SETS = (
    (3, 200, 80, 0, 1), (3, 184, 80, 0, 1), (3, 184, 80, 0, 1),
    (3, 480, 112, 1, 1), (3, 672, 112, 1, 1),
)
EYE_DECODER_SETS = ((4, 120, 40, 1, 2), (4, 72, 40, 1, 2), (4, 72, 24, 1, 2))
EYE_DECODER_ADD_SETS = ((4, 184, 80, 1, 2), (4, 120, 80, 1, 2),
                        (4, 72, 40, 1, 2))


def eye_net_sets(addition_encoder: int = 0, addition_decoder: bool = False):
    """get_eye_net's set construction (eye_encoder_decoder.py:249-283)."""
    enc = list(EYE_ENCODER_SETS)
    if addition_encoder:
        enc += list(EYE_ENCODER_ADD_SETS[:addition_encoder])
    dec = list(EYE_DECODER_ADD_SETS if addition_decoder else EYE_DECODER_SETS)
    return tuple(enc), tuple(dec)


def dm_kernel(num_joints: int, sigma: float) -> jnp.ndarray:
    """Gaussian-modulation depthwise kernel (eye_encoder_decoder.py:
    171-188): size = 2*3*sigma + 1, one gaussian per joint channel."""
    size = int(2 * (sigma * 3) + 1)
    x = jnp.arange(size, dtype=jnp.float32)
    y = x[:, None]
    x0 = y0 = size // 2
    g = jnp.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2.0 * sigma ** 2))
    # HWIO depthwise kernel [size, size, 1, num_joints]
    return jnp.broadcast_to(g[:, :, None, None], (size, size, 1, num_joints))


def apply_eye_net_general(
    params: Params,
    x: jnp.ndarray,
    encoder_sets=EYE_ENCODER_SETS,
    decoder_sets=EYE_DECODER_SETS,
    num_joints: int = 6,
    gaussian_sigma: float = 0.0,
) -> jnp.ndarray:
    """GhostNet.forward of the eye family: stem /2, ghost-bottleneck
    encoder, (upsample x s + bottleneck) decoder, 1x1 final (+ optional
    gaussian-modulation depthwise conv)."""
    from dfanerf_tpu.models.perception.ghostnet_eye import (
        _bottleneck, _divisible,
    )

    x = jax.nn.relu(batchnorm(
        params["stem"]["bn"], conv2d(params["stem"]["conv"], x, stride=2,
                                     padding=1)))
    for p, (k, hidden, c, use_se, s) in zip(params["features"], encoder_sets):
        x = _bottleneck(p, x, _divisible(hidden), _divisible(c), k, s, use_se)
    for p, (k, hidden, c, use_se, s) in zip(params["head"], decoder_sets):
        x = jax.image.resize(
            x, (x.shape[0], x.shape[1] * s, x.shape[2] * s, x.shape[3]),
            "linear",
        )
        x = _bottleneck(p, x, _divisible(hidden), _divisible(c), k, 1, use_se)
    x = conv2d(params["final"], x)
    if gaussian_sigma > 0:
        size = int(2 * (gaussian_sigma * 3) + 1)
        pad = size // 2
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        x = jax.lax.conv_general_dilated(
            x, dm_kernel(num_joints, gaussian_sigma), (1, 1), "VALID",
            feature_group_count=num_joints,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    return x


def eye_net_general_from_torch(
    sd: Mapping[str, Any],
    encoder_sets=EYE_ENCODER_SETS,
    decoder_sets=EYE_DECODER_SETS,
) -> Params:
    from dfanerf_tpu.models.perception.ghostnet_eye import eye_net_from_torch

    def convbn(cname, bname):
        return {"conv": conv_from_torch(sd, cname),
                "bn": bn_from_torch(sd, bname)}

    def ghost(prefix):
        return {"primary": convbn(f"{prefix}.primary_conv.0",
                                  f"{prefix}.primary_conv.1"),
                "cheap": convbn(f"{prefix}.cheap_operation.0",
                                f"{prefix}.cheap_operation.1")}

    def bottleneck(prefix, stride, use_se):
        p = {"ghost1": ghost(f"{prefix}.conv.0")}
        if stride == 2:
            p["dw"] = convbn(f"{prefix}.conv.1.0", f"{prefix}.conv.1.1")
        if use_se:
            p["se"] = {"fc1": _lin_from_torch(sd, f"{prefix}.conv.2.fc.0"),
                       "fc2": _lin_from_torch(sd, f"{prefix}.conv.2.fc.2")}
        p["ghost2"] = ghost(f"{prefix}.conv.3")
        if f"{prefix}.shortcut.0.0.weight" in sd:
            p["shortcut"] = {
                "dw": convbn(f"{prefix}.shortcut.0.0",
                             f"{prefix}.shortcut.0.1"),
                "pw": convbn(f"{prefix}.shortcut.1", f"{prefix}.shortcut.2"),
            }
        return p

    return {
        "stem": convbn("features.0.0", "features.0.1"),
        "features": [bottleneck(f"features.{i + 1}", s, se)
                     for i, (k, h, c, se, s) in enumerate(encoder_sets)],
        "head": [bottleneck(f"head.{2 * i + 1}", 1, se)
                 for i, (k, h, c, se, s) in enumerate(decoder_sets)],
        "final": conv_from_torch(sd, "final_layer"),
    }


# --------------------------------------------------------------------------
# Regression-style GhostNet eye nets (eye_ghostnet.py / eye_fullGhostnet.py
# :110-175): encoder bottlenecks -> 1x1 squeeze + global pool ->
# Linear + BatchNorm1d + ReLU + Linear classifier emitting 2K coords
# directly (no heatmaps). fullGhostnet only lengthens the sets list.
# --------------------------------------------------------------------------

EYE_GHOSTNET_SETS = (
    (3, 16, 16, 0, 1), (3, 48, 24, 0, 2), (3, 72, 24, 0, 1),
    (5, 72, 40, 1, 2), (5, 120, 40, 1, 1),
)
EYE_FULL_GHOSTNET_SETS = EYE_GHOSTNET_SETS + (
    (3, 240, 80, 0, 2), (3, 200, 80, 0, 1), (3, 184, 80, 0, 1),
)


def apply_eye_ghostnet_regress(
    params: Params, x: jnp.ndarray, sets=EYE_GHOSTNET_SETS,
) -> jnp.ndarray:
    from dfanerf_tpu.models.perception.ghostnet_eye import (
        _bottleneck, _divisible,
    )

    x = jax.nn.relu(batchnorm(
        params["stem"]["bn"], conv2d(params["stem"]["conv"], x, stride=2,
                                     padding=1)))
    for p, (k, hidden, c, use_se, s) in zip(params["features"], sets):
        x = _bottleneck(p, x, _divisible(hidden), _divisible(c), k, s, use_se)
    x = jax.nn.relu(batchnorm(params["squeeze"]["bn"],
                              conv2d(params["squeeze"]["conv"], x)))
    x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1) + flatten
    x = x @ params["cls1"]["w"]  # bias-free Linear
    bn = params["cls_bn"]
    x = bn["gamma"] * (x - bn["mean"]) / jnp.sqrt(bn["var"] + 1e-5) + bn["beta"]
    x = jax.nn.relu(x)
    return x @ params["cls2"]["w"] + params["cls2"]["b"]


def eye_ghostnet_regress_from_torch(
    sd: Mapping[str, Any], sets=EYE_GHOSTNET_SETS,
) -> Params:
    def convbn(cname, bname):
        return {"conv": conv_from_torch(sd, cname),
                "bn": bn_from_torch(sd, bname)}

    def ghost(prefix):
        return {"primary": convbn(f"{prefix}.primary_conv.0",
                                  f"{prefix}.primary_conv.1"),
                "cheap": convbn(f"{prefix}.cheap_operation.0",
                                f"{prefix}.cheap_operation.1")}

    def bottleneck(prefix, stride, use_se):
        p = {"ghost1": ghost(f"{prefix}.conv.0")}
        if stride == 2:
            p["dw"] = convbn(f"{prefix}.conv.1.0", f"{prefix}.conv.1.1")
        if use_se:
            p["se"] = {"fc1": _lin_from_torch(sd, f"{prefix}.conv.2.fc.0"),
                       "fc2": _lin_from_torch(sd, f"{prefix}.conv.2.fc.2")}
        p["ghost2"] = ghost(f"{prefix}.conv.3")
        if f"{prefix}.shortcut.0.0.weight" in sd:
            p["shortcut"] = {
                "dw": convbn(f"{prefix}.shortcut.0.0",
                             f"{prefix}.shortcut.0.1"),
                "pw": convbn(f"{prefix}.shortcut.1", f"{prefix}.shortcut.2"),
            }
        return p

    return {
        "stem": convbn("features.0.0", "features.0.1"),
        "features": [bottleneck(f"features.{i + 1}", s, se)
                     for i, (k, h, c, se, s) in enumerate(sets)],
        "squeeze": convbn("squeeze.0", "squeeze.1"),
        "cls1": {"w": jnp.asarray(_np32(sd["classifier.0.weight"]).T)},
        "cls_bn": bn_from_torch(sd, "classifier.1"),
        "cls2": _lin_from_torch(sd, "classifier.4"),
    }


# --------------------------------------------------------------------------
# PoseMobilenet (pose_mobilenet.py:160-232): full MobileNetV2 (incl. the
# final 1x1 to 1280) + ConvBNReLU-funnel MLP regress head and/or deconv
# heatmap head.
# --------------------------------------------------------------------------


def apply_pose_mobilenet(
    params: Params,
    x: jnp.ndarray,
    width_mult: float = 1.0,
    deconv_kernels: Sequence[int] = (4, 4, 4),
    final_kernel: int = 1,
) -> Dict[str, jnp.ndarray]:
    from dfanerf_tpu.models.perception.mobilenet import _relu6

    c3 = _apply_mnv2_slice(params["backbone"], x, 0, 14, width_mult)
    c4 = _apply_mnv2_slice(params["backbone"], c3, 14, 19, width_mult)
    out: Dict[str, jnp.ndarray] = {}
    if "inter" in params:
        h = c4
        for cb in params["inter"]:
            h = _relu6(batchnorm(cb["bn"], conv2d(cb["conv"], h)))
        # torch flattens NCHW -> (C, H, W) order
        flat = h.transpose(0, 3, 1, 2).reshape(h.shape[0], -1)
        for i, lin in enumerate(params["fcs"]):
            flat = flat @ lin["w"] + lin["b"]
            if i < len(params["fcs"]) - 1:
                flat = jax.nn.relu(flat)
        out["regress"] = flat
    if "deconvs" in params:
        h = c4
        for d, kk in zip(params["deconvs"], deconv_kernels):
            pad, opad = _deconv_pad(kk)
            h = jax.nn.relu(batchnorm(
                d["bn"], conv_transpose2d(d["deconv"], h, stride=2,
                                          padding=pad, output_padding=opad)))
        out["heatmap"] = conv2d(params["final"], h,
                                padding=1 if final_kernel == 3 else 0)
    return out


def pose_mobilenet_from_torch(sd: Mapping[str, Any],
                              width_mult: float = 1.0,
                              n_deconvs: int = 3) -> Params:
    from dfanerf_tpu.models.perception.mobilenet import mobilenet_v2_from_torch

    # before_layer3/layer4 keep original feature indices; stitch them back
    # into one flat block list for the shared plan walker
    renamed = dict(sd)
    p: Params = {"backbone": mobilenet_v2_drelu_keyless(renamed, width_mult)}
    if "intermediate_layers.0.0.weight" in sd:
        p["inter"] = [
            {"conv": conv_from_torch(sd, f"intermediate_layers.{i}.0"),
             "bn": bn_from_torch(sd, f"intermediate_layers.{i}.1")}
            for i in range(2)
        ]
        p["fcs"] = [_lin_from_torch(sd, f"fc_layers.{i}")
                    for i in (1, 4, 6)]
    if "deconv_layers.0.weight" in sd:
        p["deconvs"] = [
            {"deconv": deconv_from_torch(sd, f"deconv_layers.{3 * i}"),
             "bn": bn_from_torch(sd, f"deconv_layers.{3 * i + 1}")}
            for i in range(n_deconvs)
        ]
        p["final"] = conv_from_torch(sd, "deconv_final_layer")
    return p


def mobilenet_v2_drelu_keyless(sd, width_mult=1.0,
                               prefixes=("before_layer3", "layer4"),
                               split: int = 14) -> Params:
    """Plain-ReLU6 MobileNetV2 blocks from a before_layer3/layer4 split
    state_dict (pose_mobilenet.py:183-184; module indices preserved)."""
    from dfanerf_tpu.models.perception.mobilenet import _block_plan

    plan, _ = _block_plan(width_mult)

    def loc(fi):
        return (f"{prefixes[0]}.{fi}" if fi < split else f"{prefixes[1]}.{fi}")

    def convbn(cname, bname):
        return {"conv": conv_from_torch(sd, cname),
                "bn": bn_from_torch(sd, bname)}

    blocks = []
    for fi, spec in enumerate(plan):
        base = loc(fi)
        if spec[0] in ("stem", "last"):
            blocks.append({"kind": spec[0],
                           "convbn": convbn(f"{base}.0", f"{base}.1")})
        else:
            t = spec[4]
            b: Params = {"kind": "ir"}
            ci = 0
            if t != 1:
                b["expand"] = convbn(f"{base}.conv.{ci}.0",
                                     f"{base}.conv.{ci}.1")
                ci += 1
            b["dw"] = convbn(f"{base}.conv.{ci}.0", f"{base}.conv.{ci}.1")
            b["project"] = convbn(f"{base}.conv.{ci + 1}",
                                  f"{base}.conv.{ci + 2}")
            blocks.append(b)
    return {"blocks": blocks}


# --------------------------------------------------------------------------
# Plain FaceMobilenet with the EXACT deconv heads (face_mobilenet.py:
# 188-330, use_mobile_head=False): ReLU6 MobileNetV2 backbone split at 14,
# regress FC on pooled c4, deconv heatmap head on c4, aux deconv head on
# c3. (mobilenet.py's apply_face_mobilenet_heatmap keeps the
# bilinear-upsample head as a TPU-friendly alternative; this one is the
# reference's bit-exact head.)
# --------------------------------------------------------------------------


def apply_face_mobilenet_deconv(
    params: Params,
    x: jnp.ndarray,
    width_mult: float = 1.0,
    deconv_kernels: Sequence[int] = (4, 4, 4),
    final_kernel: int = 1,
) -> Dict[str, jnp.ndarray]:
    c3 = _apply_mnv2_slice(params["backbone"], x, 0, 14, width_mult)
    c4 = _apply_mnv2_slice(params["backbone"], c3, 14, 19, width_mult)
    out: Dict[str, jnp.ndarray] = {}
    if "fc" in params:
        pooled = jnp.mean(c4, axis=(1, 2))
        out["regress"] = pooled @ params["fc"]["w"] + params["fc"]["b"]
    if "deconvs" in params:
        out["heatmap"] = _deconv_head(params["deconvs"], params["final"],
                                      c4, deconv_kernels, final_kernel)
    if "aux_deconvs" in params:
        out["heatmap_aux"] = _deconv_head(
            params["aux_deconvs"], params["aux_final"], c3,
            deconv_kernels[1:], final_kernel)
    return out


def face_mobilenet_deconv_from_torch(sd: Mapping[str, Any],
                                     width_mult: float = 1.0,
                                     n_deconvs: int = 3) -> Params:
    p: Params = {"backbone": mobilenet_v2_drelu_keyless(sd, width_mult)}
    if "fc_layers.1.weight" in sd:
        p["fc"] = _lin_from_torch(sd, "fc_layers.1")
    if "deconv_layers.0.weight" in sd:
        p["deconvs"] = [
            {"deconv": deconv_from_torch(sd, f"deconv_layers.{3 * i}"),
             "bn": bn_from_torch(sd, f"deconv_layers.{3 * i + 1}")}
            for i in range(n_deconvs)
        ]
        p["final"] = conv_from_torch(sd, "deconv_final_layer")
    if "aux_deconv_layers.0.weight" in sd:
        p["aux_deconvs"] = [
            {"deconv": deconv_from_torch(sd, f"aux_deconv_layers.{3 * i}"),
             "bn": bn_from_torch(sd, f"aux_deconv_layers.{3 * i + 1}")}
            for i in range(n_deconvs - 1)
        ]
        p["aux_final"] = conv_from_torch(sd, "aux_deconv_final_layer")
    return p


# --------------------------------------------------------------------------
# face_mobilenet_old.py: unsplit MobileNetV2 + ConvBNReLU funnel
# (1280->320->64) + flatten-MLP regress head (:129-167).
# --------------------------------------------------------------------------


def apply_face_mobilenet_old(params: Params, x: jnp.ndarray,
                             width_mult: float = 1.0) -> jnp.ndarray:
    from dfanerf_tpu.models.perception.mobilenet import (
        _relu6, apply_mobilenet_v2,
    )

    h = apply_mobilenet_v2(params["backbone"], x, width_mult)
    for cb in params["inter"]:
        h = _relu6(batchnorm(cb["bn"], conv2d(cb["conv"], h)))
    flat = h.transpose(0, 3, 1, 2).reshape(h.shape[0], -1)
    for i, lin in enumerate(params["fcs"]):
        flat = flat @ lin["w"] + lin["b"]
        if i < len(params["fcs"]) - 1:
            flat = jax.nn.relu(flat)
    return flat


def face_mobilenet_old_from_torch(sd: Mapping[str, Any],
                                  width_mult: float = 1.0) -> Params:
    from dfanerf_tpu.models.perception.mobilenet import mobilenet_v2_from_torch

    return {
        "backbone": mobilenet_v2_from_torch(sd, width_mult),
        "inter": [
            {"conv": conv_from_torch(sd, f"intermediate_layers.{i}.0"),
             "bn": bn_from_torch(sd, f"intermediate_layers.{i}.1")}
            for i in range(2)
        ],
        "fcs": [_lin_from_torch(sd, f"fc_layers.{i}") for i in (1, 4, 6)],
    }


# --------------------------------------------------------------------------
# CenterNet-style face detector (face_centerMobilenet.py): MobileNetV2
# multi-scale features [1/4, 1/8, 1/16, 1/32] -> MobileNetUp FPN (grouped
# 2x2 deconv up + lateral 1x1) -> per-task 1x1 heads (hm with sigmoid).
# --------------------------------------------------------------------------

# plan indices (mobilenet.py _block_plan order, no final 1x1) after which a
# feature map is emitted: feat_id [1, 2, 4, 6] of the IR setting groups
# (face_centerMobilenet.py:102,117-124)
_CENTER_FEAT_SPLITS = (3, 6, 13, 17)
_CENTER_FEAT_CHANNELS = (24, 32, 96, 320)
DEFAULT_CENTER_HEADS = (("hm", 2), ("hm_offset", 4), ("landmarks", 36),
                        ("densewh", 4))


def init_center_mobilenet(
    key: jax.Array,
    heads: Sequence[Tuple[str, int]] = DEFAULT_CENTER_HEADS,
    head_conv: int = 24,
) -> Params:
    from dfanerf_tpu.models.perception.mobilenet import init_mobilenet_v2

    ks = iter(jax.random.split(key, 12 + len(heads)))
    p: Params = {"backbone": init_mobilenet_v2(next(ks))}
    p["backbone"]["blocks"] = p["backbone"]["blocks"][:18]  # no final 1x1
    ch = list(_CENTER_FEAT_CHANNELS[::-1])  # [320, 96, 32, 24]
    p["up_conv"] = {"conv": init_conv(next(ks), ch[0], head_conv, 1,
                                      bias=False),
                    "bn": init_bn(head_conv)}
    fpn = []
    for c in ch[1:]:
        fpn.append({
            # depthwise 2x2 transposed conv: per-group input dim is 1
            "up": {"deconv": init_deconv(next(ks), 1, head_conv, 2),
                   "bn": init_bn(head_conv)},
            "lateral": {"conv": init_conv(next(ks), c, head_conv, 1,
                                          bias=False),
                        "bn": init_bn(head_conv)},
        })
    p["fpn"] = fpn
    p["conv_last"] = {"conv": init_conv(next(ks), head_conv, head_conv, 3,
                                        bias=False),
                      "bn": init_bn(head_conv)}
    p["heads"] = {name: init_conv(next(ks), head_conv, c, 1)
                  for name, c in heads}
    return p


def apply_center_mobilenet(
    params: Params,
    x: jnp.ndarray,
    heads: Sequence[Tuple[str, int]] = DEFAULT_CENTER_HEADS,
) -> Dict[str, jnp.ndarray]:
    """x [N, H, W, 3] -> dict of 1/4-resolution head maps
    (face_centerMobilenet.py:227-262 FaceMobileNet.forward)."""
    from dfanerf_tpu.models.perception.mobilenet import apply_mobilenet_v2

    feats, start = [], 0
    h = x
    for stop in _CENTER_FEAT_SPLITS:
        # run the plan slice [start, stop] inclusive
        h = _apply_mnv2_slice(params["backbone"], h, start, stop + 1)
        feats.append(h)
        start = stop + 1
    y = jax.nn.relu(batchnorm(params["up_conv"]["bn"],
                              conv2d(params["up_conv"]["conv"], feats[-1]),
                              eps=1e-3))
    for stage, skip in zip(params["fpn"], feats[-2::-1]):
        up = jax.nn.relu(batchnorm(
            stage["up"]["bn"],
            conv_transpose2d(stage["up"]["deconv"], y, stride=2, padding=0,
                             groups=y.shape[-1]),
            eps=1e-3,
        ))
        lat = jax.nn.relu(batchnorm(
            stage["lateral"]["bn"], conv2d(stage["lateral"]["conv"], skip),
            eps=1e-3,
        ))
        y = up + lat
    y = jax.nn.relu(batchnorm(params["conv_last"]["bn"],
                              conv2d(params["conv_last"]["conv"], y,
                                     padding=1)))
    out = {}
    for name, _ in heads:
        o = conv2d(params["heads"][name], y)
        out[name] = jax.nn.sigmoid(o) if name == "hm" else o
    return out


def _apply_mnv2_slice(params, x, start, stop, width_mult: float = 1.0):
    """Run a [start, stop) slice of the MobileNetV2 plan (shared with
    mobilenet.py apply_mobilenet_v2's block semantics)."""
    from dfanerf_tpu.models.perception.mobilenet import _block_plan, _relu6

    plan, _ = _block_plan(width_mult)
    for spec, b in zip(plan[start:stop], params["blocks"][start:stop]):
        if spec[0] in ("stem", "last"):
            _, cin, cout, k, s = spec
            x = _relu6(batchnorm(b["convbn"]["bn"],
                                 conv2d(b["convbn"]["conv"], x, stride=s,
                                        padding=(k - 1) // 2)))
        else:
            _, cin, cout, s, t = spec
            h = x
            if "expand" in b:
                h = _relu6(batchnorm(b["expand"]["bn"],
                                     conv2d(b["expand"]["conv"], h)))
            hidden = h.shape[-1]
            h = _relu6(batchnorm(b["dw"]["bn"],
                                 conv2d(b["dw"]["conv"], h, stride=s,
                                        padding=1, groups=hidden)))
            h = batchnorm(b["project"]["bn"], conv2d(b["project"]["conv"], h))
            if s == 1 and cin == cout:
                h = h + x
            x = h
    return x


def center_mobilenet_from_torch(
    sd: Mapping[str, Any],
    heads: Sequence[Tuple[str, int]] = DEFAULT_CENTER_HEADS,
) -> Params:
    # backbone blocks live under base.feature_{id}.{j}; rebuild flat order
    group_of = {}
    j = 0
    for gi, stop in zip((1, 2, 4, 6), _CENTER_FEAT_SPLITS):
        for local in range(stop + 1 - j):
            group_of[j + local] = (gi, local)
        j = stop + 1

    def convbn(cname, bname):
        return {"conv": conv_from_torch(sd, cname),
                "bn": bn_from_torch(sd, bname)}

    blocks = []
    for fi in range(18):
        gi, local = group_of[fi]
        base = f"base.feature_{gi}.{local}"
        if fi == 0:
            blocks.append({"kind": "stem",
                           "convbn": convbn(f"{base}.0", f"{base}.1")})
            continue
        t = 1 if fi == 1 else 6
        b: Params = {"kind": "ir"}
        ci = 0
        if t != 1:
            b["expand"] = convbn(f"{base}.conv.{ci}.0", f"{base}.conv.{ci}.1")
            ci += 1
        b["dw"] = convbn(f"{base}.conv.{ci}.0", f"{base}.conv.{ci}.1")
        b["project"] = convbn(f"{base}.conv.{ci + 1}", f"{base}.conv.{ci + 2}")
        blocks.append(b)
    p: Params = {"backbone": {"blocks": blocks}}
    p["up_conv"] = convbn("dla_up.conv.0", "dla_up.conv.1")
    fpn = []
    for i in range(3):
        fpn.append({
            "up": {"deconv": deconv_from_torch(
                       sd, f"dla_up.up_{i}.up.0",
                       groups=sd[f"dla_up.up_{i}.up.0.weight"].shape[0]),
                   "bn": bn_from_torch(sd, f"dla_up.up_{i}.up.1")},
            "lateral": convbn(f"dla_up.up_{i}.conv.0", f"dla_up.up_{i}.conv.1"),
        })
    p["fpn"] = fpn
    p["conv_last"] = convbn("dla_up.conv_last.0", "dla_up.conv_last.1")
    p["heads"] = {}
    for name, _ in heads:
        key = f"{name}.0" if f"{name}.0.weight" in sd else name
        p["heads"][name] = conv_from_torch(sd, key)
    return p


def face_mobilenet_drelu_from_torch(
    sd: Mapping[str, Any],
    width_mult: float = 1.0,
    n_deconvs: int = 3,
) -> Params:
    p: Params = {"backbone": mobilenet_v2_drelu_from_torch(sd, width_mult)}
    if "fc_layers.1.weight" in sd:
        p["fc"] = {"w": jnp.asarray(_np32(sd["fc_layers.1.weight"]).T),
                   "b": jnp.asarray(_np32(sd["fc_layers.1.bias"]))}
    if "deconv_layers.0.weight" in sd:
        p["deconvs"] = [
            {"deconv": deconv_from_torch(sd, f"deconv_layers.{3 * i}"),
             "bn": bn_from_torch(sd, f"deconv_layers.{3 * i + 1}")}
            for i in range(n_deconvs)
        ]
        p["final"] = conv_from_torch(sd, "deconv_final_layer")
    if "aux_deconv_layers.0.weight" in sd:
        p["aux_deconvs"] = [
            {"deconv": deconv_from_torch(sd, f"aux_deconv_layers.{3 * i}"),
             "bn": bn_from_torch(sd, f"aux_deconv_layers.{3 * i + 1}")}
            for i in range(n_deconvs - 1)
        ]
        p["aux_final"] = conv_from_torch(sd, "aux_deconv_final_layer")
    return p
