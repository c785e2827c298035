"""HRNet-W18 facial-landmark heatmap network — functional JAX
reimplementation of lib/models/face_hrnet.py with the shipped
300w_lp_menpo2D/hrnet_hm.yaml configuration (4 stages, branch channels
18/36/72/144, BASIC blocks, SUM fusion, 68-joint heatmap head).

Structure-as-data: the parameter pytree mirrors the torch module tree so
the converter is a mechanical name walk; all fuse/head upsampling is
bilinear align_corners=False (jax.image.resize 'linear' half-pixel
semantics match torch upsampling exactly).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Tuple

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


@dataclasses.dataclass(frozen=True)
class HRNetConfig:
    """Shipped hrnet_hm.yaml EXTRA block (face variant). ``head="pose"``
    with ``up_mode="nearest"`` selects lib/models/pose_hrnet.py semantics:
    nearest-neighbor fuse upsampling (pose_hrnet.py:151) and a single conv
    head on the highest-resolution branch (:323-330,458) instead of the
    face variant's concat-all-branches head."""

    num_joints: int = 68
    final_conv_kernel: int = 1
    # (num_modules, num_branches, blocks_per_branch, channels)
    stage2: Tuple = (1, 2, (4, 4), (18, 36))
    stage3: Tuple = (4, 3, (4, 4, 4), (18, 36, 72))
    stage4: Tuple = (3, 4, (4, 4, 4, 4), (18, 36, 72, 144))
    head: str = "face"        # "face" (concat head) | "pose" (branch-0 conv)
    up_mode: str = "linear"   # fuse upsampling: "linear" | "nearest"


def pose_hrnet_config(num_joints: int = 68,
                      final_conv_kernel: int = 1) -> HRNetConfig:
    """PoseHighResolutionNet (lib/models/pose_hrnet.py get_pose_net)."""
    return HRNetConfig(num_joints=num_joints,
                       final_conv_kernel=final_conv_kernel,
                       head="pose", up_mode="nearest")


def _resize(x, hw, mode="linear"):
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[3]), mode)


def _resize_bilinear(x, hw):
    return _resize(x, hw, "linear")


# --- init ---------------------------------------------------------------------


def _init_convbn(key, cin, cout, ks, stride=1):
    return {"conv": init_conv(key, cin, cout, ks, bias=False), "bn": init_bn(cout)}


def _init_basic(key, cin, cout, stride=1):
    ks = jax.random.split(key, 3)
    p = {
        "conv1": init_conv(ks[0], cin, cout, 3, bias=False),
        "bn1": init_bn(cout),
        "conv2": init_conv(ks[1], cout, cout, 3, bias=False),
        "bn2": init_bn(cout),
    }
    if stride != 1 or cin != cout:
        p["downsample"] = _init_convbn(ks[2], cin, cout, 1, stride)
    return p


def _init_bottleneck(key, cin, planes, stride=1):
    ks = jax.random.split(key, 4)
    cout = planes * 4
    p = {
        "conv1": init_conv(ks[0], cin, planes, 1, bias=False),
        "bn1": init_bn(planes),
        "conv2": init_conv(ks[1], planes, planes, 3, bias=False),
        "bn2": init_bn(planes),
        "conv3": init_conv(ks[2], planes, cout, 1, bias=False),
        "bn3": init_bn(cout),
    }
    if stride != 1 or cin != cout:
        p["downsample"] = _init_convbn(ks[3], cin, cout, 1, stride)
    return p


def _init_hr_module(key, n_branches, n_blocks, channels, n_out=None):
    """n_out < n_branches = the torch multi_scale_output=False case (the
    pose variant's final stage4 module fuses into branch 0 only,
    pose_hrnet.py:218-224)."""
    n_out = n_branches if n_out is None else n_out
    ks = jax.random.split(key, n_branches + n_branches * n_branches)
    ki = iter(ks)
    branches = []
    for b in range(n_branches):
        kb = jax.random.split(next(ki), n_blocks[b])
        branches.append([_init_basic(kb[i], channels[b], channels[b]) for i in range(n_blocks[b])])
    fuse = []
    for i in range(n_out):
        row = []
        for j in range(n_branches):
            if j > i:
                row.append({"up": _init_convbn(next(ki), channels[j], channels[i], 1)})
            elif j == i:
                row.append(None)
            else:
                seq = []
                for k in range(i - j):
                    cout = channels[i] if k == i - j - 1 else channels[j]
                    seq.append(_init_convbn(next(ki), channels[j], cout, 3, stride=2))
                row.append({"down": seq})
        fuse.append(row)
    return {"branches": branches, "fuse": fuse}


def init_hrnet(key: jax.Array, cfg: HRNetConfig = HRNetConfig()) -> Params:
    ks = jax.random.split(key, 32)
    ki = iter(ks)
    p: Params = {
        "conv1": init_conv(next(ki), 3, 64, 3, bias=False),
        "bn1": init_bn(64),
        "conv2": init_conv(next(ki), 64, 64, 3, bias=False),
        "bn2": init_bn(64),
        "layer1": [
            _init_bottleneck(next(ki), 64, 64),
            *[_init_bottleneck(next(ki), 256, 64) for _ in range(3)],
        ],
    }
    prev_channels = [256]
    for name, (n_mod, n_br, n_blocks, channels) in (
        ("2", cfg.stage2), ("3", cfg.stage3), ("4", cfg.stage4)
    ):
        trans = []
        for i in range(n_br):
            if i < len(prev_channels):
                if prev_channels[i] != channels[i]:
                    trans.append({"convbn": _init_convbn(next(ki), prev_channels[i], channels[i], 3)})
                else:
                    trans.append(None)
            else:
                seq = []
                for j in range(i + 1 - len(prev_channels)):
                    cin = prev_channels[-1]
                    cout = channels[i] if j == i - len(prev_channels) else cin
                    seq.append(_init_convbn(next(ki), cin, cout, 3, stride=2))
                trans.append({"down": seq})
        p[f"transition{int(name)-1}"] = trans
        # pose head consumes only branch 0: the last stage4 module fuses
        # into a single output (multi_scale_output=False)
        single_out = cfg.head == "pose" and name == "4"
        p[f"stage{name}"] = [
            _init_hr_module(
                next(ki), n_br, n_blocks, list(channels),
                n_out=1 if (single_out and m == n_mod - 1) else None,
            )
            for m in range(n_mod)
        ]
        prev_channels = list(channels)
    if cfg.head == "pose":
        p["final"] = init_conv(
            next(ki), cfg.stage4[3][0], cfg.num_joints, cfg.final_conv_kernel
        )
    else:
        total = sum(cfg.stage4[3])
        p["head"] = {
            "conv1": init_conv(next(ki), total, total, 1),
            "bn1": init_bn(total),
            "conv2": init_conv(next(ki), total, cfg.num_joints,
                               cfg.final_conv_kernel),
        }
    return p


# --- forward -------------------------------------------------------------------


def _basic(p, x, stride=1):
    out = jax.nn.relu(batchnorm(p["bn1"], conv2d(p["conv1"], x, stride=stride, padding=1)))
    out = batchnorm(p["bn2"], conv2d(p["conv2"], out, padding=1))
    res = x
    if "downsample" in p:
        res = batchnorm(p["downsample"]["bn"], conv2d(p["downsample"]["conv"], x, stride=stride))
    return jax.nn.relu(out + res)


def _bottleneck(p, x, stride=1):
    out = jax.nn.relu(batchnorm(p["bn1"], conv2d(p["conv1"], x)))
    out = jax.nn.relu(batchnorm(p["bn2"], conv2d(p["conv2"], out, stride=stride, padding=1)))
    out = batchnorm(p["bn3"], conv2d(p["conv3"], out))
    res = x
    if "downsample" in p:
        res = batchnorm(p["downsample"]["bn"], conv2d(p["downsample"]["conv"], x, stride=stride))
    return jax.nn.relu(out + res)


def _convbn_relu(p, x, stride=1, padding=1, relu=True):
    y = batchnorm(p["bn"], conv2d(p["conv"], x, stride=stride, padding=padding))
    return jax.nn.relu(y) if relu else y


def _apply_transition(trans, feats):
    out = []
    for i, t in enumerate(trans):
        if t is None:
            out.append(feats[i])
        elif "convbn" in t:
            out.append(_convbn_relu(t["convbn"], feats[i]))
        else:
            x = feats[-1]
            for seq in t["down"]:
                x = _convbn_relu(seq, x, stride=2)
            out.append(x)
    return out


def _apply_hr_module(p, xs, up_mode="linear"):
    n = len(xs)
    xs = [x for x in xs]
    for b in range(n):
        for blk in p["branches"][b]:
            xs[b] = _basic(blk, xs[b])
    out = []
    for i in range(len(p["fuse"])):
        y = None
        for j in range(n):
            f = p["fuse"][i][j]
            if j == i:
                t = xs[j]
            elif j > i:
                t = _convbn_relu(f["up"], xs[j], padding=0, relu=False)
                t = _resize(t, (xs[i].shape[1], xs[i].shape[2]), up_mode)
            else:
                t = xs[j]
                for k, seq in enumerate(f["down"]):
                    t = _convbn_relu(seq, t, stride=2, relu=(k < len(f["down"]) - 1))
            y = t if y is None else y + t
        out.append(jax.nn.relu(y))
    return out


def apply_hrnet(params: Params, x: jnp.ndarray, cfg: HRNetConfig = HRNetConfig()):
    """x: [N, 256, 256, 3] normalized face crop -> heatmaps [N, 64, 64, 68]."""
    x = jax.nn.relu(batchnorm(params["bn1"], conv2d(params["conv1"], x, stride=2, padding=1)))
    x = jax.nn.relu(batchnorm(params["bn2"], conv2d(params["conv2"], x, stride=2, padding=1)))
    for blk in params["layer1"]:
        x = _bottleneck(blk, x)
    feats = [x]
    for sname, tname in (("stage2", "transition1"), ("stage3", "transition2"),
                         ("stage4", "transition3")):
        feats = _apply_transition(params[tname], feats)
        for mod in params[sname]:
            feats = _apply_hr_module(mod, feats, cfg.up_mode)
    pad = 1 if cfg.final_conv_kernel == 3 else 0
    if cfg.head == "pose":
        return conv2d(params["final"], feats[0], padding=pad)
    h, w = feats[0].shape[1], feats[0].shape[2]
    ups = [feats[0]] + [_resize_bilinear(f, (h, w)) for f in feats[1:]]
    x = jnp.concatenate(ups, axis=-1)
    x = jax.nn.relu(batchnorm(params["head"]["bn1"], conv2d(params["head"]["conv1"], x, padding=pad)))
    return conv2d(params["head"]["conv2"], x, padding=pad)


# --- converter -------------------------------------------------------------------


def hrnet_from_torch(sd: Mapping[str, Any], cfg: HRNetConfig = HRNetConfig()) -> Params:
    def convbn(cname, bname):
        return {"conv": conv_from_torch(sd, cname), "bn": bn_from_torch(sd, bname)}

    def block(prefix, bottleneck=False):
        p = {
            "conv1": conv_from_torch(sd, f"{prefix}.conv1"),
            "bn1": bn_from_torch(sd, f"{prefix}.bn1"),
            "conv2": conv_from_torch(sd, f"{prefix}.conv2"),
            "bn2": bn_from_torch(sd, f"{prefix}.bn2"),
        }
        if bottleneck:
            p["conv3"] = conv_from_torch(sd, f"{prefix}.conv3")
            p["bn3"] = bn_from_torch(sd, f"{prefix}.bn3")
        if f"{prefix}.downsample.0.weight" in sd:
            p["downsample"] = convbn(f"{prefix}.downsample.0", f"{prefix}.downsample.1")
        return p

    p: Params = {
        "conv1": conv_from_torch(sd, "conv1"),
        "bn1": bn_from_torch(sd, "bn1"),
        "conv2": conv_from_torch(sd, "conv2"),
        "bn2": bn_from_torch(sd, "bn2"),
        "layer1": [block(f"layer1.{i}", bottleneck=True) for i in range(4)],
    }
    prev_n = 1
    for sname, (n_mod, n_br, n_blocks, channels) in (
        ("stage2", cfg.stage2), ("stage3", cfg.stage3), ("stage4", cfg.stage4)
    ):
        tname = f"transition{int(sname[-1]) - 1}"
        trans = []
        for i in range(n_br):
            if i < prev_n:
                if f"{tname}.{i}.0.weight" in sd:
                    trans.append({"convbn": convbn(f"{tname}.{i}.0", f"{tname}.{i}.1")})
                else:
                    trans.append(None)
            else:
                seq = []
                j = 0
                while f"{tname}.{i}.{j}.0.weight" in sd:
                    seq.append(convbn(f"{tname}.{i}.{j}.0", f"{tname}.{i}.{j}.1"))
                    j += 1
                trans.append({"down": seq})
        p[tname] = trans
        mods = []
        for m in range(n_mod):
            branches = [
                [block(f"{sname}.{m}.branches.{b}.{k}") for k in range(n_blocks[b])]
                for b in range(n_br)
            ]
            fuse = []
            # rows present in the state dict (the pose variant's last
            # stage4 module has a single fuse row: multi_scale_output=False)
            n_rows = sum(
                1 for i in range(n_br)
                if any(k.startswith(f"{sname}.{m}.fuse_layers.{i}.") for k in sd)
            )
            for i in range(n_rows):
                row = []
                for j in range(n_br):
                    base = f"{sname}.{m}.fuse_layers.{i}.{j}"
                    if j == i:
                        row.append(None)
                    elif j > i:
                        row.append({"up": convbn(f"{base}.0", f"{base}.1")})
                    else:
                        seq = []
                        for k in range(i - j):
                            seq.append(convbn(f"{base}.{k}.0", f"{base}.{k}.1"))
                        row.append({"down": seq})
                fuse.append(row)
            mods.append({"branches": branches, "fuse": fuse})
        p[sname] = mods
        prev_n = n_br
    if cfg.head == "pose":
        p["final"] = conv_from_torch(sd, "final_layer")
    else:
        p["head"] = {
            "conv1": conv_from_torch(sd, "head.0"),
            "bn1": bn_from_torch(sd, "head.1"),
            "conv2": conv_from_torch(sd, "head.3"),
        }
    return p
