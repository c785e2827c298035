"""Shared primitives for the perception models: NHWC conv / batchnorm /
pooling / resize with exact PyTorch inference semantics (the converters map
torch OIHW weights onto these), plus torch-compatible initializers."""

from __future__ import annotations

import math
from typing import Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _np32(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.array(x, np.float32)  # copy: never alias live torch storage


# --- params ------------------------------------------------------------------


def init_conv(
    key, c_in, c_out, ks, bias=True, a: float = 1.0, mode: str = "fan_in"
) -> Dict[str, jnp.ndarray]:
    """Kaiming-normal (torch kaiming_normal_ with slope ``a``) conv init —
    the reference's BiSeNet init (model.py init_weight: a=1)."""
    kh, kw = (ks, ks) if isinstance(ks, int) else ks
    fan = c_in * kh * kw if mode == "fan_in" else c_out * kh * kw
    gain = math.sqrt(2.0 / (1 + a * a))
    std = gain / math.sqrt(fan)
    k1, k2 = jax.random.split(key)
    p = {"w": jax.random.normal(k1, (kh, kw, c_in, c_out)) * std}
    if bias:
        p["b"] = jnp.zeros((c_out,))
    return p


def init_bn(c) -> Dict[str, jnp.ndarray]:
    return {
        "gamma": jnp.ones((c,)),
        "beta": jnp.zeros((c,)),
        "mean": jnp.zeros((c,)),
        "var": jnp.ones((c,)),
    }


def init_deconv(key, c_in, c_out, ks, bias=False,
                std: float = 0.001) -> Dict[str, jnp.ndarray]:
    """ConvTranspose2d params, stored pre-flipped in forward-conv HWIO
    layout (see conv_transpose2d). torch init: normal(0, 0.001), the
    reference's deconv init (pose_resnet.py:246)."""
    kh, kw = (ks, ks) if isinstance(ks, int) else ks
    k1, _ = jax.random.split(key)
    p = {"w": jax.random.normal(k1, (kh, kw, c_in, c_out)) * std}
    if bias:
        p["b"] = jnp.zeros((c_out,))
    return p


def deconv_from_torch(sd: Mapping, name: str,
                      groups: int = 1) -> Dict[str, jnp.ndarray]:
    """Convert ConvTranspose2d weights [C_in, C_out/groups, kh, kw] to the
    flipped forward-conv HWIO kernel conv_transpose2d expects
    ([kh, kw, C_in/groups, C_out])."""
    w = _np32(sd[f"{name}.weight"])[:, :, ::-1, ::-1]
    if groups == 1:
        w = w.transpose(2, 3, 0, 1)
    else:
        # [g * cin_g, cout_g, kh, kw] -> [kh, kw, cin_g, g * cout_g]
        g = groups
        cin_g = w.shape[0] // g
        cout_g = w.shape[1]
        w = w.reshape(g, cin_g, cout_g, *w.shape[2:])
        w = w.transpose(3, 4, 1, 0, 2).reshape(
            w.shape[3], w.shape[4], cin_g, g * cout_g
        )
    p = {"w": jnp.asarray(np.ascontiguousarray(w))}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(_np32(sd[f"{name}.bias"]))
    return p


def conv_from_torch(sd: Mapping, name: str) -> Dict[str, jnp.ndarray]:
    p = {"w": jnp.asarray(_np32(sd[f"{name}.weight"]).transpose(2, 3, 1, 0))}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(_np32(sd[f"{name}.bias"]))
    return p


def bn_from_torch(sd: Mapping, name: str) -> Dict[str, jnp.ndarray]:
    return {
        "gamma": jnp.asarray(_np32(sd[f"{name}.weight"])),
        "beta": jnp.asarray(_np32(sd[f"{name}.bias"])),
        "mean": jnp.asarray(_np32(sd[f"{name}.running_mean"])),
        "var": jnp.asarray(_np32(sd[f"{name}.running_var"])),
    }


# --- ops ----------------------------------------------------------------------


def conv2d(p, x, stride=1, padding=0, groups=1, dilation=1):
    """NHWC conv with torch Conv2d semantics (symmetric int padding)."""
    stride = (stride, stride) if isinstance(stride, int) else stride
    padding = (padding, padding) if isinstance(padding, int) else padding
    dilation = (dilation, dilation) if isinstance(dilation, int) else dilation
    y = jax.lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        rhs_dilation=dilation,
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"]
    return y


def conv_transpose2d(p, x, stride=2, padding=1, output_padding=0, groups=1):
    """NHWC transposed conv with torch ConvTranspose2d semantics.

    Implemented as an input-dilated forward conv with the spatially
    flipped kernel (p["w"] arrives pre-flipped, [kh, kw, C_in, C_out]):
    out = (in - 1) * stride - 2 * padding + k + output_padding.
    """
    kh, kw = p["w"].shape[:2]
    stride = (stride, stride) if isinstance(stride, int) else stride
    padding = (padding, padding) if isinstance(padding, int) else padding
    opad = (
        (output_padding, output_padding)
        if isinstance(output_padding, int) else output_padding
    )
    pads = [
        (kh - 1 - padding[0], kh - 1 - padding[0] + opad[0]),
        (kw - 1 - padding[1], kw - 1 - padding[1] + opad[1]),
    ]
    y = jax.lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=(1, 1),
        padding=pads,
        lhs_dilation=stride,
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"]
    return y


def batchnorm(p, x, eps=1e-5):
    return p["gamma"] * (x - p["mean"]) / jnp.sqrt(p["var"] + eps) + p["beta"]


def conv_bn_relu(cp, bp, x, stride=1, padding=1, relu=True):
    y = batchnorm(bp, conv2d(cp, x, stride=stride, padding=padding))
    return jax.nn.relu(y) if relu else y


def max_pool(x, ks=3, stride=2, padding=1):
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, ks, ks, 1),
        (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )


def global_avg_pool(x):
    """[N,H,W,C] -> [N,1,1,C] (F.avg_pool2d over the full map)."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def resize_nearest(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """F.interpolate(mode='nearest') semantics: src = floor(dst*in/out)."""
    n, h, w, c = x.shape
    oh, ow = out_hw
    rows = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    return x[:, rows][:, :, cols]


def resize_bilinear_align(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """F.interpolate(mode='bilinear', align_corners=True) semantics."""
    n, h, w, c = x.shape
    oh, ow = out_hw

    def coords(out_len, in_len):
        if out_len == 1:
            return jnp.zeros((1,))
        return jnp.arange(out_len) * ((in_len - 1) / (out_len - 1))

    ys = coords(oh, h)
    xs = coords(ow, w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0).astype(x.dtype)[None, :, None, None]
    wx = (xs - x0).astype(x.dtype)[None, None, :, None]
    a = x[:, y0][:, :, x0]
    b = x[:, y0][:, :, x1]
    cpx = x[:, y1][:, :, x0]
    d = x[:, y1][:, :, x1]
    return (
        a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + cpx * wy * (1 - wx) + d * wy * wx
    )
