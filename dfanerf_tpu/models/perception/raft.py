"""RAFT-small dense optical flow — functional JAX reimplementation of
UNFaceFlow/core (raft.py, extractor.py SmallEncoder, update.py
SmallUpdateBlock, corr.py CorrBlock) plus the NeuralNRT crop/uncrop
inference wrapper (models/network_test_flow.py:60-104) and the
ImportanceWeights head.

TPU notes:
- the all-pairs correlation volume is one [B*HW, HW] matmul (MXU) and its
  pyramid is built with average pooling over the target grid;
- correlation lookup is bilinear gather at 4 levels x 7x7 offsets
  (radius 3), batched as one gather per level;
- the recurrent update (12 iterations of ConvGRU) runs under
  ``lax.scan`` — one compiled iteration body;
- instance norm (fnet) is affine-free like torch's InstanceNorm2d default.

The shipped checkpoint raft-small.pth converts weight-for-weight; the
UNFaceFlow refinement checkpoint (sgd_NNRT_model_*.pth) is one of the
reference's missing blobs — the converter accepts it when provided.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dfanerf_tpu.models.perception.common import conv2d, conv_from_torch

Params = Dict[str, Any]

HDIM, CDIM = 96, 64
CORR_LEVELS, CORR_RADIUS = 4, 3


# --- primitives -----------------------------------------------------------------


def _instance_norm(x, eps=1e-5):
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


def _bottleneck(p, x, stride, norm):
    def n(y):
        return _instance_norm(y) if norm == "instance" else y

    y = jax.nn.relu(n(conv2d(p["conv1"], x)))
    y = jax.nn.relu(n(conv2d(p["conv2"], y, stride=stride, padding=1)))
    y = jax.nn.relu(n(conv2d(p["conv3"], y)))
    if "downsample" in p:
        x = n(conv2d(p["downsample"], x, stride=stride))
    return jax.nn.relu(x + y)


def small_encoder(p, x, norm):
    """[N, H, W, 3] -> [N, H/8, W/8, out]."""
    def n(y):
        return _instance_norm(y) if norm == "instance" else y

    x = jax.nn.relu(n(conv2d(p["conv1"], x, stride=2, padding=3)))
    for li, stride in (("layer1", 1), ("layer2", 2), ("layer3", 2)):
        x = _bottleneck(p[li][0], x, stride, norm)
        x = _bottleneck(p[li][1], x, 1, norm)
    return conv2d(p["conv2"], x)


def coords_grid(batch, h, w):
    """[N, H, W, 2] (x, y) pixel coordinates."""
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    grid = jnp.stack([xs, ys], axis=-1).astype(jnp.float32)
    return jnp.broadcast_to(grid[None], (batch, h, w, 2))


def bilinear_sampler(img, coords):
    """img [M, H, W, C], coords [M, Q, 2] (x, y) pixel coords; zero padding
    outside (grid_sample align_corners=True, padding_mode='zeros')."""
    m, h, w, c = img.shape
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(xi, yi):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = img.reshape(m, h * w, c)
        idx = yi_c * w + xi_c
        out = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return out * valid[..., None]

    a = gather(x0, y0)
    b = gather(x0 + 1, y0)
    cc = gather(x0, y0 + 1)
    d = gather(x0 + 1, y0 + 1)
    return (
        a * ((1 - wx) * (1 - wy))[..., None]
        + b * (wx * (1 - wy))[..., None]
        + cc * ((1 - wx) * wy)[..., None]
        + d * (wx * wy)[..., None]
    )


def _avg_pool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
        [(0, 0)] * 4,
    ) / 4.0


def build_corr_pyramid(fmap1, fmap2):
    """All-pairs correlation pyramid. fmaps [N, H, W, D] -> list of
    [N*H*W, h_l, w_l, 1] volumes."""
    n, h, w, d = fmap1.shape
    corr = jnp.einsum(
        "npd,nqd->npq", fmap1.reshape(n, h * w, d), fmap2.reshape(n, h * w, d)
    ) / jnp.sqrt(jnp.float32(d))
    corr = corr.reshape(n * h * w, h, w, 1)
    pyramid = [corr]
    for _ in range(CORR_LEVELS - 1):
        corr = _avg_pool2(corr)
        pyramid.append(corr)
    return pyramid


def lookup_corr(pyramid, coords, radius: int = CORR_RADIUS):
    """coords [N, H, W, 2] -> correlation features [N, H, W, LEVELS*(2r+1)^2]."""
    n, h, w, _ = coords.shape
    r = radius
    d = jnp.arange(-r, r + 1, dtype=jnp.float32)
    # delta stacked (dy, dx) then used as (x=..1, y=..0)? reference builds
    # meshgrid(dy, dx) stacked last-dim (dy, dx) and adds to (x, y) coords /
    # 2**i — i.e. delta[..., 0] adds to x. Keep (dy_first) ordering:
    dyx = jnp.stack(jnp.meshgrid(d, d, indexing="ij"), axis=-1).reshape(-1, 2)
    out = []
    for i, corr in enumerate(pyramid):
        centroid = coords.reshape(n * h * w, 1, 2) / (2 ** i)
        pts = centroid + dyx[None]  # [(NHW), 49, 2] — (x, y) + (dy→x?, dx→y?)
        sampled = bilinear_sampler(corr, pts)[..., 0]  # [(NHW), 49]
        out.append(sampled.reshape(n, h, w, -1))
    return jnp.concatenate(out, axis=-1)


# --- update block -----------------------------------------------------------------


def small_motion_encoder(p, flow, corr):
    cor = jax.nn.relu(conv2d(p["convc1"], corr))
    flo = jax.nn.relu(conv2d(p["convf1"], flow, padding=3))
    flo = jax.nn.relu(conv2d(p["convf2"], flo, padding=1))
    out = jax.nn.relu(conv2d(p["conv"], jnp.concatenate([cor, flo], -1), padding=1))
    return jnp.concatenate([out, flow], axis=-1)


def conv_gru(p, h, x):
    hx = jnp.concatenate([h, x], axis=-1)
    z = jax.nn.sigmoid(conv2d(p["convz"], hx, padding=1))
    r = jax.nn.sigmoid(conv2d(p["convr"], hx, padding=1))
    q = jnp.tanh(conv2d(p["convq"], jnp.concatenate([r * h, x], -1), padding=1))
    return (1 - z) * h + z * q


def flow_head(p, x):
    feat = jax.nn.relu(conv2d(p["conv1"], x, padding=1))
    return conv2d(p["conv2"], feat, padding=1), feat


def upflow8(flow):
    n, h, w, _ = flow.shape
    # bilinear align_corners=True x8 upsample, flow scaled by 8
    from dfanerf_tpu.models.perception.common import resize_bilinear_align

    return 8.0 * resize_bilinear_align(flow, (8 * h, 8 * w))


# --- full model --------------------------------------------------------------------


def apply_raft_small(
    params: Params, image1: jnp.ndarray, image2: jnp.ndarray, iters: int = 12
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """image1/2: [N, H, W, 3] uint8-scale (0..255) floats, H and W multiples
    of 8 -> (flow [N, H, W, 2] in pixels, update feature [N, H/8, W/8, 128]).
    """
    image1 = 2.0 * (image1 / 255.0) - 1.0
    image2 = 2.0 * (image2 / 255.0) - 1.0
    fmap1 = small_encoder(params["fnet"], image1, "instance")
    fmap2 = small_encoder(params["fnet"], image2, "instance")
    pyramid = build_corr_pyramid(fmap1, fmap2)

    cnet = small_encoder(params["cnet"], image1, "none")
    net = jnp.tanh(cnet[..., :HDIM])
    inp = jax.nn.relu(cnet[..., HDIM:])

    n, h8, w8, _ = fmap1.shape
    coords0 = coords_grid(n, h8, w8)

    def body(carry, _):
        net, coords1 = carry
        corr = lookup_corr(pyramid, coords1)
        flow = coords1 - coords0
        motion = small_motion_encoder(params["update"]["encoder"], flow, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = conv_gru(params["update"]["gru"], net, x)
        delta, feat = flow_head(params["update"]["flow_head"], net)
        return (net, coords1 + delta), feat

    (net, coords1), feats = jax.lax.scan(
        body, (net, coords0), None, length=iters
    )
    flow_up = upflow8(coords1 - coords0)
    return flow_up, feats[-1]


# --- init / converter ----------------------------------------------------------------


def _init_conv_t(key, cin, cout, ks, padding=None):
    import math

    kh, kw = (ks, ks) if isinstance(ks, int) else ks
    fan_out = cout * kh * kw
    std = math.sqrt(2.0 / fan_out)
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.normal(k1, (kh, kw, cin, cout)) * std,
        "b": jnp.zeros((cout,)),
    }


def init_raft_small(key: jax.Array) -> Params:
    ks = jax.random.split(key, 80)
    ki = iter(ks)

    def bottleneck(cin, planes, stride):
        p = {
            "conv1": _init_conv_t(next(ki), cin, planes // 4, 1),
            "conv2": _init_conv_t(next(ki), planes // 4, planes // 4, 3),
            "conv3": _init_conv_t(next(ki), planes // 4, planes, 1),
        }
        if stride != 1:
            p["downsample"] = _init_conv_t(next(ki), cin, planes, 1)
        return p

    def encoder(out_dim):
        return {
            "conv1": _init_conv_t(next(ki), 3, 32, 7),
            "layer1": [bottleneck(32, 32, 1), bottleneck(32, 32, 1)],
            "layer2": [bottleneck(32, 64, 2), bottleneck(64, 64, 1)],
            "layer3": [bottleneck(64, 96, 2), bottleneck(96, 96, 1)],
            "conv2": _init_conv_t(next(ki), 96, out_dim, 1),
        }

    cor_planes = CORR_LEVELS * (2 * CORR_RADIUS + 1) ** 2
    return {
        "fnet": encoder(128),
        "cnet": encoder(HDIM + CDIM),
        "update": {
            "encoder": {
                "convc1": _init_conv_t(next(ki), cor_planes, 96, 1),
                "convf1": _init_conv_t(next(ki), 2, 64, 7),
                "convf2": _init_conv_t(next(ki), 64, 32, 3),
                "conv": _init_conv_t(next(ki), 128, 80, 3),
            },
            "gru": {
                "convz": _init_conv_t(next(ki), HDIM + 82 + CDIM, HDIM, 3),
                "convr": _init_conv_t(next(ki), HDIM + 82 + CDIM, HDIM, 3),
                "convq": _init_conv_t(next(ki), HDIM + 82 + CDIM, HDIM, 3),
            },
            "flow_head": {
                "conv1": _init_conv_t(next(ki), HDIM, 128, 3),
                "conv2": _init_conv_t(next(ki), 128, 2, 3),
            },
        },
    }


def raft_small_from_torch(sd: Mapping[str, Any]) -> Params:
    """Convert raft-small.pth (keys may carry a 'module.' prefix)."""
    sd = {k.replace("module.", ""): v for k, v in sd.items()}

    def enc(prefix):
        def bottleneck(name):
            p = {
                "conv1": conv_from_torch(sd, f"{name}.conv1"),
                "conv2": conv_from_torch(sd, f"{name}.conv2"),
                "conv3": conv_from_torch(sd, f"{name}.conv3"),
            }
            if f"{name}.downsample.0.weight" in sd:
                p["downsample"] = conv_from_torch(sd, f"{name}.downsample.0")
            return p

        return {
            "conv1": conv_from_torch(sd, f"{prefix}.conv1"),
            "layer1": [bottleneck(f"{prefix}.layer1.{i}") for i in range(2)],
            "layer2": [bottleneck(f"{prefix}.layer2.{i}") for i in range(2)],
            "layer3": [bottleneck(f"{prefix}.layer3.{i}") for i in range(2)],
            "conv2": conv_from_torch(sd, f"{prefix}.conv2"),
        }

    return {
        "fnet": enc("fnet"),
        "cnet": enc("cnet"),
        "update": {
            "encoder": {
                k: conv_from_torch(sd, f"update_block.encoder.{k}")
                for k in ("convc1", "convf1", "convf2", "conv")
            },
            "gru": {
                k: conv_from_torch(sd, f"update_block.gru.{k}")
                for k in ("convz", "convr", "convq")
            },
            "flow_head": {
                "conv1": conv_from_torch(sd, "update_block.flow_head.conv1"),
                "conv2": conv_from_torch(sd, "update_block.flow_head.conv2"),
            },
        },
    }


# --- RAFT "basic" variant ---------------------------------------------------------
# The reference's small=False path (core/raft.py:33-38): BasicEncoder
# (extractor.py:116-194, ResidualBlock towers, fnet instance-norm / cnet
# batch-norm), BasicUpdateBlock (update.py:92-117: BasicMotionEncoder +
# SepConvGRU + .25-scaled 64*9 mask head), convex flow upsampling
# (raft.py:72-86), corr radius 4. Dead in the shipped small-model
# inference path but a declared constructor capability; ported for parity
# with this repo's standard of covering dead reference variants.


BASIC_HDIM, BASIC_CDIM = 128, 128
BASIC_RADIUS = 4


def _residual(p, x, stride, norm):
    """extractor.py ResidualBlock: two 3x3 convs (stride on conv1) +
    optional 1x1 downsample; norm in {'instance', 'batch', 'none'}
    (instance = torch affine-free default; batch = eval-mode running
    stats)."""
    from dfanerf_tpu.models.perception.common import batchnorm

    def n(y, key):
        if norm == "instance":
            return _instance_norm(y)
        if norm == "batch":
            return batchnorm(p[key], y)
        return y

    y = jax.nn.relu(n(conv2d(p["conv1"], x, stride=stride, padding=1), "norm1"))
    y = jax.nn.relu(n(conv2d(p["conv2"], y, padding=1), "norm2"))
    if "downsample" in p:
        x = n(conv2d(p["downsample"], x, stride=stride), "norm3")
    return jax.nn.relu(x + y)


def basic_encoder(p, x, norm):
    """extractor.py:116-194 BasicEncoder: [N, H, W, 3] -> [N, H/8, W/8, out].
    Channel ladder 64 -> 64/96/128 residual towers -> 1x1 out conv."""
    from dfanerf_tpu.models.perception.common import batchnorm

    def n(y):
        if norm == "instance":
            return _instance_norm(y)
        if norm == "batch":
            return batchnorm(p["norm1"], y)
        return y

    x = jax.nn.relu(n(conv2d(p["conv1"], x, stride=2, padding=3)))
    for li, stride in (("layer1", 1), ("layer2", 2), ("layer3", 2)):
        x = _residual(p[li][0], x, stride, norm)
        x = _residual(p[li][1], x, 1, norm)
    return conv2d(p["conv2"], x)


def basic_motion_encoder(p, flow, corr):
    """update.py:81-98 BasicMotionEncoder (returns 126+2 = 128 channels)."""
    cor = jax.nn.relu(conv2d(p["convc1"], corr))
    cor = jax.nn.relu(conv2d(p["convc2"], cor, padding=1))
    flo = jax.nn.relu(conv2d(p["convf1"], flow, padding=3))
    flo = jax.nn.relu(conv2d(p["convf2"], flo, padding=1))
    out = jax.nn.relu(conv2d(p["conv"], jnp.concatenate([cor, flo], -1), padding=1))
    return jnp.concatenate([out, flow], axis=-1)


def sep_conv_gru(p, h, x):
    """update.py:34-62 SepConvGRU: horizontal (1,5) then vertical (5,1)
    GRU passes."""
    for sfx, pad in (("1", (0, 2)), ("2", (2, 0))):
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(conv2d(p["convz" + sfx], hx, padding=pad))
        r = jax.nn.sigmoid(conv2d(p["convr" + sfx], hx, padding=pad))
        q = jnp.tanh(
            conv2d(p["convq" + sfx], jnp.concatenate([r * h, x], -1), padding=pad)
        )
        h = (1 - z) * h + z * q
    return h


def _mask_head(p, net):
    """update.py:111-114: Sequential(conv 3x3 128->256, ReLU, conv 1x1
    256->64*9); the caller applies the .25 gradient-balance scale."""
    return conv2d(p["conv2"], jax.nn.relu(conv2d(p["conv1"], net, padding=1)))


def upsample_flow_convex(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """raft.py:72-86 convex-combination upsampling: flow [N, H, W, 2] at
    1/8 res + mask [N, H, W, 64*9] -> [N, 8H, 8W, 2]. Channel order of the
    mask matches torch's view(N, 1, 9, 8, 8, H, W): c = k*64 + i*8 + j for
    window position k (row-major 3x3) and subpixel (i, j)."""
    n, h, w, _ = flow.shape
    m = jax.nn.softmax(mask.reshape(n, h, w, 9, 8, 8), axis=3)
    fp = jnp.pad(8.0 * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack(
        [fp[:, dy : dy + h, dx : dx + w, :] for dy in range(3) for dx in range(3)],
        axis=3,
    )  # [N, H, W, 9, 2] — unfold's row-major window order
    up = jnp.einsum("nhwkab,nhwkc->nhwabc", m, neigh)  # [N, H, W, 8, 8, 2]
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(n, 8 * h, 8 * w, 2)


def lookup_corr_alternate(fmap1, fmap2, coords, num_levels: int = CORR_LEVELS,
                          radius: int = BASIC_RADIUS):
    """corr.py:54-95 AlternateCorrBlock: memory-efficient correlation —
    fmap2 is avg-pooled per level and bilinearly sampled in the (2r+1)^2
    window around coords/2^i, then dotted with the FULL-RES fmap1
    (alt_cuda_corr semantics). Because the dot product is linear in fmap2,
    pooling/sampling commute with it and this equals the CorrBlock pooled-
    volume lookup — asserted in tests against build_corr_pyramid +
    lookup_corr. Avoids the [N*(HW)^2] volume entirely."""
    n, h, w, d = fmap1.shape
    off = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    dyx = jnp.stack(jnp.meshgrid(off, off, indexing="ij"), -1).reshape(-1, 2)
    k = dyx.shape[0]
    f1 = fmap1.reshape(n, h * w, d)
    f2 = fmap2
    out = []
    for i in range(num_levels):
        centroid = coords.reshape(n, h * w, 1, 2) / (2.0 ** i)
        pts = (centroid + dyx[None, None]).reshape(n, h * w * k, 2)
        sampled = bilinear_sampler(f2, pts).reshape(n, h * w, k, d)
        corr = jnp.einsum("npd,npkd->npk", f1, sampled) / jnp.sqrt(jnp.float32(d))
        out.append(corr.reshape(n, h, w, k))
        f2 = _avg_pool2(f2)
    return jnp.concatenate(out, axis=-1)


def apply_raft_basic(
    params: Params, image1: jnp.ndarray, image2: jnp.ndarray, iters: int = 12,
    alternate_corr: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RAFT basic forward (core/raft.py:86-140, small=False): image1/2
    [N, H, W, 3] in 0..255, H/W multiples of 8 -> (flow [N, H, W, 2],
    final FlowHead feature [N, H/8, W/8, 256]). The last iteration's
    convex-upsampled flow is returned (the reference overwrites flow_up
    per iteration and returns the last)."""
    image1 = 2.0 * (image1 / 255.0) - 1.0
    image2 = 2.0 * (image2 / 255.0) - 1.0
    fmap1 = basic_encoder(params["fnet"], image1, "instance")
    fmap2 = basic_encoder(params["fnet"], image2, "instance")
    pyramid = None if alternate_corr else build_corr_pyramid(fmap1, fmap2)

    cnet = basic_encoder(params["cnet"], image1, "batch")
    net = jnp.tanh(cnet[..., :BASIC_HDIM])
    inp = jax.nn.relu(cnet[..., BASIC_HDIM:])

    n, h8, w8, _ = fmap1.shape
    coords0 = coords_grid(n, h8, w8)

    def body(carry, _):
        net, coords1 = carry
        if alternate_corr:
            corr = lookup_corr_alternate(fmap1, fmap2, coords1)
        else:
            corr = lookup_corr(pyramid, coords1, radius=BASIC_RADIUS)
        flow = coords1 - coords0
        motion = basic_motion_encoder(params["update"]["encoder"], flow, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = sep_conv_gru(params["update"]["gru"], net, x)
        delta, feat = flow_head(params["update"]["flow_head"], net)
        mask = 0.25 * _mask_head(params["update"]["mask"], net)
        return (net, coords1 + delta), (feat, mask)

    (net, coords1), (feats, masks) = jax.lax.scan(
        body, (net, coords0), None, length=iters
    )
    flow_up = upsample_flow_convex(coords1 - coords0, masks[-1])
    return flow_up, feats[-1]


def init_raft_basic(key: jax.Array) -> Params:
    from dfanerf_tpu.models.perception.common import init_bn

    ks = jax.random.split(key, 120)
    ki = iter(ks)

    def res(cin, planes, stride, norm):
        p = {
            "conv1": _init_conv_t(next(ki), cin, planes, 3),
            "conv2": _init_conv_t(next(ki), planes, planes, 3),
        }
        if norm == "batch":
            p["norm1"], p["norm2"] = init_bn(planes), init_bn(planes)
        if stride != 1:
            p["downsample"] = _init_conv_t(next(ki), cin, planes, 1)
            if norm == "batch":
                p["norm3"] = init_bn(planes)
        return p

    def encoder(out_dim, norm):
        p = {
            "conv1": _init_conv_t(next(ki), 3, 64, 7),
            "layer1": [res(64, 64, 1, norm), res(64, 64, 1, norm)],
            "layer2": [res(64, 96, 2, norm), res(96, 96, 1, norm)],
            "layer3": [res(96, 128, 2, norm), res(128, 128, 1, norm)],
            "conv2": _init_conv_t(next(ki), 128, out_dim, 1),
        }
        if norm == "batch":
            p["norm1"] = init_bn(64)
        return p

    cor_planes = CORR_LEVELS * (2 * BASIC_RADIUS + 1) ** 2
    gin = BASIC_HDIM + 128 + BASIC_HDIM  # h + (inp 128 + motion 128)
    return {
        "fnet": encoder(256, "instance"),
        "cnet": encoder(BASIC_HDIM + BASIC_CDIM, "batch"),
        "update": {
            "encoder": {
                "convc1": _init_conv_t(next(ki), cor_planes, 256, 1),
                "convc2": _init_conv_t(next(ki), 256, 192, 3),
                "convf1": _init_conv_t(next(ki), 2, 128, 7),
                "convf2": _init_conv_t(next(ki), 128, 64, 3),
                "conv": _init_conv_t(next(ki), 256, 126, 3),
            },
            "gru": {
                f"conv{g}{i}": _init_conv_t(
                    next(ki), gin, BASIC_HDIM, (1, 5) if i == "1" else (5, 1)
                )
                for i in ("1", "2")
                for g in ("z", "r", "q")
            },
            "flow_head": {
                "conv1": _init_conv_t(next(ki), BASIC_HDIM, 256, 3),
                "conv2": _init_conv_t(next(ki), 256, 2, 3),
            },
            "mask": {
                "conv1": _init_conv_t(next(ki), 128, 256, 3),
                "conv2": _init_conv_t(next(ki), 256, 64 * 9, 1),
            },
        },
    }


def raft_basic_from_torch(sd: Mapping[str, Any]) -> Params:
    """Convert a RAFT small=False state_dict (raft-things.pth layout)."""
    from dfanerf_tpu.models.perception.common import bn_from_torch

    sd = {k.replace("module.", ""): v for k, v in sd.items()}

    def res(name, norm):
        p = {
            "conv1": conv_from_torch(sd, f"{name}.conv1"),
            "conv2": conv_from_torch(sd, f"{name}.conv2"),
        }
        if norm == "batch":
            p["norm1"] = bn_from_torch(sd, f"{name}.norm1")
            p["norm2"] = bn_from_torch(sd, f"{name}.norm2")
        if f"{name}.downsample.0.weight" in sd:
            p["downsample"] = conv_from_torch(sd, f"{name}.downsample.0")
            if norm == "batch":
                p["norm3"] = bn_from_torch(sd, f"{name}.downsample.1")
        return p

    def enc(prefix, norm):
        p = {
            "conv1": conv_from_torch(sd, f"{prefix}.conv1"),
            "layer1": [res(f"{prefix}.layer1.{i}", norm) for i in range(2)],
            "layer2": [res(f"{prefix}.layer2.{i}", norm) for i in range(2)],
            "layer3": [res(f"{prefix}.layer3.{i}", norm) for i in range(2)],
            "conv2": conv_from_torch(sd, f"{prefix}.conv2"),
        }
        if norm == "batch":
            p["norm1"] = bn_from_torch(sd, f"{prefix}.norm1")
        return p

    return {
        "fnet": enc("fnet", "instance"),
        "cnet": enc("cnet", "batch"),
        "update": {
            "encoder": {
                k: conv_from_torch(sd, f"update_block.encoder.{k}")
                for k in ("convc1", "convc2", "convf1", "convf2", "conv")
            },
            "gru": {
                k: conv_from_torch(sd, f"update_block.gru.{k}")
                for k in ("convz1", "convr1", "convq1",
                          "convz2", "convr2", "convq2")
            },
            "flow_head": {
                "conv1": conv_from_torch(sd, "update_block.flow_head.conv1"),
                "conv2": conv_from_torch(sd, "update_block.flow_head.conv2"),
            },
            "mask": {
                "conv1": conv_from_torch(sd, "update_block.mask.0"),
                "conv2": conv_from_torch(sd, "update_block.mask.2"),
            },
        },
    }


# --- NeuralNRT crop/uncrop inference wrapper ------------------------------------------


def flow_on_crops(
    params: Params,
    src_crop: np.ndarray,
    tar_crop: np.ndarray,
    crop_params: np.ndarray,
    full_hw: Tuple[int, int],
    iters: int = 12,
) -> np.ndarray:
    """The test_flow inference contract (network_test_flow.py:73-104):
    RAFT on fixed-size crops, flow rescaled/offset back into the full frame.

    Args:
        src_crop/tar_crop: [N, ch, cw, 3] uint8-scale crops (crop_height x
            crop_width as in the reference's options, default 240x320).
        crop_params: [N, 8] int (x1s, x2s, y1s, y2s, x1t, x2t, y1t, y2t) —
            source and target crop rects in the full frame.
        full_hw: (H, W) of the full frames.
    Returns:
        [N, H, W, 2] flow in full-frame pixels (zero outside the src rect).
    """
    n, ch, cw, _ = src_crop.shape
    H, W = full_hw
    flow_crop, _ = jax.jit(apply_raft_small, static_argnums=3)(
        params, jnp.asarray(src_crop, jnp.float32), jnp.asarray(tar_crop, jnp.float32),
        iters,
    )
    flow_crop = np.asarray(flow_crop)
    xs, ys = np.meshgrid(np.arange(cw), np.arange(ch))
    grid_crop = np.stack([xs, ys], -1).astype(np.float32)  # [ch, cw, 2]

    out = np.zeros((n, H, W, 2), np.float32)
    for i in range(n):
        x1s, x2s, y1s, y2s, x1t, x2t, y1t, y2t = [int(v) for v in crop_params[i]]
        scale1 = np.array([(x2s - x1s) / cw, (y2s - y1s) / ch], np.float32)
        scale2 = np.array([(x2t - x1t) / cw, (y2t - y1t) / ch], np.float32)
        f = (scale2 - scale1) * grid_crop + scale2 * flow_crop[i]
        # resize to the source rect size (bilinear align_corners=True)
        from dfanerf_tpu.models.perception.common import resize_bilinear_align

        f = np.asarray(
            resize_bilinear_align(jnp.asarray(f[None]), (y2s - y1s, x2s - x1s))
        )[0]
        f = f + np.array([x1t - x1s, y1t - y1s], np.float32)
        out[i, y1s:y2s, x1s:x2s] = f
    return out


def mask_crop(
    color: np.ndarray,
    mask: np.ndarray,
    crop_hw: Tuple[int, int] = (320, 240),
    bound: int = 10,
):
    """The UNFaceFlow dataset crop (data_test_flow/dd_dataset.py:52-64):
    bbox of the mask's nonzero pixels padded by ``bound`` px and clamped,
    color ZEROED outside the mask, cropped and resized to
    (crop_height, crop_width) = (320, 240 — options_test_flow.py:36-37).

    Returns (crop [ch, cw, 3] float32 in 0..255, (x1, x2, y1, y2))."""
    import cv2

    nz = np.nonzero(mask)
    assert nz[0].size > 0, "mask_crop: empty mask"
    h, w = mask.shape[:2]
    min_x = max(0, int(nz[1].min()) - bound)
    max_x = min(w - 1, int(nz[1].max()) + bound)
    min_y = max(0, int(nz[0].min()) - bound)
    max_y = min(h - 1, int(nz[0].max()) + bound)
    masked = color.astype(np.float32) * (mask != 0).astype(np.float32)[..., None]
    crop = masked[min_y:max_y, min_x:max_x]
    crop = cv2.resize(
        np.ascontiguousarray(crop), (crop_hw[1], crop_hw[0]),
        interpolation=cv2.INTER_LINEAR,
    )
    return crop, (min_x, max_x, min_y, max_y)


# --- ImportanceWeights (UNFaceFlow refinement head) -----------------------------


def init_importance_weights(key: jax.Array, in_dim: int = 128) -> Params:
    """network_test_flow.py:21-57: conv(in_dim->16) on the RAFT update
    feature, concat with the 6-channel image pair, 1 conv block + 3
    res-blocks at 16ch, 1-channel sigmoid head."""
    ks = jax.random.split(key, 10)
    ki = iter(ks)

    def conv(cin, cout, k=3):
        import math

        fan = cin * k * k
        bound = 1.0 / math.sqrt(fan)
        k1, k2 = jax.random.split(next(ki))
        return {
            "w": jax.random.uniform(k1, (k, k, cin, cout), jnp.float32, -bound, bound),
            "b": jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound),
        }

    return {
        "conv1": conv(in_dim, 16),
        "block0": conv(22, 16),
        "res": [[conv(16, 16), conv(16, 16)] for _ in range(3)],
        "head": conv(16, 1),
    }


def apply_importance_weights(params: Params, images6: jnp.ndarray,
                             feature: jnp.ndarray) -> jnp.ndarray:
    """images6 [N, H, W, 6] (src+tar pair), feature [N, H, W, in_dim] ->
    [N, H, W, 1] weights in (0, 1). BatchNorm disabled (the reference's
    use_batch_norm=False Identity path)."""
    f = conv2d(params["conv1"], feature, padding=1)
    x = jnp.concatenate([f, images6], axis=-1)
    x = jax.nn.relu(conv2d(params["block0"], x, padding=1))
    for r0, r1 in params["res"]:
        y = jax.nn.relu(conv2d(r0, x, padding=1))
        y = conv2d(r1, y, padding=1)
        x = jax.nn.relu(x + y)
    return jax.nn.sigmoid(conv2d(params["head"], x, padding=1))
