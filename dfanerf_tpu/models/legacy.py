"""Legacy NeRF MLPs kept for reference-checkpoint compatibility.

The reference carries two older model classes that its shipped trainer no
longer calls but whose checkpoints exist in the wild (run_nerf_helpers.py:
242-338 ``FaceNeRF`` — the AD-NeRF audio-concat NeRF — and :342-435
vanilla ``NeRF``). Functional JAX equivalents + converters so those
checkpoints remain loadable here.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp

from dfanerf_tpu.models.layers import init_linear, linear

Params = Dict[str, Any]


def init_facenerf(
    key: jax.Array,
    D: int = 8,
    W: int = 256,
    input_ch: int = 3,
    input_ch_views: int = 3,
    dim_aud: int = 76,
    output_ch: int = 4,
    skips: Tuple[int, ...] = (4,),
    use_viewdirs: bool = False,
) -> Params:
    ks = jax.random.split(key, D + 8)
    ki = iter(ks)
    in_all = input_ch + dim_aud
    pts = [init_linear(next(ki), in_all, W)]
    for i in range(D - 1):
        cin = W + in_all if i in skips else W
        pts.append(init_linear(next(ki), cin, W))
    p: Params = {"pts_linears": pts}
    # FaceNeRF view branch: paper variant, 1 + D//4 layers (helpers:265-266)
    views = [init_linear(next(ki), input_ch_views + W, W // 2)]
    for _ in range(D // 4):
        views.append(init_linear(next(ki), W // 2, W // 2))
    p["views_linears"] = views
    if use_viewdirs:
        p["feature_linear"] = init_linear(next(ki), W, W)
        p["alpha_linear"] = init_linear(next(ki), W, 1)
        p["rgb_linear"] = init_linear(next(ki), W // 2, 3)
    else:
        p["output_linear"] = init_linear(next(ki), W, output_ch)
    return p


def apply_facenerf(
    params: Params,
    x: jnp.ndarray,
    input_ch: int = 3,
    input_ch_views: int = 3,
    dim_aud: int = 76,
    skips: Tuple[int, ...] = (4,),
    use_viewdirs: bool = False,
) -> jnp.ndarray:
    """x: [N, input_ch + dim_aud + input_ch_views] -> [N, 4] (rgb, alpha).

    FaceNeRF quirk preserved: with viewdirs the skip feature is the RAW
    trunk output h, not feature_linear(h) (helpers:287)."""
    in_all = input_ch + dim_aud
    input_pts = x[..., :in_all]
    input_views = x[..., in_all : in_all + input_ch_views]
    h = input_pts
    for i, layer in enumerate(params["pts_linears"]):
        h = jax.nn.relu(linear(layer, h))
        if i in skips:
            h = jnp.concatenate([input_pts, h], axis=-1)
    if use_viewdirs:
        alpha = linear(params["alpha_linear"], h)
        h = jnp.concatenate([h, input_views], axis=-1)
        for layer in params["views_linears"]:
            h = jax.nn.relu(linear(layer, h))
        rgb = linear(params["rgb_linear"], h)
        return jnp.concatenate([rgb, alpha], axis=-1)
    return linear(params["output_linear"], h)


def init_vanilla_nerf(
    key: jax.Array,
    D: int = 8,
    W: int = 256,
    input_ch: int = 3,
    input_ch_views: int = 3,
    output_ch: int = 4,
    skips: Tuple[int, ...] = (4,),
    use_viewdirs: bool = False,
) -> Params:
    ks = jax.random.split(key, D + 6)
    ki = iter(ks)
    pts = [init_linear(next(ki), input_ch, W)]
    for i in range(D - 1):
        cin = W + input_ch if i in skips else W
        pts.append(init_linear(next(ki), cin, W))
    p: Params = {
        "pts_linears": pts,
        "views_linears": [init_linear(next(ki), input_ch_views + W, W // 2)],
    }
    if use_viewdirs:
        p["feature_linear"] = init_linear(next(ki), W, W)
        p["alpha_linear"] = init_linear(next(ki), W, 1)
        p["rgb_linear"] = init_linear(next(ki), W // 2, 3)
    else:
        p["output_linear"] = init_linear(next(ki), W, output_ch)
    return p


def apply_vanilla_nerf(
    params: Params,
    x: jnp.ndarray,
    input_ch: int = 3,
    input_ch_views: int = 3,
    skips: Tuple[int, ...] = (4,),
    use_viewdirs: bool = False,
) -> jnp.ndarray:
    input_pts = x[..., :input_ch]
    input_views = x[..., input_ch : input_ch + input_ch_views]
    h = input_pts
    for i, layer in enumerate(params["pts_linears"]):
        h = jax.nn.relu(linear(layer, h))
        if i in skips:
            h = jnp.concatenate([input_pts, h], axis=-1)
    if use_viewdirs:
        alpha = linear(params["alpha_linear"], h)
        feature = linear(params["feature_linear"], h)
        h = jnp.concatenate([feature, input_views], axis=-1)
        for layer in params["views_linears"]:
            h = jax.nn.relu(linear(layer, h))
        rgb = linear(params["rgb_linear"], h)
        return jnp.concatenate([rgb, alpha], axis=-1)
    return linear(params["output_linear"], h)


def facenerf_from_torch(sd: Mapping[str, Any]) -> Params:
    from dfanerf_tpu.compat.torch_ckpt import _lin, _seq_lin

    p: Params = {
        "pts_linears": _seq_lin(sd, "pts_linears"),
        "views_linears": _seq_lin(sd, "views_linears"),
    }
    for name in ("feature_linear", "alpha_linear", "rgb_linear", "output_linear"):
        if f"{name}.weight" in sd:
            p[name] = _lin(sd, name)
    return p


vanilla_nerf_from_torch = facenerf_from_torch
