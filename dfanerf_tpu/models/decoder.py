"""Conditioned NeRF decoder — the compositional GIRAFFE-style MLP at the
heart of DFA-NeRF, plus the torso deformation field.

Functional re-design of the reference ``Decoder`` (NeRFs/DFANeRF/
decoder.py:137-349) and ``DeformationField_ori`` (decoder.py:77-134):

- one parameter pytree holds all three input branches (head-with-signal,
  head-listener, torso) exactly like the reference's shared network;
- the forward is a pure function of a flat point batch [N, 3] — no Python
  batch loop, no chunking; callers control batching with vmap / tiles;
- the branch ('head' / 'head_listener' / 'torso') is a STATIC argument so
  each branch jits to its own fused program (the reference switches with a
  runtime string, which would defeat XLA).

Architecture (shipped DFA-NeRF config): 8 blocks x 256 hidden, skip at
block 4, PE 10 freqs for points (downscaled by 2) and 4 freqs for viewdirs,
z_dim 256 latents injected via fc_z / fc_z_skips / fc_z_view, dim_signal 96
(64 audio + 32 expression), dim_et_embed 42 torso pose signal, sigma head +
sigmoid RGB head.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from dfanerf_tpu.core.posenc import gauss_B_matrices, gauss_posenc, sincos_posenc
from dfanerf_tpu.models.layers import init_linear, linear

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """Static decoder hyperparameters (defaults = shipped train_obama.sh)."""

    hidden_size: int = 256
    n_blocks: int = 8
    n_blocks_view: int = 1
    dim_signal: int = 96
    skips: Tuple[int, ...] = (4,)
    use_viewdirs: bool = True
    n_freq_posenc: int = 10
    n_freq_posenc_views: int = 4
    dim_exp: int = 256
    dim_et_embed: int = 42
    z_dim: int = 256
    rgb_out_dim: int = 3
    final_sigmoid_activation: bool = True
    downscale_p_by: float = 2.0
    use_deformation_field: bool = True
    use_expression: bool = False
    dim_w2lfeature: int = 512
    use_wav2lip: bool = False
    # decoder.py:189-199 'gauss' mode: fixed seed-42 random-Fourier
    # projections replace the octave sin/cos encoding for points and
    # viewdirs (off in every shipped config; supported by the XLA decoder
    # path only — the fused serving kernels assume 'normal')
    positional_encoding: str = "normal"  # 'normal' | 'gauss'
    gauss_dim_pos: int = 10
    gauss_dim_view: int = 4
    gauss_std: float = 4.0
    density_activation: str = "relu"  # sigma activation applied by the
    # RENDER paths (fields.py, the fused kernels, occupancy): "relu" is
    # the reference's semantics; "softplus" removes the dead-ReLU
    # head-collapse trap (ops/fused_render.py density_act) and is the
    # recommended mode when training with the serving regularizers
    # (TrainConfig.distortion_lambda). Checkpoints must be rendered with
    # the activation they were trained under.

    @property
    def dim_embed(self) -> int:
        if self.positional_encoding == "gauss":
            return 3 * self.gauss_dim_pos * 2
        return 3 * self.n_freq_posenc * 2

    @property
    def dim_embed_view(self) -> int:
        if self.positional_encoding == "gauss":
            return 3 * self.gauss_dim_view * 2
        return 3 * self.n_freq_posenc_views * 2

    @property
    def n_skips(self) -> int:
        return sum(i in self.skips for i in range(self.n_blocks - 1))


# ---------------------------------------------------------------------------
# Deformation field (reference DeformationField_ori: two parallel 5-layer
# 64-wide MLPs with a skip at block 4, deforming the PE'd point embedding and
# the pose signal respectively; applied residually for the torso branch).
# ---------------------------------------------------------------------------


def init_deformation_field(
    key: jax.Array,
    dim_embed: int,
    dim_signal: int,
    hidden_size: int = 64,
    n_blocks: int = 7,
    skips: Tuple[int, ...] = (4,),
) -> Params:
    n_layers = 1 + (n_blocks - 3)  # first layer + (n_blocks-3) hidden
    n_skips = sum(i in skips for i in range(n_blocks - 1))
    keys = jax.random.split(key, 2 * n_layers + 2 + 2 * n_skips)
    k = iter(keys)
    p: Params = {
        "blocks_embed": [init_linear(next(k), dim_embed + dim_signal, hidden_size)]
        + [init_linear(next(k), hidden_size, hidden_size) for _ in range(n_blocks - 3)],
        "out_embed": init_linear(next(k), hidden_size, dim_embed),
        "blocks_signal": [init_linear(next(k), dim_embed + dim_signal, hidden_size)]
        + [init_linear(next(k), hidden_size, hidden_size) for _ in range(n_blocks - 3)],
        "out_signal": init_linear(next(k), hidden_size, dim_signal),
        "fc_embed_skips": [
            init_linear(next(k), dim_embed, hidden_size) for _ in range(n_skips)
        ],
        "fc_signal_skips": [
            init_linear(next(k), dim_signal, hidden_size) for _ in range(n_skips)
        ],
    }
    return p


def _blockdiag(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[m,n] ⊕ [p,q] -> [m+p, n+q] block-diagonal weight."""
    top = jnp.concatenate([a, jnp.zeros((a.shape[0], b.shape[1]), a.dtype)], axis=1)
    bot = jnp.concatenate([jnp.zeros((b.shape[0], a.shape[1]), b.dtype), b], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def apply_deformation_field(
    params: Params,
    x: jnp.ndarray,
    dim_embed: int,
    skips: Tuple[int, ...] = (4,),
) -> jnp.ndarray:
    """x: [..., dim_embed + dim_signal] -> deformed concat of same shape.

    TPU-native formulation: the reference runs the embed and signal branches
    as two separate 64-wide MLPs. Two 64-lane matmul chains are hostile to
    the TPU (sub-MXU-tile widths; empirically they also send this XLA
    version's fusion cost model into multi-minute compiles / SIGILL crashes
    — see .claude/skills/verify/SKILL.md). We evaluate the SAME function as
    one 128-wide MLP whose weights are the block-diagonal composition of the
    two branches, built on the fly from the two-branch parameter pytree:

      layer0:  [W_e0 | W_s0]           (both branches read the full input)
      block k: W_e_k ⊕ W_s_k           (independent 64-wide chains)
      skip:    W_e_skip ⊕ W_s_skip     (embed-half / signal-half inputs)
      out:     W_e_out ⊕ W_s_out       ([128] -> [dim_embed + dim_signal])

    Gradients flow only through the real blocks (the zero pads are
    constants), so training dynamics and checkpoints match the reference's
    two-branch parameterization exactly.
    """
    be, bs = params["blocks_embed"], params["blocks_signal"]
    w0 = jnp.concatenate([be[0]["w"], bs[0]["w"]], axis=1)
    b0 = jnp.concatenate([be[0]["b"], bs[0]["b"]])
    h = jax.nn.relu(x @ w0 + b0)
    skip_idx = 0
    for idx in range(1, len(be)):
        w = _blockdiag(be[idx]["w"], bs[idx]["w"])
        b = jnp.concatenate([be[idx]["b"], bs[idx]["b"]])
        h = jax.nn.relu(h @ w + b)
        if (idx + 1) in skips and idx < len(be) - 1:
            es = params["fc_embed_skips"][skip_idx]
            ss = params["fc_signal_skips"][skip_idx]
            w_skip = _blockdiag(es["w"], ss["w"])
            b_skip = jnp.concatenate([es["b"], ss["b"]])
            h = h + (x @ w_skip + b_skip)
            skip_idx += 1
    w_out = _blockdiag(params["out_embed"]["w"], params["out_signal"]["w"])
    b_out = jnp.concatenate([params["out_embed"]["b"], params["out_signal"]["b"]])
    return h @ w_out + b_out


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def init_decoder(key: jax.Array, cfg: DecoderConfig) -> Params:
    H, Z = cfg.hidden_size, cfg.z_dim
    d_e, d_ev = cfg.dim_embed, cfg.dim_embed_view
    keys = jax.random.split(key, 64)
    k = iter(keys)
    p: Params = {
        "fc_in": init_linear(next(k), d_e + cfg.dim_signal, H),
        "fc_in_listener": init_linear(next(k), d_e, H),
        "fc_in_torso": init_linear(next(k), d_e + cfg.dim_et_embed, H),
        "blocks": [init_linear(next(k), H, H) for _ in range(cfg.n_blocks - 1)],
        "sigma_out": init_linear(next(k), H, 1),
        "fc_z_view": init_linear(next(k), Z, H),
        "feat_view": init_linear(next(k), H, H),
        "fc_view": init_linear(next(k), d_ev, H),
        "feat_out": init_linear(next(k), H, cfg.rgb_out_dim),
    }
    if Z > 0:
        p["fc_z"] = init_linear(next(k), Z, H)
    if cfg.n_skips > 0:
        p["fc_z_skips"] = [init_linear(next(k), Z, H) for _ in range(cfg.n_skips)]
        p["fc_p_skips"] = [
            init_linear(next(k), d_e + cfg.dim_signal, H) for _ in range(cfg.n_skips)
        ]
        p["fc_p_skips_listener"] = [
            init_linear(next(k), d_e, H) for _ in range(cfg.n_skips)
        ]
        p["fc_p_skips_torso"] = [
            init_linear(next(k), d_e + cfg.dim_et_embed, H)
            for _ in range(cfg.n_skips)
        ]
    if cfg.use_viewdirs and cfg.n_blocks_view > 1:
        p["blocks_view"] = [
            init_linear(next(k), d_ev + H, H) for _ in range(cfg.n_blocks_view - 1)
        ]
    if cfg.use_deformation_field:
        p["deform_net"] = init_deformation_field(next(k), d_e, cfg.dim_et_embed)
    if cfg.use_expression:
        p["expnet"] = init_linear(next(k), cfg.dim_exp, H)
    if cfg.use_wav2lip:
        p["w2lnet"] = init_linear(next(k), cfg.dim_w2lfeature, H)
    return p


def apply_decoder(
    params: Params,
    cfg: DecoderConfig,
    p_in: jnp.ndarray,
    ray_d: Optional[jnp.ndarray],
    z_shape: jnp.ndarray,
    z_app: jnp.ndarray,
    signal: Optional[jnp.ndarray],
    branch: str,
    expression: Optional[jnp.ndarray] = None,
    compute_dtype: Optional[Any] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate the decoder on a flat point batch.

    Args:
        p_in: [N, 3] world-space sample points.
        ray_d: [N, 3] ray directions (unnormalized ok) or None.
        z_shape, z_app: [z_dim] latents for this (object, part).
        signal: conditioning vector — [dim_signal] or [N, dim_signal] for
            'head'; [dim_et_embed] or [N, dim_et_embed] for 'torso';
            ignored for 'head_listener'.
        branch: 'head' | 'head_listener' | 'torso' (STATIC).
        expression: [dim_exp] raw expression for the use_expression path
            (added to the view feature via expnet), or None.
        compute_dtype: when set (e.g. jnp.bfloat16), run the MLP trunk in
            that dtype. Positional encodings are always computed in fp32
            (high-frequency sin/cos phases need fp32 inputs) and cast after;
            outputs are returned as fp32 for the fp32 compositing path.

    Returns:
        feat: [N, rgb_out_dim] (sigmoid'd if configured); sigma: [N] fp32.
    """
    assert branch in ("head", "head_listener", "torso")
    dtype = p_in.dtype

    if compute_dtype is not None:
        params = jax.tree.map(lambda x: x.astype(compute_dtype), params)
        z_shape = z_shape.astype(compute_dtype)
        z_app = z_app.astype(compute_dtype)

    if cfg.positional_encoding == "gauss":
        b_pos, b_view = gauss_B_matrices(
            cfg.gauss_dim_pos, cfg.gauss_dim_view, cfg.gauss_std
        )
        p = gauss_posenc(p_in.astype(jnp.float32), b_pos, cfg.downscale_p_by)
    else:
        p = sincos_posenc(
            p_in.astype(jnp.float32), cfg.n_freq_posenc, cfg.downscale_p_by
        )  # [N, 60]
    if compute_dtype is not None:
        p = p.astype(compute_dtype)

    if branch != "head_listener":
        assert signal is not None
        sig = jnp.broadcast_to(
            jnp.atleast_2d(signal).astype(p.dtype), (p.shape[0], signal.shape[-1])
        )
        p = jnp.concatenate([p, sig], axis=-1)

    if cfg.use_deformation_field and branch == "torso":
        p = apply_deformation_field(params["deform_net"], p, cfg.dim_embed) + p

    in_layer = {
        "head": "fc_in",
        "head_listener": "fc_in_listener",
        "torso": "fc_in_torso",
    }[branch]
    skip_layers = {
        "head": "fc_p_skips",
        "head_listener": "fc_p_skips_listener",
        "torso": "fc_p_skips_torso",
    }[branch]

    net = linear(params[in_layer], p)
    if cfg.z_dim > 0:
        net = net + linear(params["fc_z"], z_shape)
    net = jax.nn.relu(net)

    skip_idx = 0
    for idx, layer in enumerate(params["blocks"]):
        net = jax.nn.relu(linear(layer, net))
        if (idx + 1) in cfg.skips and idx < len(params["blocks"]) - 1:
            net = net + linear(params["fc_z_skips"][skip_idx], z_shape)
            net = net + linear(params[skip_layers][skip_idx], p)
            skip_idx += 1

    sigma = linear(params["sigma_out"], net)[..., 0]

    net = linear(params["feat_view"], net)
    net = net + linear(params["fc_z_view"], z_app)
    if expression is not None and cfg.use_expression:
        net = net + linear(params["expnet"], expression)

    if cfg.use_viewdirs and ray_d is not None:
        ray_d = ray_d.astype(jnp.float32)
        ray_d = ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
        if cfg.positional_encoding == "gauss":
            rd = gauss_posenc(ray_d, b_view, cfg.downscale_p_by)
        else:
            rd = sincos_posenc(ray_d, cfg.n_freq_posenc_views, cfg.downscale_p_by)
        if compute_dtype is not None:
            rd = rd.astype(compute_dtype)
        net = net + linear(params["fc_view"], rd)
        net = jax.nn.relu(net)
        if cfg.n_blocks_view > 1:
            for layer in params["blocks_view"]:
                net = jax.nn.relu(linear(layer, net))

    feat = linear(params["feat_out"], net).astype(jnp.float32)
    if cfg.final_sigmoid_activation:
        feat = jax.nn.sigmoid(feat)
    return feat, sigma.astype(jnp.float32)
