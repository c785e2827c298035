"""Pack decoder weights for the fused Pallas render kernel.

Algebraic preparation that turns the reference's per-point concat-and-matmul
decoder into a frame-specialized MLP over the 60-dim positional encoding:

- Every contribution that is CONSTANT for a frame — the conditioning signal
  slice of fc_in / fc_p_skips (a linear map of a per-frame vector), the
  z_shape injections (fc_z, fc_z_skips), the z_app view injection
  (fc_z_view) — is folded into the corresponding bias. Exact same math,
  strictly fewer per-point FLOPs, and the kernel never materializes the
  [N, 156] concat.
- Matrices are zero-padded to lane-friendly shapes (PE 60 -> 64 rows) and
  cast to bf16 for the MXU; folded biases stay fp32.
- sigma_out (256->1) and feat_view (256->256) are fused into one
  [256, 384] matmul: column 0 is sigma, columns 128:384 are the view
  feature (column block alignment keeps the slices tile-friendly).
- For the torso branch, the deformation field is packed in its 128-wide
  block-diagonal form (see models/decoder.py) with the frame-constant
  signal contribution folded into its first-layer and skip biases.

The unpadded-semantics parity of all of this is tested against
apply_decoder in tests/test_ops.py.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from dfanerf_tpu.models.decoder import DecoderConfig

Params = Dict[str, Any]

PE_DIM = 60          # 3 * 10 freqs * 2
PE_PAD = 64          # sublane-friendly padding of the PE input
DEFORM_HIDDEN = 128  # merged block-diagonal deform width
SIG_PAD = 128        # padded torso deformed-signal width (42 -> 128)


def _pad_rows(w: jnp.ndarray, rows: int) -> jnp.ndarray:
    return jnp.concatenate(
        [w, jnp.zeros((rows - w.shape[0], w.shape[1]), w.dtype)], axis=0
    )


def _bf16(w: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    return w.astype(dtype)


def pack_field_weights(
    params: Params,
    cfg: DecoderConfig,
    signal: jnp.ndarray,
    z_shape: jnp.ndarray,
    z_app: jnp.ndarray,
    branch: str,
    param_dtype=jnp.bfloat16,
) -> Dict[str, jnp.ndarray]:
    """Fold frame constants and pad/cast the decoder for the fused kernel.

    Args:
        signal: [dim_signal] ('head') or [dim_et_embed] ('torso') per-frame
            conditioning vector.
    Returns:
        dict of kernel operands (bf16 matrices, fp32 biases):
          w_in [64,256], b_in [256]
          w_blocks [7,256,256], b_blocks [7,256]
          w_skip [64,256], b_skip [256]
          w_sf [256,384], b_sf [384]      (sigma col 0; feat_view 128:384)
          w_out [256,128], b_out [128]    (rgb cols 0:3)
          w_view [24,256]                 (per-ray, applied OUTSIDE kernel)
          b_view_zapp — folded into b_sf's feat part already
          torso extras: w_in/w_skip become [128,256] (pe rows 0:60, signal
          rows 60:102 — the deformed signal varies per point), plus the
          block-diagonal deform net d_w1 [64,128], d_b1 [128],
          d_wk [4,128,128], d_bk [4,128], d_wskip [64,128], d_bskip [128],
          d_wout [128,128(102 valid)], d_bout [128], sig_pad [128].
    """
    assert branch in ("head", "torso")
    def _cast(w):
        return _bf16(w, param_dtype)
    H = cfg.hidden_size
    f32 = jnp.float32
    sig = signal.astype(f32)

    # the fused kernels evaluate the octave PE in-register (slot-replicated
    # sin trick); the gauss mode runs through apply_decoder / the XLA
    # renderer only
    assert cfg.positional_encoding == "normal", (
        "fused serving kernels support positional_encoding='normal' only"
    )
    if branch == "head":
        fc_in = params["fc_in"]
        fc_skip = params["fc_p_skips"][0]
        d_sig = cfg.dim_signal
    else:
        fc_in = params["fc_in_torso"]
        fc_skip = params["fc_p_skips_torso"][0]
        d_sig = cfg.dim_et_embed

    w_in_pe = fc_in["w"][:PE_DIM].astype(f32)
    w_in_sig = fc_in["w"][PE_DIM : PE_DIM + d_sig].astype(f32)
    w_skip_pe = fc_skip["w"][:PE_DIM].astype(f32)
    w_skip_sig = fc_skip["w"][PE_DIM : PE_DIM + d_sig].astype(f32)

    b_in = fc_in["b"].astype(f32) + z_shape.astype(f32) @ params["fc_z"]["w"].astype(
        f32
    ) + params["fc_z"]["b"].astype(f32)
    b_skip = (
        fc_skip["b"].astype(f32)
        + z_shape.astype(f32) @ params["fc_z_skips"][0]["w"].astype(f32)
        + params["fc_z_skips"][0]["b"].astype(f32)
    )
    if branch == "head":
        # signal is constant along the ray batch: fold through the sig slices
        b_in = b_in + sig @ w_in_sig
        b_skip = b_skip + sig @ w_skip_sig

    # sigma / feat_view fused matmul [256, 384]
    w_sf = jnp.zeros((H, 384), f32)
    w_sf = w_sf.at[:, 0].set(params["sigma_out"]["w"][:, 0].astype(f32))
    w_sf = w_sf.at[:, 128:384].set(params["feat_view"]["w"].astype(f32))
    b_sf = jnp.zeros((384,), f32)
    b_sf = b_sf.at[0].set(params["sigma_out"]["b"][0].astype(f32))
    b_feat = (
        params["feat_view"]["b"].astype(f32)
        + z_app.astype(f32) @ params["fc_z_view"]["w"].astype(f32)
        + params["fc_z_view"]["b"].astype(f32)
    )
    b_sf = b_sf.at[128:384].set(b_feat)

    w_out = jnp.zeros((H, 128), f32)
    w_out = w_out.at[:, :3].set(params["feat_out"]["w"].astype(f32))
    b_out = jnp.zeros((128,), f32)
    b_out = b_out.at[:3].set(params["feat_out"]["b"].astype(f32))

    packed = {
        "w_in": _cast(_pad_rows(w_in_pe, PE_PAD)),
        "b_in": b_in,
        "w_blocks": jnp.stack(
            [_cast(b["w"]) for b in params["blocks"]]
        ),
        "b_blocks": jnp.stack([b["b"].astype(f32) for b in params["blocks"]]),
        "w_skip": _cast(_pad_rows(w_skip_pe, PE_PAD)),
        "b_skip": b_skip,
        "w_sf": _cast(w_sf),
        "b_sf": b_sf,
        "w_out": _cast(w_out),
        "b_out": b_out,
        "w_view": params["fc_view"]["w"].astype(f32),  # per-ray XLA side
        "b_view": params["fc_view"]["b"].astype(f32),
    }

    if branch == "torso" and cfg.use_deformation_field:
        dn = params["deform_net"]
        be, bs = dn["blocks_embed"], dn["blocks_signal"]

        def blockdiag(a, b):
            top = jnp.concatenate(
                [a, jnp.zeros((a.shape[0], b.shape[1]), f32)], axis=1
            )
            bot = jnp.concatenate(
                [jnp.zeros((b.shape[0], a.shape[1]), f32), b], axis=1
            )
            return jnp.concatenate([top, bot], axis=0)

        # first layer: [102, 128] -> pe rows + folded signal rows
        w1 = jnp.concatenate([be[0]["w"], bs[0]["w"]], axis=1).astype(f32)
        b1 = jnp.concatenate([be[0]["b"], bs[0]["b"]]).astype(f32) + sig @ w1[PE_DIM:]
        # skip: block-diag [102, 128]; signal part folded
        es, ss = dn["fc_embed_skips"][0], dn["fc_signal_skips"][0]
        wsk = blockdiag(es["w"].astype(f32), ss["w"].astype(f32))
        bsk = jnp.concatenate([es["b"], ss["b"]]).astype(f32) + sig @ wsk[PE_DIM:]
        # inner blocks 128x128
        wk = jnp.stack(
            [
                blockdiag(be[i]["w"].astype(f32), bs[i]["w"].astype(f32))
                for i in range(1, len(be))
            ]
        )
        bk = jnp.stack(
            [
                jnp.concatenate([be[i]["b"], bs[i]["b"]]).astype(f32)
                for i in range(1, len(be))
            ]
        )
        # out: [128, 102] -> pad cols to 128; embed cols 0:60, signal 60:102
        wout = blockdiag(dn["out_embed"]["w"].astype(f32), dn["out_signal"]["w"].astype(f32))
        bout = jnp.concatenate([dn["out_embed"]["b"], dn["out_signal"]["b"]]).astype(f32)
        wout = jnp.concatenate([wout, jnp.zeros((DEFORM_HIDDEN, 128 - wout.shape[1]), f32)], 1)
        bout = jnp.concatenate([bout, jnp.zeros((128 - bout.shape[0],), f32)])

        # trunk consumes the DEFORMED concat p' = [pe + d_e | sig + d_s]
        # (the signal part varies per point after deformation, so the torso
        # trunk input is the full 128-padded vector): w_in/w_skip become
        # [128, 256] with pe rows 0:60 and signal rows 60:102.
        sig_pad = jnp.zeros((128,), f32).at[60 : 60 + d_sig].set(sig)
        w_in128 = jnp.zeros((128, H), f32)
        w_in128 = w_in128.at[:PE_DIM].set(w_in_pe).at[60 : 60 + d_sig].set(w_in_sig)
        w_skip128 = jnp.zeros((128, H), f32)
        w_skip128 = (
            w_skip128.at[:PE_DIM].set(w_skip_pe).at[60 : 60 + d_sig].set(w_skip_sig)
        )
        packed["w_in"] = _cast(w_in128)
        packed["w_skip"] = _cast(w_skip128)

        packed.update(
            {
                "d_w1": _cast(_pad_rows(w1[:PE_DIM], PE_PAD)),
                "d_b1": b1,
                "d_wk": _cast(wk),
                "d_bk": bk,
                "d_wskip": _cast(_pad_rows(wsk[:PE_DIM], PE_PAD)),
                "d_bskip": bsk,
                "d_wout": _cast(wout),
                "d_bout": bout,
                "sig_pad": sig_pad,  # [128] fp32 (signal at cols 60:102)
            }
        )
    return packed
