"""Convert PyTorch reference checkpoints to dfanerf_tpu parameter pytrees.

The reference saves a 10-entry dict .tar every ``--i_weights`` iterations
(run_nerf_com_trainExpLater.py:1099-1115) holding state_dicts for the
Decoder, AudioNet_W2L, ExpressionEnc, the two AudioAttNets, the fixed
latents z_shape/z_app, and global_step. These converters map each
state_dict onto our functional pytrees:

- torch Linear weight [out, in]  -> ours [in, out]      (transpose)
- torch Conv1d weight [out, in, k] -> ours [k, in, out] (transpose 2,1,0)

Input state_dicts may hold torch tensors or numpy arrays; we coerce with
a local ``_np`` so this module never requires torch at import time.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    # always COPY: torch .numpy() views share storage with the live model,
    # and jnp.asarray on CPU may alias numpy buffers — without the copy a
    # later in-place torch update would silently mutate converted params
    return np.array(x, dtype=np.float32)


def _lin(sd: Mapping[str, Any], name: str) -> Dict[str, jnp.ndarray]:
    return {
        "w": jnp.asarray(_np(sd[f"{name}.weight"]).T),
        "b": jnp.asarray(_np(sd[f"{name}.bias"])),
    }


def _conv1d(sd: Mapping[str, Any], name: str) -> Dict[str, jnp.ndarray]:
    return {
        "w": jnp.asarray(_np(sd[f"{name}.weight"]).transpose(2, 1, 0)),
        "b": jnp.asarray(_np(sd[f"{name}.bias"])),
    }


def _seq_lin(sd: Mapping[str, Any], prefix: str):
    """All Linear layers of a ModuleList ``prefix.{i}`` in index order."""
    idxs = sorted(
        {
            int(k[len(prefix) + 1 :].split(".")[0])
            for k in sd
            if k.startswith(prefix + ".")
        }
    )
    return [_lin(sd, f"{prefix}.{i}") for i in idxs]


def deformation_field_from_torch(sd: Mapping[str, Any], prefix: str = "deform_net"):
    return {
        "blocks_embed": _seq_lin(sd, f"{prefix}.blocks_embed"),
        "out_embed": _lin(sd, f"{prefix}.out_embed"),
        "blocks_signal": _seq_lin(sd, f"{prefix}.blocks_signal"),
        "out_signal": _lin(sd, f"{prefix}.out_signal"),
        "fc_embed_skips": _seq_lin(sd, f"{prefix}.fc_embed_skips"),
        "fc_signal_skips": _seq_lin(sd, f"{prefix}.fc_signal_skips"),
    }


def decoder_from_torch(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Reference ``Decoder`` state_dict -> our decoder param pytree."""
    p: Dict[str, Any] = {
        "fc_in": _lin(sd, "fc_in"),
        "fc_in_listener": _lin(sd, "fc_in_listener"),
        "fc_in_torso": _lin(sd, "fc_in_torso"),
        "blocks": _seq_lin(sd, "blocks"),
        "sigma_out": _lin(sd, "sigma_out"),
        "fc_z_view": _lin(sd, "fc_z_view"),
        "feat_view": _lin(sd, "feat_view"),
        "fc_view": _lin(sd, "fc_view"),
        "feat_out": _lin(sd, "feat_out"),
    }
    if "fc_z.weight" in sd:
        p["fc_z"] = _lin(sd, "fc_z")
    for name in (
        "fc_z_skips",
        "fc_p_skips",
        "fc_p_skips_listener",
        "fc_p_skips_torso",
        "blocks_view",
    ):
        if f"{name}.0.weight" in sd:
            p[name] = _seq_lin(sd, name)
    if "deform_net.blocks_embed.0.weight" in sd:
        p["deform_net"] = deformation_field_from_torch(sd)
    if "expnet.weight" in sd:
        p["expnet"] = _lin(sd, "expnet")
    if "w2lnet.weight" in sd:
        p["w2lnet"] = _lin(sd, "w2lnet")
    return p


def audionet_w2l_from_torch(sd: Mapping[str, Any]) -> Dict[str, Any]:
    return {
        "fc1": _lin(sd, "encoder.0"),
        "fc2": _lin(sd, "encoder.2"),
        "fc3": _lin(sd, "encoder.4"),
    }


def expression_enc_from_torch(sd: Mapping[str, Any]) -> Dict[str, Any]:
    return {"fc1": _lin(sd, "encoder.0"), "fc2": _lin(sd, "encoder.2")}


def audionet_ds_from_torch(sd: Mapping[str, Any]) -> Dict[str, Any]:
    return {
        "conv1": _conv1d(sd, "encoder_conv.0"),
        "conv2": _conv1d(sd, "encoder_conv.2"),
        "conv3": _conv1d(sd, "encoder_conv.4"),
        "conv4": _conv1d(sd, "encoder_conv.6"),
        "fc1": _lin(sd, "encoder_fc1.0"),
        "fc2": _lin(sd, "encoder_fc1.2"),
    }


def audio_attnet_from_torch(sd: Mapping[str, Any]) -> Dict[str, Any]:
    return {
        "conv1": _conv1d(sd, "attentionConvNet.0"),
        "conv2": _conv1d(sd, "attentionConvNet.2"),
        "conv3": _conv1d(sd, "attentionConvNet.4"),
        "conv4": _conv1d(sd, "attentionConvNet.6"),
        "conv5": _conv1d(sd, "attentionConvNet.8"),
        "att_fc": _lin(sd, "attentionNet.0"),
    }


def load_reference_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference ``{:06d}.tar`` checkpoint and convert every network.

    Returns a dict with keys: global_step, z_shape [1, 2*n_obj, z], z_app,
    decoder, audnet, expnet, audattnet, poseattnet (missing nets omitted,
    mirroring the reference's tolerant resume at :553-580).
    """
    import torch  # local import: torch is only needed for .tar deserialization

    state = torch.load(path, map_location="cpu")
    out: Dict[str, Any] = {
        "global_step": int(state["global_step"]),
        "z_shape": jnp.asarray(_np(state["z_shape"])),
        "z_app": jnp.asarray(_np(state["z_app"])),
        "decoder": decoder_from_torch(state["network_decoder_state_dict"]),
    }
    if "network_AudNet_state_dict" in state:
        out["audnet"] = audionet_w2l_from_torch(state["network_AudNet_state_dict"])
    if "network_ExpNet_state_dict" in state:
        out["expnet"] = expression_enc_from_torch(state["network_ExpNet_state_dict"])
    if "network_AudAttNet_state_dict" in state:
        out["audattnet"] = audio_attnet_from_torch(
            state["network_AudAttNet_state_dict"]
        )
    if "network_PoseAttNet_state_dict" in state:
        out["poseattnet"] = audio_attnet_from_torch(
            state["network_PoseAttNet_state_dict"]
        )
    return out
