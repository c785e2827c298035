"""Model zoo: functional pytree modules (params are plain nested dicts of
jnp arrays; apply functions are pure and jittable).

We deliberately avoid a module framework in the hot path — parameters as
bare pytrees shard cleanly under pjit/shard_map, convert 1:1 from the
PyTorch reference checkpoints (compat/torch_ckpt.py), and keep the fused
Pallas renderer's weight plumbing trivial.
"""

from dfanerf_tpu.models.decoder import (
    DecoderConfig,
    init_decoder,
    apply_decoder,
    init_deformation_field,
    apply_deformation_field,
)
from dfanerf_tpu.models.encoders import (
    init_audionet_w2l,
    apply_audionet_w2l,
    init_audionet_ds,
    apply_audionet_ds,
    init_expression_enc,
    apply_expression_enc,
    init_audio_attnet,
    apply_audio_attnet,
)

__all__ = [
    "DecoderConfig",
    "init_decoder",
    "apply_decoder",
    "init_deformation_field",
    "apply_deformation_field",
    "init_audionet_w2l",
    "apply_audionet_w2l",
    "init_audionet_ds",
    "apply_audionet_ds",
    "init_expression_enc",
    "apply_expression_enc",
    "init_audio_attnet",
    "apply_audio_attnet",
]
