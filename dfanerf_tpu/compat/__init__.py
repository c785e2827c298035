"""Interop with the PyTorch reference implementation: checkpoint converters
so users of ShunyuYao/DFA-NeRF can bring their trained weights here."""

from dfanerf_tpu.compat.torch_ckpt import (
    decoder_from_torch,
    audionet_w2l_from_torch,
    expression_enc_from_torch,
    audionet_ds_from_torch,
    audio_attnet_from_torch,
    load_reference_checkpoint,
)

__all__ = [
    "decoder_from_torch",
    "audionet_w2l_from_torch",
    "expression_enc_from_torch",
    "audionet_ds_from_torch",
    "audio_attnet_from_torch",
    "load_reference_checkpoint",
]
