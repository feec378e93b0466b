"""Interop: migrate trained reference (PyTorch) checkpoints into this
framework."""

from music_style_transfer_ldm_tpu.interop.torch_weights import (  # noqa: F401
    convert_autoencoder_state_dicts, convert_decoder_state_dict,
    convert_encoder_state_dict, convert_ldm_state_dict,
    convert_style_encoder_state_dict, convert_unet_state_dict,
)
