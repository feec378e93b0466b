"""Flax model zoo mirroring the reference's models/model.py, NHWC + TPU-first."""

from music_style_transfer_ldm_tpu.models.autoencoder import (  # noqa: F401
    SpectrogramEncoder, SpectrogramDecoder,
)
from music_style_transfer_ldm_tpu.models.style_encoder import StyleEncoder  # noqa: F401
from music_style_transfer_ldm_tpu.models.unet import UNet  # noqa: F401
from music_style_transfer_ldm_tpu.models.layers import (  # noqa: F401
    CrossAttention, SinusoidalPositionEmbeddings,
)
from music_style_transfer_ldm_tpu.models.ldm import LDM  # noqa: F401
