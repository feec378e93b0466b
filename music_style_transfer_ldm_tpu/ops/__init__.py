"""Fused ops and Pallas TPU kernels for the hot paths."""

from music_style_transfer_ldm_tpu.ops.pallas.fused_mel_image import (  # noqa: F401
    fused_mel_unit_image,
)
from music_style_transfer_ldm_tpu.ops.pallas.ddim_update import (  # noqa: F401
    fused_ddim_update,
)
