"""Loss zoo (ref: models/loss.py)."""

from music_style_transfer_ldm_tpu.losses.basic import (  # noqa: F401
    compression_loss, diffusion_loss, gram_matrix, kl_regularization_loss,
    perceptual_loss, style_loss,
)
from music_style_transfer_ldm_tpu.losses.vggish import (  # noqa: F401
    VGGishFeatures, VGGishFeatureLoss, convert_torchvggish_state_dict,
)
from music_style_transfer_ldm_tpu.losses.lpips import (  # noqa: F401
    LPIPS, LPIPSLoss, convert_torch_lpips_state_dict,
)
