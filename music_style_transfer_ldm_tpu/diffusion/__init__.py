"""Diffusion: noise schedule, q-sampling, and scan-based DDIM samplers."""

from music_style_transfer_ldm_tpu.diffusion.schedule import (  # noqa: F401
    DiffusionSchedule, linear_beta_schedule,
)
from music_style_transfer_ldm_tpu.diffusion.ddim import (  # noqa: F401
    ddim_sample, generation_time_grid, transfer_time_grid,
)
