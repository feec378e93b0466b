"""Two-phase training (ref: models/train.py), TPU-first: jitted sharded
steps, optax optimizers, plateau LR control, orbax checkpoints."""

from music_style_transfer_ldm_tpu.training.optim import (  # noqa: F401
    PlateauState, make_optimizer, plateau_init, plateau_update,
)
from music_style_transfer_ldm_tpu.training.train_autoencoder import (  # noqa: F401
    AETrainer,
)
from music_style_transfer_ldm_tpu.training.train_ldm import LDMTrainer  # noqa: F401
from music_style_transfer_ldm_tpu.training.distill import (  # noqa: F401
    ProgressiveDistiller,
)
