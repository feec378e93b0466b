"""music_style_transfer_ldm_tpu — TPU-native music style transfer with latent diffusion.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
PyTorch project (PrioteasaAndrei/music-style-transfer-ldm): audio -> log-mel
spectrogram images -> VAE-style autoencoder -> style-conditioned UNet denoiser
-> DDIM sampling -> Griffin-Lim audio reconstruction.

Layer map (mirrors reference SURVEY.md section 1, re-designed TPU-first):

  audio/      on-device DSP: STFT/ISTFT, Slaney mel, dB, quantize, NNLS,
              Griffin-Lim — all jittable & batched (ref: data/audio_processor.py)
  ops/        fused ops + Pallas TPU kernels for the hot paths
  models/     flax modules: SpectrogramEncoder/Decoder, StyleEncoder, UNet,
              CrossAttention (ref: models/model.py)
  diffusion/  beta schedule, q-sample, DDIM samplers as lax.scan
  losses/     compression/diffusion/style losses, VGGish feature loss
              (ref: models/loss.py)
  data/       acquisition + offline dataset ETL (ref: data/*.py)
  datasets/   input pipeline: folder/pair datasets, packed format, loaders
              (ref: models/dataset.py)
  training/   optax two-phase trainers, orbax checkpoints, metric logging
              (ref: models/train.py)
  parallel/   device mesh, NamedSharding rules (dp/tp), shard_map helpers
  utils/      env loading, pytree utilities
"""

__version__ = "0.1.0"

from music_style_transfer_ldm_tpu.config import Config, default_config  # noqa: F401
