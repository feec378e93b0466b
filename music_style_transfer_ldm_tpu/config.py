"""Framework configuration.

Mirrors every key of the reference's flat config dict
(ref: models/config.py:2-19) as a typed dataclass, plus TPU-specific knobs
(mesh shape, precision policy) that have no reference counterpart.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass
class AudioConfig:
    """DSP parameters (ref: data/audio_processor.py, data/build_dataset.py)."""

    sample_rate: int = 22050          # ref: audio_processor.py:14 target_sr
    n_fft: int = 2048                 # librosa melspectrogram default
    hop_length: int = 512             # librosa default n_fft // 4
    win_length: int = 2048            # librosa default = n_fft
    n_mels: int = 128                 # ref: build_dataset.py:76 n_mels=128
    fmin: float = 0.0
    fmax: float | None = None         # None -> sample_rate / 2
    max_db: float = 80.0              # ref: audio_processor.py:55 max_db=80
    top_db: float = 80.0              # librosa power_to_db default
    trim_top_db: float = 20.0         # ref: audio_processor.py:30 top_db=20
    chunk_seconds: float = 3.0        # ref: build_dataset.py:76 chunk_size_sec=3
    max_duration: float = 1800.0      # ref: build_dataset.py:76 max_duration=1800
    griffin_lim_iters: int = 32       # ref: audio_processor.py:132 n_iter=32
    griffin_lim_momentum: float = 0.99  # librosa fast Griffin-Lim default
    nnls_iters: int = 64              # FISTA iterations for mel inversion


@dataclasses.dataclass
class ModelConfig:
    """Model hyperparameters (ref: models/config.py, models/model.py)."""

    latent_dim: int = 32              # ref: config.py:11 latent_dim_encoder
    unet_num_filters: int = 64        # ref: config.py:15
    style_num_filters: int = 64       # ref: model.py:57 num_filters=64
    time_emb_dim: int = 128           # ref: model.py:168 time_emb_dim
    attn_num_heads: int = 4           # ref: model.py:130 num_heads=4
    image_size: int = 128             # 128x128 mel images (ref: dataset.py:51)
    in_channels: int = 1


@dataclasses.dataclass
class DiffusionConfig:
    """Noise schedule (ref: models/model.py:90-100, models/config.py:16)."""

    num_timesteps: int = 200          # ref: config.py:16
    beta_start: float = 1e-4          # ref: model.py:96
    beta_end: float = 0.02            # ref: model.py:97
    # SDEdit transfer noising depth (ref: tests.py:1068 passes 100): the
    # sampler walks the first `transfer_timesteps` of the schedule, and
    # progressive distillation (training/distill.py) trains its students
    # over this same range — keep them coupled through this one field.
    transfer_timesteps: int = 100


@dataclasses.dataclass
class TrainConfig:
    """Training hyperparameters (ref: models/config.py, models/train.py)."""

    learning_rate: float = 5e-4       # ref: config.py:3
    lr_factor: float = 0.5            # ref: config.py:4 (plateau factor)
    lr_patience: int = 5              # ref: config.py:5 (AE phase)
    ldm_lr_patience: int = 10         # ref: train.py:160 (LDM phase)
    lr_min: float = 1e-6              # ref: config.py:6
    num_epochs: int = 202             # ref: config.py:7
    batch_size: int = 128             # ref: config.py:9
    style_loss_weight: float = 3.0    # ref: config.py:10
    perceptual_weight: float = 0.1    # ref: loss.py:45
    kl_weight: float = 0.01           # ref: loss.py:45
    compression_feature_extractor: str = "lpips"  # ref: config.py:17
    # The reference's VGGish style loss runs under torch.no_grad
    # (loss.py:78): the weight-3.0 style term contributes a value but zero
    # gradient.  True reproduces that; False lets the style term train.
    style_loss_stop_gradient: bool = True
    training_iteration_noise: int = 50  # ref: config.py:18 (vestigial scaling)
    # Classifier-free-guidance training (no reference counterpart):
    # fraction of samples whose style embedding is zeroed each step, so
    # the UNet also learns an unconditional prediction and sampling can
    # take a `guidance` style-strength knob (models/ldm.py:_denoise_fn).
    style_dropout: float = 0.0
    # EMA of the trainable weights (no reference counterpart; standard
    # DDPM/LDM practice).  0 disables; 0.999 is the usual setting.  When
    # on, checkpoints carry ema_params and every inference surface
    # (load_ldm) prefers them over the raw weights.
    ema_decay: float = 0.0
    train_split: float = 0.8          # ref: dataset.py:309
    seed: int = 0
    ckpt_every_epochs: int = 100      # ref: train.py:270
    # TPU-specific
    compute_dtype: str = "bfloat16"   # mixed precision (ref AMP: train.py:157)
    param_dtype: str = "float32"


@dataclasses.dataclass
class DataConfig:
    """Paths (ref: models/config.py:12-14)."""

    data_dir: str = "downloads/"
    processed_dir: str = "processed_images"
    pairing_file: str = "spectrogram_pair_dataset_pairings.csv"
    num_pairs: int = 15000            # ref: dataset.py:263
    pairing_seed: int = 42            # ref: dataset.py:288
    pretrained_dir: str = "pretrained/"
    plots_dir: str = "plots/"


@dataclasses.dataclass
class MeshConfig:
    """Device mesh layout. No reference counterpart (single-GPU reference)."""

    data_axis: str = "data"
    model_axis: str = "model"
    # (-1, 1) => all devices on the data axis by default.
    mesh_shape: Tuple[int, int] = (-1, 1)
    # Width-shard NHWC batches over the 'model' axis (sequence parallelism
    # for clips too wide for one chip's HBM); GSPMD inserts the conv halo
    # exchanges.  Train-step parity vs the replicated step is tested in
    # tests/test_parallel.py.
    sequence_parallel: bool = False


@dataclasses.dataclass
class Config:
    audio: AudioConfig = dataclasses.field(default_factory=AudioConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    diffusion: DiffusionConfig = dataclasses.field(default_factory=DiffusionConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)


def default_config() -> Config:
    return Config()
