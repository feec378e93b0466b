"""Spectrogram autoencoder (the "VAE" of the latent diffusion model).

Re-implements the reference architecture (ref: models/model.py:10-49) in
flax/NHWC: three stride-2 convs down to a [16, 16, latent_dim] latent, and
the mirrored transpose-conv decoder ending in tanh.  Parameter counts match
the reference exactly (encoder 111,840 / decoder 198,209;
ref: report/results.tex:98-99).

BatchNorm is kept (not swapped for GroupNorm) to preserve reference
semantics; under pjit with a batch-sharded input, the batch statistics are
computed globally (XLA inserts the cross-device reductions), which is
sync-BN for free.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from music_style_transfer_ldm_tpu.models.layers import conv_s2, convT_k4

Dtype = Any


class SpectrogramEncoder(nn.Module):
    """[B, 128, 128, 1] -> [B, 16, 16, latent_dim] (ref: model.py:10-28)."""

    latent_dim: int = 32
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 sample_weights: jax.Array | None = None) -> jax.Array:
        """sample_weights: optional [B] validity vector (1 real, 0 padded);
        in train mode, padded rows are excluded from the batch statistics
        (flax BatchNorm's mask support) so the data-parallel padder
        (parallel/sharding.py) can't contaminate running stats."""
        mask = (sample_weights.reshape(-1, 1, 1, 1) > 0
                if sample_weights is not None else None)
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5, name=name,
                                       dtype=self.dtype,
                                       param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        x = conv_s2(64, "conv1", self.dtype, self.param_dtype)(x)    # 64x64
        x = nn.relu(bn("bn1")(x, mask=mask))
        x = conv_s2(128, "conv2", self.dtype, self.param_dtype)(x)   # 32x32
        x = nn.relu(bn("bn2")(x, mask=mask))
        x = conv_s2(self.latent_dim, "conv3", self.dtype,
                    self.param_dtype)(x)                             # 16x16
        # final layer: BN only, no ReLU (ref: model.py:24)
        x = bn("bn3")(x, mask=mask)
        return x


class SpectrogramDecoder(nn.Module):
    """[B, 16, 16, latent_dim] -> [B, 128, 128, 1] in [-1, 1]
    (ref: model.py:31-49)."""

    latent_dim: int = 32
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = False,
                 sample_weights: jax.Array | None = None) -> jax.Array:
        mask = (sample_weights.reshape(-1, 1, 1, 1) > 0
                if sample_weights is not None else None)
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5, name=name,
                                       dtype=self.dtype,
                                       param_dtype=self.param_dtype)
        z = z.astype(self.dtype)
        z = convT_k4(128, "deconv1", self.dtype, self.param_dtype)(z)  # 32x32
        z = nn.relu(bn("bn1")(z, mask=mask))
        z = convT_k4(64, "deconv2", self.dtype, self.param_dtype)(z)   # 64x64
        z = nn.relu(bn("bn2")(z, mask=mask))
        z = convT_k4(1, "deconv3", self.dtype, self.param_dtype)(z)    # 128x128
        return jnp.tanh(z)
