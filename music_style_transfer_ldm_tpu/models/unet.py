"""Latent-space denoising UNet with time conditioning and style
cross-attention.

Re-implements the reference UNet (ref: models/model.py:163-231) in
flax/NHWC over the [16, 16, latent_dim] latent:

  enc1 (s1, ->64ch @16x16) -> enc2 (s2, ->128ch @8x8, + time embedding)
  -> enc3 (->256ch @4x4) -> cross-attn with s5 -> enc4 (->512ch @2x2)
  -> cross-attn with s6 -> bottleneck -> transpose-conv decoder with
  additive skip connections to the pre-attention activations -> 3x3 conv
  back to latent_dim channels.

Note the reference's skips are *additive* (not concatenative) and connect
to z3/z2/z1 captured before the attention blocks (ref: model.py:220-227).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from music_style_transfer_ldm_tpu.models.layers import (
    CrossAttention, SinusoidalPositionEmbeddings, conv_s1, conv_s2,
    convT_k3, crop_k3_output,
)

Dtype = Any


class UNet(nn.Module):
    """([B, 16, 16, C_lat], t, style pyramid) -> [B, 16, 16, C_lat]."""

    in_channels: int = 32
    out_channels: int = 32
    num_filters: int = 64
    time_emb_dim: int = 128
    num_heads: int = 4
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array, t: jax.Array,
                 style_embedding: Dict[str, jax.Array]) -> jax.Array:
        nf = self.num_filters
        dt, pt = self.dtype, self.param_dtype

        # Time conditioning MLP (ref: model.py:170-175,203).
        temb = SinusoidalPositionEmbeddings(self.time_emb_dim)(t)
        temb = nn.Dense(self.time_emb_dim, name="time_fc1", dtype=dt,
                        param_dtype=pt)(temb.astype(dt))
        temb = nn.gelu(temb)
        temb = nn.Dense(self.time_emb_dim, name="time_fc2", dtype=dt,
                        param_dtype=pt)(temb)
        temb = temb[:, None, None, :]  # broadcast over H, W

        z = z.astype(dt)
        z1 = nn.relu(conv_s1(nf, "enc1", dt, pt)(z))            # 16x16x64
        z2 = nn.relu(conv_s2(nf * 2, "enc2", dt, pt)(z1)) + temb  # 8x8x128
        z3 = nn.relu(conv_s2(nf * 4, "enc3", dt, pt)(z2))       # 4x4x256
        z3_skip = z3
        z3 = CrossAttention(nf * 4, self.num_heads, dtype=dt, param_dtype=pt,
                            name="cross_attention2")(z3, style_embedding["s5"])
        z4 = nn.relu(conv_s2(nf * 8, "enc4", dt, pt)(z3))       # 2x2x512
        z4_skip = z4
        z4 = CrossAttention(nf * 8, self.num_heads, dtype=dt, param_dtype=pt,
                            name="cross_attention1")(z4, style_embedding["s6"])

        z4 = nn.relu(conv_s1(nf * 8, "bottleneck", dt, pt)(z4))  # 2x2x512

        # Decoder with additive skips (ref: model.py:220-227).
        crop = crop_k3_output
        u3 = nn.relu(crop(convT_k3(nf * 4, "dec4", dt, pt)(z4))) + z3_skip
        u2 = nn.relu(crop(convT_k3(nf * 2, "dec3", dt, pt)(u3))) + z2
        u1 = nn.relu(crop(convT_k3(nf, "dec2", dt, pt)(u2))) + z1
        return conv_s1(self.out_channels, "dec1", dt, pt)(u1)
