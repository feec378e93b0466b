"""Shared building blocks: torch-aligned conv padding, cross-attention,
sinusoidal time embeddings.

Layout is NHWC throughout (TPU conv-friendly); the reference is NCHW torch
(ref: models/model.py).  Explicit (1,1)-style paddings reproduce the
reference's stride-2 k3 p1 geometry exactly (128 -> 64 -> 32 -> 16 ...).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def conv_s2(features: int, name: str | None = None, dtype=jnp.float32,
            param_dtype=jnp.float32) -> nn.Conv:
    """3x3 stride-2 conv with torch-style padding=1 (ref: model.py:17-23)."""
    return nn.Conv(features, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                   name=name, dtype=dtype, param_dtype=param_dtype)


def conv_s1(features: int, name: str | None = None, dtype=jnp.float32,
            param_dtype=jnp.float32) -> nn.Conv:
    """3x3 stride-1 conv with padding=1 (ref: model.py:178,188,194)."""
    return nn.Conv(features, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                   name=name, dtype=dtype, param_dtype=param_dtype)


def convT_k4(features: int, name: str | None = None, dtype=jnp.float32,
             param_dtype=jnp.float32) -> nn.ConvTranspose:
    """4x4 stride-2 transpose conv doubling H,W.

    Matches torch ConvTranspose2d(k=4, s=2, p=1) output geometry
    (ref: model.py:38-44): out = 2n, via flax 'SAME' transpose padding.
    """
    return nn.ConvTranspose(features, (4, 4), strides=(2, 2),
                            padding="SAME", name=name, dtype=dtype,
                            param_dtype=param_dtype)


def convT_k3(features: int, name: str | None = None, dtype=jnp.float32,
             param_dtype=jnp.float32) -> nn.ConvTranspose:
    """3x3 stride-2 transpose conv doubling H,W (use with crop_k3_output).

    Built as the full 'VALID' transpose (out = 2n+1); cropping the first
    row/column (crop_k3_output) reproduces torch
    ConvTranspose2d(k=3, s=2, p=1, output_padding=1) bit-exactly
    (ref: model.py:191-193) — verified numerically against torch, which
    matters for migrated reference checkpoints (interop/torch_weights.py):
    a one-pixel shift here would de-align the UNet's additive skips.
    """
    return nn.ConvTranspose(features, (3, 3), strides=(2, 2),
                            padding="VALID", name=name, dtype=dtype,
                            param_dtype=param_dtype)


def crop_k3_output(y: jax.Array) -> jax.Array:
    """Crop the VALID k3-transpose output to torch p=1/op=1 geometry."""
    return y[:, 1:, 1:, :]


class SinusoidalPositionEmbeddings(nn.Module):
    """Transformer-style timestep embedding (ref: model.py:234-246)."""

    dim: int = 128

    @nn.compact
    def __call__(self, time: jax.Array) -> jax.Array:
        half_dim = self.dim // 2
        scale = math.log(10000.0) / (half_dim - 1)
        freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -scale)
        args = time.astype(jnp.float32)[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class CrossAttention(nn.Module):
    """Style injection: UNet features attend to style features.

    Functional equivalent of the reference's nn.MultiheadAttention wrapper
    (ref: model.py:126-160): Q from UNet features, K/V from the style
    embedding, 4 heads, separate q/k/v/out projections with bias (same
    parameter count as torch's packed in_proj + out_proj: 4*E*(E+1)).

    TPU notes: operates on NHWC maps flattened to tokens; token counts are
    tiny (16 at 4x4, 4 at 2x2) so a single fused einsum attention is optimal
    — no need for blockwise kernels at this scale.  Softmax in fp32.
    """

    embed_dim: int
    num_heads: int = 4
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, unet_features: jax.Array,
                 style_embedding: jax.Array) -> jax.Array:
        B, H, W, C = unet_features.shape
        assert C == self.embed_dim, (C, self.embed_dim)
        hd = self.embed_dim // self.num_heads

        q_in = unet_features.reshape(B, H * W, C)
        kv_in = style_embedding.reshape(
            B, style_embedding.shape[1] * style_embedding.shape[2], C)

        dense = lambda name: nn.Dense(self.embed_dim, name=name,
                                      dtype=self.dtype,
                                      param_dtype=self.param_dtype)
        q = dense("q_proj")(q_in).reshape(B, -1, self.num_heads, hd)
        k = dense("k_proj")(kv_in).reshape(B, -1, self.num_heads, hd)
        v = dense("v_proj")(kv_in).reshape(B, -1, self.num_heads, hd)

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / math.sqrt(hd)
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        attended = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(q.dtype), v,
                              preferred_element_type=jnp.float32)
        attended = attended.astype(self.dtype).reshape(B, H * W, C)
        out = dense("out_proj")(attended)
        return out.reshape(B, H, W, C)
