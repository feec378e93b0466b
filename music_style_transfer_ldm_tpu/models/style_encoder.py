"""Multi-resolution style pyramid encoder.

Re-implements the reference StyleEncoder (ref: models/model.py:51-88):
six stride-2 convs producing embeddings s1..s6 at 64x64 .. 2x2.  The full
pyramid is returned for API parity even though the UNet only consumes s5/s6
(ref: model.py:211,214; quirk documented in SURVEY.md section 7).
Parameter count matches the reference: 2,729,984 (report/results.tex:100).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from music_style_transfer_ldm_tpu.models.layers import conv_s2

Dtype = Any


class StyleEncoder(nn.Module):
    """[B, 128, 128, 1] -> dict of NHWC maps s1..s6."""

    num_filters: int = 64
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, style: jax.Array) -> Dict[str, jax.Array]:
        nf = self.num_filters
        c = lambda feats, name: conv_s2(feats, name, self.dtype,
                                        self.param_dtype)
        x = style.astype(self.dtype)
        s1 = nn.relu(c(nf, "enc1")(x))          # [B, 64, 64, 64]
        s2 = nn.relu(c(nf * 2, "enc2")(s1))     # [B, 32, 32, 128]
        s3 = nn.relu(c(nf * 4, "enc3")(s2))     # [B, 16, 16, 256]
        s4 = nn.relu(c(nf * 4, "enc4")(s3))     # [B, 8, 8, 256]
        s5 = nn.relu(c(nf * 4, "enc5")(s4))     # [B, 4, 4, 256]
        s6 = nn.relu(c(nf * 8, "enc6")(s5))     # [B, 2, 2, 512]
        return {"s1": s1, "s2": s2, "s3": s3, "s4": s4, "s5": s5, "s6": s6}
