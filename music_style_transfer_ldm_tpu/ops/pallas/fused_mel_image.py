"""Fused mel-projection -> dB -> quantize Pallas kernel.

The tail of the spectrogram ETL / serving path (ref chain:
librosa melspectrogram + power_to_db + uint8 quantize + ToTensor,
data/audio_processor.py:44-73) is, per item:

    mel   = FB @ S            (MXU matmul, [n_mels, F] x [F, T])
    ref   = max(mel)          (data-dependent per-item scalar)
    db    = 10*log10(max(amin, mel)) - 10*log10(max(amin, ref)), clip -80
    img   = round(clip((db+80) * 255/80)) / 255

This kernel keeps the [n_mels, T] tile in VMEM for the whole chain — one
HBM read of S, one HBM write of the image.  Grid over the batch dimension.

Measured on TPU v5e (batch 64, amortized over an on-device scan):
0.38 ms/call for this kernel vs 0.20 ms/call for the equivalent XLA chain —
XLA fuses the einsum + dB + quantize chain well on its own, so the DEFAULT
pipeline path uses the XLA chain (audio/processor.py) and this kernel is
kept as a tested, working alternate and a template for further sampler/DSP
fusion (SURVEY.md section 7 step 9: "Pallas only where XLA fusion is
insufficient" — here it is sufficient).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_AMIN = 1e-10


def _kernel(fb_ref, s_ref, out_ref, *, max_db: float, top_db: float,
            quantize: bool):
    mel = jnp.dot(fb_ref[:], s_ref[0], preferred_element_type=jnp.float32)
    mel = jnp.maximum(mel, _AMIN)
    log_spec = 10.0 * jnp.log10(mel)
    ref = jnp.max(log_spec)  # == 10*log10(max(mel)): per-item ref=max
    db = jnp.maximum(log_spec - ref, -top_db)
    img = (db + max_db) * (255.0 / max_db)
    img = jnp.clip(img, 0.0, 255.0)
    if quantize:
        img = jnp.floor(img + 0.5)  # the reference's +0.5 uint8 grid
    out_ref[0] = img * (1.0 / 255.0)


@functools.partial(jax.jit,
                   static_argnames=("max_db", "top_db", "quantize",
                                    "interpret"))
def fused_mel_unit_image(fb: jax.Array, power_spec: jax.Array,
                         max_db: float = 80.0, top_db: float = 80.0,
                         quantize: bool = True,
                         interpret: bool | None = None) -> jax.Array:
    """fb: [n_mels, F]; power_spec: [B, F, T] -> [B, n_mels, T] in [0, 1].

    Bit-compatible (up to the final /255 float) with
    AudioProcessor.get_mel_spectrogram + db_to_unit_image.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, F, T = power_spec.shape
    n_mels = fb.shape[0]
    kernel = functools.partial(_kernel, max_db=max_db, top_db=top_db,
                               quantize=quantize)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((n_mels, F), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, T), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_mels, T), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_mels, T), jnp.float32),
        interpret=interpret,
    )(fb.astype(jnp.float32), power_spec.astype(jnp.float32))
