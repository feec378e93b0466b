"""Log-mel dB <-> grayscale image quantization.

Reproduces the reference's uint8 image codec exactly
(ref: data/audio_processor.py:55-73 forward, :94-97 inverse):

  u8  = clip((db + max_db) * 255/max_db, 0, 255) + 0.5, floored to uint8
  db  = u8 * (max_db/255) - max_db

plus float variants mapping straight to the [0, 1] tensors the models
consume (the reference goes uint8 PNG -> PIL -> ToTensor/255; the float
path fuses that into one op for on-device pipelines).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def db_to_uint8_image(S_db: jax.Array, max_db: float = 80.0) -> jax.Array:
    """dB in [-max_db, 0] -> uint8 [0, 255] with the +0.5 rounding trick."""
    x = (S_db.astype(jnp.float32) + max_db) * (255.0 / max_db)
    x = jnp.clip(x, 0.0, 255.0)
    return jnp.floor(x + 0.5).astype(jnp.uint8)


def uint8_image_to_db(img: jax.Array, max_db: float = 80.0) -> jax.Array:
    """uint8 [0, 255] -> dB (ref: audio_processor.py:97)."""
    return img.astype(jnp.float32) * (max_db / 255.0) - max_db


def db_to_unit_image(S_db: jax.Array, max_db: float = 80.0,
                     quantize: bool = True) -> jax.Array:
    """dB -> float [0, 1] tensor, optionally through the uint8 grid.

    With quantize=True this is bit-identical to the reference pipeline
    (PNG uint8 then torchvision ToTensor dividing by 255).
    """
    if quantize:
        return db_to_uint8_image(S_db, max_db).astype(jnp.float32) / 255.0
    return jnp.clip((S_db.astype(jnp.float32) + max_db) / max_db, 0.0, 1.0)


def unit_image_to_db(x: jax.Array, max_db: float = 80.0) -> jax.Array:
    """float [0, 1] -> dB in [-max_db, 0]."""
    return x.astype(jnp.float32) * max_db - max_db


def unit_image_to_uint8(x: jax.Array) -> jax.Array:
    """float [0, 1] image -> uint8 with the same +0.5 rounding convention."""
    arr = jnp.clip(jnp.asarray(x, jnp.float32) * 255.0 + 0.5, 0.0, 255.0)
    return jnp.floor(arr).astype(jnp.uint8)
