"""Train state pytree."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax


@flax.struct.dataclass
class TrainState:
    """Everything the jitted step mutates, as one donatable pytree.

    ema_params is None unless EMA tracking is enabled
    (TrainConfig.ema_decay > 0); a None field is an empty pytree node, so
    all existing checkpoints/jit signatures are unchanged when it is off.
    """

    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array
    ema_params: Any = None


def ema_update(ema_params, params, decay, step):
    """One EMA step: ema <- d*ema + (1-d)*params, with the standard
    warm-up schedule d = min(decay, (1+step)/(10+step)) so the average
    tracks quickly from init instead of dragging the seed weights
    (the DDPM/LDM convention; no reference counterpart — the reference
    trains and samples from the raw weights only, ref: models/train.py).
    """
    import jax.numpy as jnp
    d = jnp.minimum(jnp.float32(decay),
                    (1.0 + step) / (10.0 + step)).astype(jnp.float32)
    # Accumulate in float32 regardless of param dtype: a 0.999-decay step
    # rounds away entirely in bf16 (bf16(0.999*1 + 0.001*0) == 1.0) and the
    # EMA would silently freeze if params were ever stored in bf16.
    return jax.tree_util.tree_map(
        lambda e, p: (d * e.astype(jnp.float32)
                      + (1.0 - d) * p.astype(jnp.float32)),
        ema_params, params)


def count_params(tree) -> int:
    import numpy as np
    return int(sum(np.prod(x.shape)
                   for x in jax.tree_util.tree_leaves(tree)))


def as_unit_images(x: jax.Array) -> jax.Array:
    """Normalize on device: uint8 batches (shipped raw to quarter the
    host->device transfer, datasets/loader.py dtype='uint8') become unit
    floats; float batches pass through unchanged.  Static on dtype, so
    each input dtype is its own compiled graph."""
    import jax.numpy as jnp
    if jnp.issubdtype(x.dtype, jnp.integer):
        return x.astype(jnp.float32) / 255.0
    return x


def prefetch_to_device(batches, place_fn, depth: int = 2):
    """Keep `depth` placed batches in flight: jax transfers are async, so
    placing batch i+1 while step i computes overlaps the host->device copy
    (expensive when the chip sits behind a network relay) with compute."""
    from collections import deque
    buf = deque()
    for item in batches:
        buf.append(place_fn(item))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
