"""Device mesh construction and canonical shardings.

The framework's default strategy is (data, model) 2-D SPMD:
batches shard over the 'data' axis (pure DP); wide channel dimensions can
additionally shard over 'model' (TP) — XLA inserts the ICI collectives.
The reference trains on exactly one GPU (ref: models/train.py:22-26), so
its "mesh" is trivially (1, 1); here any jax device set works unchanged.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(shape: Sequence[int] = (-1, 1),
              axis_names: Sequence[str] = (DATA_AXIS, MODEL_AXIS),
              devices=None) -> Mesh:
    """Build a Mesh; one dim may be -1 (filled from the device count)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        if n % known:
            raise ValueError(f"{n} devices not divisible by {known}")
        shape[shape.index(-1)] = n // known
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sequence_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard batch over 'data' AND the time (width) axis over 'model' —
    sequence parallelism for wide spectrograms.  XLA GSPMD inserts the conv
    halo exchanges automatically; verified numerically identical to the
    replicated result (tests/test_parallel.py)."""
    if ndim < 3:
        return NamedSharding(mesh, P(DATA_AXIS))
    spec = [DATA_AXIS] + [None] * (ndim - 1)
    spec[2] = MODEL_AXIS  # NHWC: W is the spectrogram time axis
    return NamedSharding(mesh, P(*spec))
