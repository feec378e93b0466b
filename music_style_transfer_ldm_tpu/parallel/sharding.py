"""Parameter/batch sharding rules (dp + tp).

Tensor-parallel rule: any parameter whose trailing (output-channel) axis is
wide enough to split evenly over the 'model' mesh axis is sharded there —
conv kernels [h, w, cin, cout] and dense kernels [in, out] split on cout;
matching biases split too.  Everything else is replicated.  XLA then emits
the all-gathers/reduce-scatters over ICI; no hand-written collectives.

With mesh (N, 1) this degrades to pure data parallelism; with (1, N) to
pure tensor parallelism; (n, m) composes both.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from music_style_transfer_ldm_tpu.parallel.mesh import (
    DATA_AXIS, MODEL_AXIS, batch_sharding,
)

_MIN_SHARD_WIDTH = 128  # don't split narrow layers; collective cost dominates


def param_partition_spec(path: tuple, value: Any, mesh: Mesh) -> P:
    """PartitionSpec for one parameter, keyed by its pytree path + shape."""
    model_size = mesh.shape[MODEL_AXIS]
    if model_size <= 1:
        return P()
    shape = value.shape
    if len(shape) == 0:
        return P()
    cout = shape[-1]
    if cout % model_size == 0 and cout >= _MIN_SHARD_WIDTH:
        return P(*([None] * (len(shape) - 1)), MODEL_AXIS)
    return P()


def shard_params(params, mesh: Mesh):
    """device_put every param with its partition spec."""
    def place(path, x):
        spec = param_partition_spec(path, x, mesh)
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map_with_path(place, params)


def param_sharding_tree(params, mesh: Mesh):
    """Matching tree of NamedShardings (for jit in_shardings/out_shardings)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: NamedSharding(mesh, param_partition_spec(path, x, mesh)),
        params)


def batch_validity_weights(n: int, multiple: int, mesh: Mesh = None):
    """[padded_n] float32 validity weights for a batch padded from n rows:
    1.0 for the n real rows, 0.0 for the pad rows, or None if no padding
    is needed.  Trainers pass these into the losses (weighted-mean
    renormalization, losses/basic.py) and into BatchNorm masks so the
    tail batch's loss and batch statistics equal the unpadded ones.
    """
    import numpy as np
    import jax.numpy as jnp
    rem = n % multiple
    if rem == 0:
        return None
    w = np.zeros(n + multiple - rem, np.float32)
    w[:n] = 1.0
    w = jnp.asarray(w)
    if mesh is not None:
        w = jax.device_put(w, batch_sharding(mesh, ndim=1))
    return w


def pad_batch_to_multiple(x, multiple: int):
    """Pad the leading dim up to a multiple by repeating the final row.

    Partial trailing batches can't split over the 'data' axis; repeating
    rows keeps shapes static for jit (each distinct batch size still
    compiles once).  Pair with batch_validity_weights so pad rows are
    excluded from losses and batch statistics.
    """
    import jax.numpy as jnp
    n = x.shape[0]
    rem = n % multiple
    if rem == 0:
        return x
    pad = multiple - rem
    filler = jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])
    return jnp.concatenate([x, filler], axis=0)


def global_batch_from_local(local_batch, mesh: Mesh):
    """Assemble a global 'data'-sharded array from per-process local rows.

    Multi-host input path: each host loads only its own slice of the global
    batch (BatchLoader(process_index=..., process_count=...) /
    PackedSpectrogramDataset.gather(..., process_index=...)) and this
    assembles the logical global array via
    jax.make_array_from_process_local_data — no host ever materializes the
    full global batch.  The loaders' contiguous per-process slicing matches
    NamedSharding's row ownership for a mesh built from jax.devices()
    (process-contiguous device order).  In a single-process run this equals
    shard_batch(local_batch, mesh, pad=False).
    """
    import numpy as np

    def place(x):
        return jax.make_array_from_process_local_data(
            batch_sharding(mesh, ndim=np.ndim(x)), np.asarray(x))
    return jax.tree_util.tree_map(place, local_batch)


def shard_batch(batch, mesh: Mesh, pad: bool = True,
                sequence_parallel: bool = False):
    """Shard array leaves over the 'data' axis on their leading dim.

    pad=True repeats trailing rows so every leading dim divides the data
    axis (see pad_batch_to_multiple).  sequence_parallel=True additionally
    shards the time (width) axis of NHWC images over the 'model' axis —
    use for clips too wide for one chip's HBM; convs get their halo
    exchanges from GSPMD.  Widths not divisible by the model axis are
    zero-padded on the right (silence columns, the dataset builder's
    convention for its final chunk) — crop outputs back if exact width
    matters.
    """
    import jax.numpy as jnp
    from music_style_transfer_ldm_tpu.parallel.mesh import sequence_sharding
    n_data = mesh.shape[DATA_AXIS]
    n_model = mesh.shape[MODEL_AXIS]

    def place(x):
        if pad and x.shape[0] % n_data:
            x = pad_batch_to_multiple(x, n_data)
        if sequence_parallel and x.ndim >= 3:
            rem = x.shape[2] % n_model
            if pad and rem:
                widths = [(0, 0)] * x.ndim
                widths[2] = (0, n_model - rem)
                x = jnp.pad(x, widths)
            return jax.device_put(x, sequence_sharding(mesh, ndim=x.ndim))
        return jax.device_put(x, batch_sharding(mesh, ndim=x.ndim))
    return jax.tree_util.tree_map(place, batch)
