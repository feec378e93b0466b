"""Train state pytree."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax


@flax.struct.dataclass
class TrainState:
    """Everything the jitted step mutates, as one donatable pytree."""

    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def count_params(tree) -> int:
    import numpy as np
    return int(sum(np.prod(x.shape)
                   for x in jax.tree_util.tree_leaves(tree)))
