"""Optimizers and LR control.

Reproduces the reference's setup (ref: models/train.py:47-48,156-161):
AdamW (phase 1) / Adam (phase 2) with ReduceLROnPlateau (factor 0.5,
patience 5/10, min_lr 1e-6).  The plateau controller is a tiny pure-python
host-side state machine driving the learning rate injected via
``optax.inject_hyperparams`` — the jitted step never recompiles when the LR
changes.  Parameter freezing (phase-2 encoder, ref: model.py:340-341) uses
``optax.multi_transform`` with a label tree.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import optax


@dataclasses.dataclass
class PlateauState:
    """ReduceLROnPlateau bookkeeping (torch semantics, mode='min')."""

    lr: float
    factor: float = 0.5
    patience: int = 5
    min_lr: float = 1e-6
    best: float = float("inf")
    bad_epochs: int = 0


def plateau_init(lr: float, factor: float = 0.5, patience: int = 5,
                 min_lr: float = 1e-6) -> PlateauState:
    return PlateauState(lr=lr, factor=factor, patience=patience,
                        min_lr=min_lr)


def plateau_update(state: PlateauState, metric: float) -> PlateauState:
    """One scheduler.step(metric): returns the updated state (new .lr)."""
    s = dataclasses.replace(state)
    if metric < s.best:
        s.best = metric
        s.bad_epochs = 0
    else:
        s.bad_epochs += 1
        if s.bad_epochs > s.patience:
            s.lr = max(s.lr * s.factor, s.min_lr)
            s.bad_epochs = 0
    return s


def make_optimizer(kind: str = "adamw", learning_rate: float = 5e-4,
                   freeze_mask: Optional[Callable] = None,
                   weight_decay: float = 0.01) -> optax.GradientTransformation:
    """Build the optimizer.

    kind: 'adamw' (AE phase, ref: train.py:47) or 'adam' (LDM phase,
      ref: train.py:156).
    freeze_mask: optional fn(params) -> bool pytree; True = frozen
      (gradients zeroed; equivalent to the reference's requires_grad=False
      exclusion, train.py:155).
    The learning rate is an injected hyperparameter: update it by setting
    ``opt_state.hyperparams['learning_rate']`` between epochs.
    """
    if kind == "adamw":
        base = optax.inject_hyperparams(optax.adamw)(
            learning_rate=learning_rate, weight_decay=weight_decay)
    elif kind == "adam":
        base = optax.inject_hyperparams(optax.adam)(
            learning_rate=learning_rate)
    else:
        raise ValueError(f"unknown optimizer {kind!r}")
    if freeze_mask is None:
        return base
    return optax.multi_transform(
        {"train": base, "freeze": optax.set_to_zero()},
        lambda params: jax.tree_util.tree_map(
            lambda frozen: "freeze" if frozen else "train",
            freeze_mask(params)),
    )


def set_learning_rate(opt_state, lr: float):
    """Write a new LR into an inject_hyperparams state (handles the
    multi_transform nesting used for freezing)."""
    def visit(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            s.hyperparams["learning_rate"] = jax.numpy.asarray(
                lr, jax.numpy.float32)
            return True
        return False

    if visit(opt_state):
        return opt_state
    # multi_transform: inner states live in .inner_states['train'].inner_state
    if hasattr(opt_state, "inner_states"):
        visit(opt_state.inner_states["train"].inner_state)
    return opt_state
