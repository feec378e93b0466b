"""Orbax checkpointing.

Improves on the reference, which torch.saves weights only (no optimizer
state, no resume; ref: models/train.py:111-114,270-272): here full train
state (params + BN stats + optimizer state + step) is saved, plus
component-wise autoencoder checkpoints so phase 2 can load-and-freeze the
pretrained encoder/decoder exactly like the reference's
encoder.pth/decoder.pth path (ref: models/model.py:325-347).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from music_style_transfer_ldm_tpu.training.state import TrainState

# Checkpoint format history:
#   1 (implicit, pre-versioning): UNet k3 transpose convs used SAME padding
#     (one-pixel shift vs torch geometry).
#   2: UNet k3 transpose convs are VALID+crop (bit-exact torch geometry,
#     interop-compatible). Same parameter shapes — only numerics differ.
FORMAT_VERSION = 2


def _check_version(payload: dict, path) -> None:
    v = payload.get("format_version")
    v = int(np.asarray(v)) if v is not None else 1
    if v < FORMAT_VERSION:
        print(f"WARNING: checkpoint {path} has format v{v} < "
              f"v{FORMAT_VERSION}: it was trained with the pre-interop UNet "
              "deconv geometry (SAME padding); restored weights will produce "
              "slightly shifted UNet decoder outputs. Re-train or fine-tune "
              "for exact behavior.", flush=True)


def _to_host(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def _checkpoint_has_key(path: str | Path, key: str) -> Optional[bool]:
    """Whether the saved pytree's top level contains `key`.

    Asks orbax for the checkpoint's structure metadata (cheap: no array
    reads). Returns None when the metadata shape is unrecognized (orbax
    version drift), so the caller can fall back rather than guess.
    """
    path = Path(path).absolute()
    try:
        meta = ocp.PyTreeCheckpointer().metadata(path)
        # Current orbax: StepMetadata -> item_metadata (TreeMetadata) ->
        # .tree dict; older versions returned the dict directly.
        tree = getattr(getattr(meta, "item_metadata", None), "tree", None)
        if tree is None:
            tree = meta
        if hasattr(tree, "keys"):
            return key in tree.keys()
    except Exception:  # noqa: BLE001 — metadata shape varies across orbax
        pass
    return None


def save_pytree(path: str | Path, tree: Any) -> None:
    path = Path(path).absolute()
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, _to_host(tree), force=True)


def restore_pytree(path: str | Path, target: Optional[Any] = None) -> Any:
    path = Path(path).absolute()
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        return ckptr.restore(path, item=_to_host(target))
    return ckptr.restore(path)


# ---------------- autoencoder components (phase-1 -> phase-2 handoff) -----


def save_autoencoder(path: str | Path, state: TrainState) -> None:
    """Persist encoder+decoder params and BN stats (the phase-2 inputs)."""
    save_pytree(path, {"params": state.params,
                       "batch_stats": state.batch_stats,
                       "format_version": np.asarray(FORMAT_VERSION)})


def load_autoencoder(path: str | Path) -> dict:
    """-> {'params': {'encoder':…, 'decoder':…},
           'batch_stats': {'encoder':…, 'decoder':…}}"""
    payload = restore_pytree(path)
    _check_version(payload, path)
    return payload


# ---------------- full train-state checkpoints ----------------------------


def save_train_state(path: str | Path, state: TrainState,
                     extra: Optional[dict] = None) -> None:
    payload = {"params": state.params, "batch_stats": state.batch_stats,
               "opt_state": state.opt_state,
               "step": np.asarray(state.step),
               "format_version": np.asarray(FORMAT_VERSION)}
    if state.ema_params is not None:
        payload["ema_params"] = state.ema_params
    if extra:
        payload["extra"] = extra
    save_pytree(path, payload)


def restore_train_state(path: str | Path,
                        template: TrainState) -> TrainState:
    item = {"params": template.params, "batch_stats": template.batch_stats,
            "opt_state": template.opt_state, "step": np.asarray(template.step),
            "format_version": np.asarray(FORMAT_VERSION)}
    ema = template.ema_params
    if ema is not None:
        has_ema = _checkpoint_has_key(path, "ema_params")
        if has_ema:
            # The checkpoint saved an EMA; any restore failure here is a
            # real error (I/O, structure drift) and must propagate rather
            # than silently dropping the saved average.
            payload = restore_pytree(path, {**item, "ema_params": ema})
        elif has_ema is False:
            # Pre-EMA checkpoint: resume the average from the restored raw
            # weights (warm-up schedule in state.ema_update re-converges it
            # quickly).
            print(f"NOTE: checkpoint {path} has no ema_params; seeding the "
                  "EMA from the restored raw weights.", flush=True)
            payload = restore_pytree(path, item)
            payload["ema_params"] = jax.tree_util.tree_map(
                np.asarray, payload["params"])
        else:
            # Metadata inconclusive (orbax version drift): try the
            # EMA-inclusive restore, fall back loudly.
            try:
                payload = restore_pytree(path, {**item, "ema_params": ema})
            except Exception as e:  # noqa: BLE001
                print(f"WARNING: EMA-inclusive restore of {path} failed "
                      f"({e!r}); treating it as a pre-EMA checkpoint and "
                      "seeding the EMA from the raw weights.", flush=True)
                payload = restore_pytree(path, item)
                payload["ema_params"] = jax.tree_util.tree_map(
                    np.asarray, payload["params"])
    else:
        payload = restore_pytree(path, item)
    _check_version(payload, path)
    return TrainState(params=payload["params"],
                      batch_stats=payload["batch_stats"],
                      opt_state=payload["opt_state"],
                      step=jax.numpy.asarray(payload["step"]),
                      ema_params=payload.get("ema_params"))
