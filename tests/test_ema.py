"""EMA weight tracking (TrainConfig.ema_decay; no reference counterpart —
the reference trains and samples from the raw weights only,
ref: models/train.py:141-293).  Covers the update math (warm-up schedule),
trainer integration, checkpoint round-trip (including pre-EMA checkpoints),
and load_ldm's EMA preference on the inference surfaces."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from music_style_transfer_ldm_tpu.config import default_config
from music_style_transfer_ldm_tpu.models.ldm import load_ldm
from music_style_transfer_ldm_tpu.training import LDMTrainer
from music_style_transfer_ldm_tpu.training import checkpoint as ckpt_lib
from music_style_transfer_ldm_tpu.training.state import (
    TrainState, ema_update,
)


def tiny_config(ema_decay=0.999):
    cfg = default_config()
    cfg.train = dataclasses.replace(cfg.train, batch_size=4, num_epochs=2,
                                    compute_dtype="float32",
                                    ema_decay=ema_decay)
    cfg.model = dataclasses.replace(cfg.model, image_size=64)
    return cfg


def _batch(rng, batch=4):
    return jnp.asarray(rng.rand(batch, 64, 64, 1).astype(np.float32))


def test_ema_update_math():
    ema = {"w": jnp.ones((3,), jnp.float32)}
    params = {"w": jnp.zeros((3,), jnp.float32)}
    # Warm-up: at step 0 the effective decay is (1+0)/(10+0) = 0.1,
    # far below the configured 0.999 — the average must track quickly.
    out = ema_update(ema, params, 0.999, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, rtol=1e-6)
    # Far past warm-up the configured decay applies.
    out = ema_update(ema, params, 0.999, jnp.int32(100000))
    np.testing.assert_allclose(np.asarray(out["w"]), 0.999, rtol=1e-6)


def test_trainer_tracks_ema_and_differs_from_raw(rng):
    cfg = tiny_config()
    trainer = LDMTrainer(cfg, perceptual=False)
    state = trainer.init_state(0)
    assert state.ema_params is not None
    x, y = _batch(rng), _batch(rng)
    for i in range(2):
        state, _ = trainer._train_step(state, x, y, jax.random.PRNGKey(i),
                                       (None, None))
    # EMA lags the raw weights after updates...
    raw = jax.tree_util.tree_leaves(state.params["unet"])
    ema = jax.tree_util.tree_leaves(state.ema_params["unet"])
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(raw, ema))
    # ...but the frozen encoder stays equal in both (to rounding: the
    # d*e + (1-d)*p blend of two equal values is only ulp-exact).
    for a, b in zip(jax.tree_util.tree_leaves(state.params["encoder"]),
                    jax.tree_util.tree_leaves(state.ema_params["encoder"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_ema_disabled_keeps_state_none(rng):
    trainer = LDMTrainer(tiny_config(ema_decay=0.0), perceptual=False)
    state = trainer.init_state(0)
    assert state.ema_params is None
    state, _ = trainer._train_step(state, _batch(rng), _batch(rng),
                                   jax.random.PRNGKey(0), (None, None))
    assert state.ema_params is None


def test_checkpoint_roundtrip_with_ema(tmp_path, rng):
    cfg = tiny_config()
    trainer = LDMTrainer(cfg, perceptual=False)
    state = trainer.init_state(0)
    state, _ = trainer._train_step(state, _batch(rng), _batch(rng),
                                   jax.random.PRNGKey(0), (None, None))
    ckpt_lib.save_train_state(tmp_path / "ldm", state)

    template = trainer.init_state(1)
    restored = ckpt_lib.restore_train_state(tmp_path / "ldm", template)
    assert restored.ema_params is not None
    for a, b in zip(jax.tree_util.tree_leaves(state.ema_params),
                    jax.tree_util.tree_leaves(restored.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pre_ema_checkpoint_resumes_into_ema_trainer(tmp_path, rng):
    """A checkpoint written before EMA existed (no ema_params key) must
    restore into an EMA-enabled trainer, seeding the average from the
    restored raw weights."""
    plain = LDMTrainer(tiny_config(ema_decay=0.0), perceptual=False)
    state = plain.init_state(0)
    state, _ = plain._train_step(state, _batch(rng), _batch(rng),
                                 jax.random.PRNGKey(0), (None, None))
    ckpt_lib.save_train_state(tmp_path / "old", state)

    ema_trainer = LDMTrainer(tiny_config(), perceptual=False)
    template = ema_trainer.init_state(1)
    restored = ckpt_lib.restore_train_state(tmp_path / "old", template)
    assert restored.ema_params is not None
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(restored.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # And training continues, updating the seeded average.
    restored, _ = ema_trainer._train_step(
        restored, _batch(rng), _batch(rng), jax.random.PRNGKey(1),
        (None, None))
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(restored.params["unet"]),
                        jax.tree_util.tree_leaves(
                            restored.ema_params["unet"])))


def test_load_ldm_prefers_ema_weights(tmp_path, rng):
    """Inference surfaces (transfer/generate/serve/distill teacher) sample
    from the EMA weights when the checkpoint carries them; use_ema=False
    opts out (cli --raw-weights)."""
    cfg = tiny_config()
    trainer = LDMTrainer(cfg, perceptual=False)
    state = trainer.init_state(0)
    state, _ = trainer._train_step(state, _batch(rng), _batch(rng),
                                   jax.random.PRNGKey(0), (None, None))
    ckpt_lib.save_train_state(tmp_path / "ldm", state)

    _, v_ema = load_ldm(cfg, full_checkpoint=tmp_path / "ldm")
    _, v_raw = load_ldm(cfg, full_checkpoint=tmp_path / "ldm",
                        use_ema=False)
    for a, b in zip(jax.tree_util.tree_leaves(state.ema_params),
                    jax.tree_util.tree_leaves(v_ema["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(v_raw["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
