"""End-to-end training smoke tests on the virtual 8-device CPU mesh:
loss decreases, the frozen encoder stays frozen, checkpoints round-trip,
and the plateau LR controller matches torch ReduceLROnPlateau semantics."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_style_transfer_ldm_tpu.config import default_config
from music_style_transfer_ldm_tpu.parallel import make_mesh
from music_style_transfer_ldm_tpu.training import (
    AETrainer, LDMTrainer, plateau_init, plateau_update,
)
from music_style_transfer_ldm_tpu.training import checkpoint as ckpt_lib


def tiny_config():
    """Small geometry: ConvTranspose gradients are pathologically slow on
    CPU XLA at 128x128 (TPU is fine); 64x64 keeps tests snappy without
    changing any code path."""
    cfg = default_config()
    cfg.train = dataclasses.replace(cfg.train, batch_size=4, num_epochs=2,
                                    compute_dtype="float32")
    cfg.model = dataclasses.replace(cfg.model, image_size=64)
    return cfg


def synth_batches(rng, n_batches=3, batch=4):
    return [rng.rand(batch, 64, 64, 1).astype(np.float32)
            for _ in range(n_batches)]


def test_plateau_controller_torch_semantics():
    s = plateau_init(1.0, factor=0.5, patience=2, min_lr=0.1)
    # improving metrics: lr unchanged
    for m in [5.0, 4.0, 3.0]:
        s = plateau_update(s, m)
    assert s.lr == 1.0
    # patience+1 bad epochs halve the lr
    for m in [3.0, 3.0, 3.0]:
        s = plateau_update(s, m)
    assert s.lr == 0.5
    # min_lr clamp
    for _ in range(20):
        s = plateau_update(s, 99.0)
    assert s.lr == pytest.approx(0.1)


def test_ae_trainer_loss_decreases(rng):
    cfg = tiny_config()
    mesh = make_mesh((-1, 1))
    trainer = AETrainer(cfg, mesh=mesh, perceptual=False)
    state = trainer.init_state(0)
    x = jnp.asarray(synth_batches(rng, 1)[0])
    losses = []
    for _ in range(8):
        state, loss = trainer._train_step(state, x, None)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_ae_trainer_val_deterministic(rng):
    cfg = tiny_config()
    trainer = AETrainer(cfg, perceptual=False)
    state = trainer.init_state(0)
    x = jnp.asarray(synth_batches(rng, 1)[0])
    v1 = float(trainer._val_step(state, x, None))
    v2 = float(trainer._val_step(state, x, None))
    assert v1 == v2


def test_ldm_trainer_step_freezes_encoder(rng):
    cfg = tiny_config()
    trainer = LDMTrainer(cfg, perceptual=False)
    state = trainer.init_state(0)
    enc_before = jax.tree_util.tree_map(np.asarray,
                                        state.params["encoder"])
    unet_before = jax.tree_util.tree_map(np.asarray, state.params["unet"])
    content = jnp.asarray(synth_batches(rng, 1)[0])
    style = jnp.asarray(synth_batches(rng, 1)[0])
    state, metrics = trainer._train_step(state, content, style,
                                         jax.random.PRNGKey(0), (None, None))
    assert np.isfinite(float(metrics["total_loss"]))
    # encoder untouched
    for a, b in zip(jax.tree_util.tree_leaves(enc_before),
                    jax.tree_util.tree_leaves(state.params["encoder"])):
        np.testing.assert_array_equal(a, np.asarray(b))
    # unet updated
    changed = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(unet_before),
                        jax.tree_util.tree_leaves(state.params["unet"])))
    assert changed


def test_ldm_metrics_keys(rng):
    cfg = tiny_config()
    trainer = LDMTrainer(cfg, perceptual=False)
    state = trainer.init_state(0)
    x = jnp.asarray(synth_batches(rng, 1)[0])
    _, metrics = trainer._train_step(state, x, x, jax.random.PRNGKey(1),
                                     (None, None))
    assert set(metrics) == {"total_loss", "compression_loss",
                            "denoising_loss", "style_loss"}


def test_checkpoint_roundtrip(tmp_path, rng):
    cfg = tiny_config()
    trainer = AETrainer(cfg, perceptual=False)
    state = trainer.init_state(0)
    x = jnp.asarray(synth_batches(rng, 1)[0])
    state, _ = trainer._train_step(state, x, None)

    ckpt_lib.save_autoencoder(tmp_path / "ae", state)
    loaded = ckpt_lib.load_autoencoder(tmp_path / "ae")
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(loaded["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ae_to_ldm_weight_transplant(tmp_path, rng):
    cfg = tiny_config()
    ae = AETrainer(cfg, perceptual=False)
    ae_state = ae.init_state(0)
    x = jnp.asarray(synth_batches(rng, 1)[0])
    ae_state, _ = ae._train_step(ae_state, x, None)
    ckpt_lib.save_autoencoder(tmp_path / "ae", ae_state)

    ldm = LDMTrainer(cfg, perceptual=False)
    pre = ckpt_lib.load_autoencoder(tmp_path / "ae")
    state = ldm.init_state(0, pretrained_autoencoder=pre)
    for a, b in zip(jax.tree_util.tree_leaves(ae_state.params["encoder"]),
                    jax.tree_util.tree_leaves(state.params["encoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_data_parallel_step_multi_device(rng):
    """The jitted step runs sharded over all 8 virtual devices."""
    cfg = tiny_config()
    mesh = make_mesh((8, 1))
    trainer = AETrainer(cfg, mesh=mesh, perceptual=False)
    state = trainer.init_state(0)
    from music_style_transfer_ldm_tpu.parallel import shard_batch
    x = shard_batch(jnp.asarray(rng.rand(16, 64, 64, 1), jnp.float32),
                    mesh)
    assert len(x.sharding.device_set) == 8
    state, loss = trainer._train_step(state, x, None)
    assert np.isfinite(float(loss))


def test_tensor_parallel_step_multi_device(rng):
    """(2 data, 4 model) mesh: wide channel dims shard over 'model'."""
    cfg = tiny_config()
    mesh = make_mesh((2, 4))
    trainer = AETrainer(cfg, mesh=mesh, perceptual=False)
    state = trainer.init_state(0)
    # conv2 kernel cout=128 >= 128 and divisible by 4 -> sharded
    k = state.params["encoder"]["conv2"]["kernel"]
    assert len(k.sharding.device_set) == 8
    from music_style_transfer_ldm_tpu.parallel import shard_batch
    x = shard_batch(jnp.asarray(rng.rand(8, 64, 64, 1), jnp.float32), mesh)
    state, loss = trainer._train_step(state, x, None)
    assert np.isfinite(float(loss))


def test_full_train_drivers_and_resume(tmp_path, rng):
    """The complete train() epoch drivers (watchdog, metric deferral,
    checkpointing, plateau LR) and resume_from, end to end on tiny data."""
    cfg = tiny_config()

    class DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return rng.rand(64, 64, 1).astype(np.float32), 0

    class PairDS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return ((rng.rand(64, 64, 1).astype(np.float32), "a"),
                    (rng.rand(64, 64, 1).astype(np.float32), "b"))

    from music_style_transfer_ldm_tpu.datasets import BatchLoader
    ae = AETrainer(cfg, perceptual=False)
    ae.train(BatchLoader(DS(), 4, shuffle=False),
             BatchLoader(DS(), 4, shuffle=False), num_epochs=2,
             out_dir=tmp_path / "ae")
    assert (tmp_path / "ae" / "pretrained").exists()
    assert (tmp_path / "ae" / "metrics.csv").exists()

    ldm = LDMTrainer(cfg, perceptual=False)
    pre = ckpt_lib.load_autoencoder(tmp_path / "ae" / "pretrained")
    ldm.train(BatchLoader(PairDS(), 4, shuffle=False), num_epochs=1,
              pretrained_autoencoder=pre, out_dir=tmp_path / "ldm")
    assert (tmp_path / "ldm" / "ldm_final").exists()

    # resume from the final state (exercises format_version round-trip);
    # the epoch counter continues from the restored step (1 epoch x 2
    # steps done -> resume starts at epoch 1 of 3, running 2 more).
    ldm2 = LDMTrainer(cfg, perceptual=False)
    state2 = ldm2.train(BatchLoader(PairDS(), 4, shuffle=False),
                        num_epochs=3, pretrained_autoencoder=pre,
                        out_dir=tmp_path / "ldm2",
                        resume_from=tmp_path / "ldm" / "ldm_final")
    assert int(state2.step) == 6  # 2 steps/epoch x 3 epochs total
    # resuming into an already-met epoch budget is a no-op
    ldm3 = LDMTrainer(cfg, perceptual=False)
    state3 = ldm3.train(BatchLoader(PairDS(), 4, shuffle=False),
                        num_epochs=1, pretrained_autoencoder=pre,
                        out_dir=tmp_path / "ldm3",
                        resume_from=tmp_path / "ldm" / "ldm_final")
    assert int(state3.step) == 2


def test_metric_logger_resume_truncates_replayed_epochs(tmp_path):
    """Checkpoint restarts replay epochs past the restored step; the
    resumed logger must drop the stale rows so each epoch appears once,
    and must widen the header instead of crashing when a newer version
    logs an extra metric key."""
    from music_style_transfer_ldm_tpu.training.metrics import MetricLogger

    path = tmp_path / "metrics.csv"
    first = MetricLogger(path)
    for e in range(6):
        first.log(epoch=e, loss=float(10 - e))

    # Restart from the epoch-3 checkpoint: epochs 3..5 will be replayed.
    resumed = MetricLogger(path, resume=True, truncate_from_epoch=3)
    assert [r["epoch"] for r in resumed.rows] == [0.0, 1.0, 2.0]
    resumed.log(epoch=3, loss=6.5, lr=1e-4)  # new key 'lr' -> widen header
    resumed.log(epoch=4, loss=6.0, lr=1e-4)

    reread = MetricLogger(path, resume=True)
    assert [r["epoch"] for r in reread.rows] == [0.0, 1.0, 2.0, 3.0, 4.0]
    assert reread.rows[-1]["lr"] == 1e-4
    assert reread.rows[0]["lr"] == ""  # old rows: empty cell, not a crash
