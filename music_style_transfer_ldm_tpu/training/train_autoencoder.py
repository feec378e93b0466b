"""Phase 1: autoencoder pretraining (ref: models/train.py:28-138).

TPU-first redesign of the reference loop: one jitted, donated train step
(forward + loss + grad + AdamW update + BN stat update fused into a single
device program), batches 'data'-sharded over the mesh, AdamW with
ReduceLROnPlateau, best-validation checkpointing via orbax.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from music_style_transfer_ldm_tpu.losses.basic import compression_loss
from music_style_transfer_ldm_tpu.losses.feature import build_feature_metric
from music_style_transfer_ldm_tpu.models.autoencoder import (
    SpectrogramDecoder, SpectrogramEncoder,
)
from music_style_transfer_ldm_tpu.parallel.mesh import make_mesh
from music_style_transfer_ldm_tpu.parallel.sharding import (
    batch_validity_weights, shard_batch, shard_params,
)
from music_style_transfer_ldm_tpu.training import checkpoint as ckpt_lib
from music_style_transfer_ldm_tpu.training.metrics import MetricLogger
from music_style_transfer_ldm_tpu.training.optim import (
    make_optimizer, plateau_init, plateau_update, set_learning_rate,
)
from music_style_transfer_ldm_tpu.training.state import (
    TrainState, as_unit_images, prefetch_to_device,
)


class AETrainer:
    """Encoder/decoder pretrainer (ref: train_autoencoder)."""

    def __init__(self, config, mesh=None, perceptual: bool = True,
                 feature_params=None):
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh(
            config.mesh.mesh_shape)
        cm = config.model
        self.encoder = SpectrogramEncoder(latent_dim=cm.latent_dim)
        self.decoder = SpectrogramDecoder(latent_dim=cm.latent_dim)
        # Perceptual metric per config (reference dispatcher semantics:
        # 'lpips' is the shipped default, ref: config.py:17, loss.py:24-30).
        self.feature = (build_feature_metric(
            config.train.compression_feature_extractor,
            params=feature_params) if perceptual else None)
        self.perceptual_weight = config.train.perceptual_weight
        self.kl_weight = config.train.kl_weight

        self.tx = make_optimizer("adamw",
                                 learning_rate=config.train.learning_rate)
        self.plateau = plateau_init(config.train.learning_rate,
                                    factor=config.train.lr_factor,
                                    patience=config.train.lr_patience,
                                    min_lr=config.train.lr_min)
        self._train_step = jax.jit(self._step, donate_argnums=(0,))
        self._val_step = jax.jit(self._eval)

    # ---------------- state ------------------------------------------------

    def init_state(self, seed: int = 0) -> TrainState:
        cm = self.config.model
        x = jnp.zeros((1, cm.image_size, cm.image_size, cm.in_channels))
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        ev = self.encoder.init(k1, x, train=False)
        dv = self.decoder.init(
            k2, jnp.zeros((1, cm.image_size // 8, cm.image_size // 8,
                           cm.latent_dim)), train=False)
        params = {"encoder": ev["params"], "decoder": dv["params"]}
        batch_stats = {"encoder": ev["batch_stats"],
                       "decoder": dv["batch_stats"]}
        if self.feature is not None:
            self.feature.init(seed=0, input_shape=tuple(x.shape))
        params = shard_params(params, self.mesh)
        batch_stats = shard_params(batch_stats, self.mesh)
        opt_state = self.tx.init(params)
        return TrainState(params=params, batch_stats=batch_stats,
                          opt_state=opt_state, step=jnp.zeros((), jnp.int32))

    # ---------------- jitted compute ---------------------------------------

    def _forward(self, params, batch_stats, x, train: bool, weights=None):
        mutable = ["batch_stats"] if train else False
        enc_out = self.encoder.apply(
            {"params": params["encoder"],
             "batch_stats": batch_stats["encoder"]},
            x, train=train, sample_weights=weights, mutable=mutable)
        z, enc_updates = enc_out if train else (enc_out, None)
        dec_out = self.decoder.apply(
            {"params": params["decoder"],
             "batch_stats": batch_stats["decoder"]},
            z, train=train, sample_weights=weights, mutable=mutable)
        recon, dec_updates = dec_out if train else (dec_out, None)
        new_stats = None
        if train:
            new_stats = {"encoder": enc_updates["batch_stats"],
                         "decoder": dec_updates["batch_stats"]}
        return z, recon, new_stats

    def _loss(self, params, batch_stats, x, feature_params, train: bool,
              weights=None):
        x = as_unit_images(x)
        z, recon, new_stats = self._forward(params, batch_stats, x, train,
                                            weights)
        # Decoder outputs [-1, 1]; inputs are [0, 1] — compare in [0, 1]
        # like the reference (it feeds tanh output straight to MSE against
        # [0,1] targets during AE training; we rescale for a well-posed
        # objective, noting the deviation from the reference quirk).
        recon01 = (recon + 1.0) / 2.0
        feature_loss = None
        if self.feature is not None:
            feature_loss = lambda a, b, w: self.feature.distance(
                feature_params, a, b, w)
        loss = compression_loss(x, recon01, z, feature_loss,
                                self.perceptual_weight, self.kl_weight,
                                weights=weights)
        return loss, new_stats

    def _step(self, state: TrainState, x, feature_params, weights=None):
        def loss_fn(params):
            return self._loss(params, state.batch_stats, x, feature_params,
                              train=True, weights=weights)
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params,
                                        updates)
        return TrainState(params=params, batch_stats=new_stats,
                          opt_state=opt_state, step=state.step + 1), loss

    def _eval(self, state: TrainState, x, feature_params, weights=None):
        loss, _ = self._loss(state.params, state.batch_stats, x,
                             feature_params, train=False, weights=weights)
        return loss

    # ---------------- epoch driver -----------------------------------------

    def train(self, train_loader, val_loader, num_epochs: Optional[int] = None,
              state: Optional[TrainState] = None,
              out_dir: str | Path = "runs/autoencoder",
              resume_from: Optional[str | Path] = None) -> TrainState:
        """Full training loop (ref: train.py:59-138).  resume_from restores
        a full train-state checkpoint (params + optimizer state + step) —
        a capability the reference lacks (save-only)."""
        num_epochs = num_epochs or self.config.train.num_epochs
        out_dir = Path(out_dir)
        state = state if state is not None else self.init_state(
            self.config.train.seed)
        start_epoch = 0
        if resume_from is not None:
            state = ckpt_lib.restore_train_state(resume_from, state)
            # Resume the epoch count from the restored optimizer step.
            start_epoch = int(state.step) // max(len(train_loader), 1)
        # Drop reloaded rows for epochs this run will replay (see
        # MetricLogger.truncate_from_epoch).
        logger = MetricLogger(out_dir / "metrics.csv",
                              resume=resume_from is not None,
                              truncate_from_epoch=start_epoch)
        vgg = self.feature.params if self.feature is not None else None
        best_val = float("inf")

        from music_style_transfer_ldm_tpu.utils.profiling import (
            StallWatchdog,
        )
        for epoch in range(start_epoch, num_epochs):
            t0 = time.time()
            with StallWatchdog(timeout_s=600, context=f"AE epoch {epoch}"):
                # Losses stay on device until epoch end (per-step float()
                # would stall the dispatch pipeline with a sync readback).
                n_data = self.mesh.shape["data"]

                def place(batch):
                    x = batch[0] if isinstance(batch, tuple) else batch
                    w = batch_validity_weights(len(x), n_data, self.mesh)
                    # Async device_put: placing batch i+1 while step i
                    # computes overlaps the host->device copy with compute
                    # (prefetch_to_device below).
                    return shard_batch(jnp.asarray(x), self.mesh), w

                train_losses = []
                for x, w in prefetch_to_device(train_loader, place):
                    state, loss = self._train_step(state, x, vgg, w)
                    train_losses.append(loss)
                val_losses = []
                for x, w in prefetch_to_device(val_loader, place):
                    val_losses.append(self._val_step(state, x, vgg, w))

                # One host fetch per epoch (a float() per loss would pay a
                # relay round trip each).
                train_loss = float(np.mean(jax.device_get(train_losses)))
                val_loss = float(np.mean(jax.device_get(val_losses)))

            self.plateau = plateau_update(self.plateau, val_loss)
            state = state.replace(opt_state=set_learning_rate(
                state.opt_state, self.plateau.lr))

            logger.log(epoch=epoch, train_loss=train_loss, val_loss=val_loss,
                       lr=self.plateau.lr, seconds=time.time() - t0)
            if val_loss < best_val:
                best_val = val_loss
                ckpt_lib.save_autoencoder(out_dir / "pretrained", state)
        logger.plot(out_dir / "autoencoder_loss.png",
                    ["train_loss", "val_loss"])
        ckpt_lib.save_autoencoder(out_dir / "pretrained_final", state)
        ckpt_lib.save_train_state(out_dir / "train_state_final", state)
        return state
