"""Phase 2: latent diffusion training (ref: models/train.py:141-316).

One jitted, donated device program per step: timestep sampling, q-sample,
UNet forward, all three losses, backward, Adam update, BN stat update.
The encoder is frozen (gradients zeroed via optax.multi_transform and BN
kept in eval mode), the decoder continues training — exactly the
reference's requires_grad/eval split (ref: models/model.py:340-347).

Mixed precision: model compute in bfloat16 (config.train.compute_dtype),
params and loss math in float32 — the TPU-native counterpart of the
reference's CUDA AMP + GradScaler (ref: train.py:157,174; bf16 needs no
loss scaling).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from music_style_transfer_ldm_tpu.losses.basic import (
    compression_loss, diffusion_loss, style_loss,
)
from music_style_transfer_ldm_tpu.losses.feature import build_feature_metric
from music_style_transfer_ldm_tpu.models.ldm import LDM
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
    TrainState, as_unit_images, ema_update, prefetch_to_device,
)


def _freeze_encoder_mask(params):
    """True (frozen) for every leaf under params['encoder']."""
    return {k: jax.tree_util.tree_map(lambda _: k == "encoder", v)
            for k, v in params.items()}


class LDMTrainer:
    """ref: models/train.py:141 LDMTrainer."""

    def __init__(self, config, mesh=None, perceptual: bool = True,
                 compression_feature_params=None, style_feature_params=None):
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh(
            config.mesh.mesh_shape)
        cm, cd, ct = config.model, config.diffusion, config.train
        compute_dtype = jnp.dtype(ct.compute_dtype)
        self.model = LDM(latent_dim=cm.latent_dim,
                         num_timesteps=cd.num_timesteps,
                         beta_start=cd.beta_start, beta_end=cd.beta_end,
                         unet_num_filters=cm.unet_num_filters,
                         style_num_filters=cm.style_num_filters,
                         dtype=compute_dtype)
        # Reference dispatcher semantics (ref: loss.py:24-30, config.py:17):
        # the compression perceptual term uses the configured extractor
        # (default 'lpips', gradients flow); the style term always uses
        # VGGish, whose reference implementation runs under no_grad — see
        # TrainConfig.style_loss_stop_gradient.
        self.compression_feature = (build_feature_metric(
            ct.compression_feature_extractor, dtype=compute_dtype,
            params=compression_feature_params) if perceptual else None)
        self.style_feature = (build_feature_metric(
            "vggish", dtype=compute_dtype,
            params=style_feature_params) if perceptual else None)
        self.style_loss_stop_gradient = ct.style_loss_stop_gradient
        self.style_loss_weight = ct.style_loss_weight
        self.perceptual_weight = ct.perceptual_weight
        self.kl_weight = ct.kl_weight

        self.ema_decay = float(getattr(ct, "ema_decay", 0.0))
        self.tx = make_optimizer("adam", learning_rate=ct.learning_rate,
                                 freeze_mask=_freeze_encoder_mask)
        self.plateau = plateau_init(ct.learning_rate, factor=0.5,
                                    patience=ct.ldm_lr_patience,
                                    min_lr=ct.lr_min)
        self._train_step = jax.jit(self._step, donate_argnums=(0,))

    # ---------------- state -------------------------------------------------

    def init_state(self, seed: int = 0,
                   pretrained_autoencoder: Optional[dict] = None
                   ) -> TrainState:
        """Initialize; optionally transplant phase-1 encoder/decoder weights
        (the reference's load-encoder/decoder-then-freeze path,
        ref: model.py:325-347)."""
        cm = self.config.model
        x = jnp.zeros((1, cm.image_size, cm.image_size, cm.in_channels))
        t = jnp.zeros((1,), jnp.int32)
        variables = self.model.init(
            {"params": jax.random.PRNGKey(seed),
             "diffusion": jax.random.PRNGKey(seed + 1)}, x, x, t)
        params = dict(variables["params"])
        batch_stats = dict(variables.get("batch_stats", {}))

        if pretrained_autoencoder is not None:
            ae_p = pretrained_autoencoder["params"]
            ae_s = pretrained_autoencoder["batch_stats"]
            params["encoder"] = jax.tree_util.tree_map(
                jnp.asarray, ae_p["encoder"])
            params["decoder"] = jax.tree_util.tree_map(
                jnp.asarray, ae_p["decoder"])
            batch_stats["encoder"] = jax.tree_util.tree_map(
                jnp.asarray, ae_s["encoder"])
            batch_stats["decoder"] = jax.tree_util.tree_map(
                jnp.asarray, ae_s["decoder"])

        if self.compression_feature is not None:
            self.compression_feature.init(seed=seed + 2,
                                          input_shape=tuple(x.shape))
        if self.style_feature is not None:
            self.style_feature.init(seed=seed + 3,
                                    input_shape=tuple(x.shape))

        params = shard_params(params, self.mesh)
        batch_stats = shard_params(batch_stats, self.mesh)
        opt_state = self.tx.init(params)
        # EMA starts equal to the init weights; the warm-up schedule in
        # ema_update keeps early steps from being anchored to them.
        ema = (jax.tree_util.tree_map(jnp.array, params)
               if self.ema_decay > 0.0 else None)
        return TrainState(params=params, batch_stats=batch_stats,
                          opt_state=opt_state, step=jnp.zeros((), jnp.int32),
                          ema_params=ema)

    # ---------------- jitted step -------------------------------------------

    def _losses(self, params, batch_stats, content, style, t, drng,
                feature_params, weights=None, style_drop_mask=None):
        content = as_unit_images(content)
        style = as_unit_images(style)
        out, updates = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            content, style, t, train=True, frozen_encoder=True,
            sample_weights=weights, style_drop_mask=style_drop_mask,
            rngs={"diffusion": drng}, mutable=["batch_stats"])

        comp_params, style_params = feature_params
        comp_feature = None
        if self.compression_feature is not None:
            comp_feature = lambda a, b, w: self.compression_feature.distance(
                comp_params, a, b, w)

        denoising = diffusion_loss(out["noise_pred"], out["noise"], weights)
        compression = compression_loss(content, out["reconstructed"],
                                       out["z_0"], comp_feature,
                                       self.perceptual_weight, self.kl_weight,
                                       weights=weights)
        if self.style_feature is not None:
            style_fn = lambda a, b, w: self.style_feature.distance(
                style_params, a, b, w)
            style_l = style_loss(out["reconstructed"], style, style_fn,
                                 weights)
            if self.style_loss_stop_gradient:
                # ref: loss.py:78 torch.no_grad — value logged, no gradient.
                style_l = jax.lax.stop_gradient(style_l)
        else:
            style_l = jnp.float32(0.0)
        total = (compression + denoising
                 + self.style_loss_weight * style_l)  # ref: train.py:186
        metrics = {"total_loss": total, "compression_loss": compression,
                   "denoising_loss": denoising, "style_loss": style_l}
        return total, (metrics, updates["batch_stats"])

    def _step(self, state: TrainState, content, style, key, feature_params,
              weights=None):
        tkey, dkey, skey = jax.random.split(key, 3)
        batch = content.shape[0]
        # t ~ Uniform{0..T-1} per element (ref: train.py:172).
        t = jax.random.randint(tkey, (batch,), 0,
                               self.config.diffusion.num_timesteps)
        # Classifier-free-guidance dropout: zero the style pyramid for a
        # random subset so the UNet also learns the unconditional branch.
        p_drop = float(getattr(self.config.train, "style_dropout", 0.0))
        drop = (jax.random.bernoulli(skey, p_drop, (batch,))
                .astype(jnp.float32) if p_drop > 0.0 else None)

        def loss_fn(params):
            return self._losses(params, state.batch_stats, content, style, t,
                                dkey, feature_params, weights,
                                style_drop_mask=drop)

        (_, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params,
                                        updates)
        ema = state.ema_params
        if self.ema_decay > 0.0 and ema is not None:
            ema = ema_update(ema, params, self.ema_decay, state.step)
        new_state = TrainState(params=params, batch_stats=new_stats,
                               opt_state=opt_state, step=state.step + 1,
                               ema_params=ema)
        return new_state, metrics

    def _feature_params(self):
        return (self.compression_feature.params
                if self.compression_feature is not None else None,
                self.style_feature.params
                if self.style_feature is not None else None)

    # ---------------- epoch driver ------------------------------------------

    def train_epoch(self, state: TrainState, loader, epoch: int,
                    base_key) -> tuple:
        # Metrics stay on device until epoch end: a float() per step would
        # force a synchronous host readback and stall the dispatch pipeline
        # (measured 74 ms/step sync vs fully-pipelined dispatch without).
        collected = []
        n_data = self.mesh.shape["data"]
        sp = bool(getattr(self.config.mesh, "sequence_parallel", False))

        def place(batch):
            (content, _), (style, _) = batch
            # Validity weights mask out rows the data-parallel padder adds
            # to a partial tail batch — both in the losses (weighted-mean
            # renormalization) and in BatchNorm statistics.
            weights = batch_validity_weights(len(content), n_data, self.mesh)
            return (shard_batch(jnp.asarray(content), self.mesh,
                                sequence_parallel=sp),
                    shard_batch(jnp.asarray(style), self.mesh,
                                sequence_parallel=sp), weights)

        # prefetch_to_device: the next batch's (async) host->device copy
        # overlaps the current step's compute — first-order win when the
        # chip is reached through a network relay.
        for i, (content, style, weights) in enumerate(
                prefetch_to_device(loader, place)):
            key = jax.random.fold_in(base_key, epoch * 100000 + i)
            state, metrics = self._train_step(state, content, style, key,
                                              self._feature_params(), weights)
            collected.append(metrics)
        n = len(collected)
        # ONE host fetch for the whole epoch's metrics: each float() is a
        # full relay round trip, so per-step (or even per-metric) readback
        # costs seconds per epoch through the tunnel.
        collected = jax.device_get(collected)
        sums: dict = {}
        for metrics in collected:
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        avgs = {k: v / max(n, 1) for k, v in sums.items()}
        return state, avgs

    def train(self, train_loader, num_epochs: Optional[int] = None,
              state: Optional[TrainState] = None,
              pretrained_autoencoder: Optional[dict] = None,
              out_dir: str | Path = "runs/ldm",
              resume_from: Optional[str | Path] = None) -> TrainState:
        """Full loop (ref: train.py:246-293): plateau LR on train loss,
        checkpoints + linear/log plots every config ckpt interval.
        resume_from restarts from a full train-state checkpoint (params +
        optimizer state + step) — a capability the reference lacks
        (save-only, SURVEY.md section 5)."""
        cfg = self.config.train
        num_epochs = num_epochs or cfg.num_epochs
        out_dir = Path(out_dir)
        if state is None:
            state = self.init_state(cfg.seed, pretrained_autoencoder)
        start_epoch = 0
        if resume_from is not None:
            state = ckpt_lib.restore_train_state(resume_from, state)
            # Continue the epoch count from the restored optimizer step so
            # epoch numbering, checkpoint cadence, and the total epoch
            # budget line up across restarts (relay-stall recovery).
            start_epoch = int(state.step) // max(len(train_loader), 1)
        # truncate_from_epoch: rows the previous process logged past the
        # restored checkpoint will be re-run — drop them so each epoch
        # appears once in the CSV/plots.
        logger = MetricLogger(out_dir / "metrics.csv",
                              resume=resume_from is not None,
                              truncate_from_epoch=start_epoch)
        base_key = jax.random.PRNGKey(cfg.seed + 123)

        from music_style_transfer_ldm_tpu.utils.profiling import (
            StallWatchdog,
        )
        for epoch in range(start_epoch, num_epochs):
            t0 = time.time()
            with StallWatchdog(timeout_s=600,
                               context=f"LDM epoch {epoch} "
                                       f"(ckpts under {out_dir})"):
                state, avgs = self.train_epoch(state, train_loader, epoch,
                                               base_key)
            self.plateau = plateau_update(self.plateau, avgs["total_loss"])
            state = state.replace(opt_state=set_learning_rate(
                state.opt_state, self.plateau.lr))
            logger.log(epoch=epoch, lr=self.plateau.lr,
                       seconds=time.time() - t0, **avgs)

            if epoch % cfg.ckpt_every_epochs == 0:
                ckpt_lib.save_train_state(out_dir / f"ldm_{epoch}", state)
                keys = ["total_loss", "compression_loss", "denoising_loss",
                        "style_loss"]
                logger.plot(out_dir / f"ldm_loss_{epoch}.png", keys)
                logger.plot(out_dir / f"ldm_loss_log_{epoch}.png", keys,
                            logscale=True)
        ckpt_lib.save_train_state(out_dir / "ldm_final", state)
        return state
