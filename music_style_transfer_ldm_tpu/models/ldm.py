"""The composite latent diffusion model and its sampling wrappers.

Re-implements the reference LDM (ref: models/model.py:249-559):
encoder + decoder + UNet + style encoder + noise schedule, the training
forward pass, and the two DDIM wrappers (style-conditioned generation and
SDEdit-style content+style transfer).

Differences from the reference, by design:
* weight loading is explicit and side-effect-free (training code composes
  checkpoints; no hidden re-instantiation — the reference re-inits its UNet
  after loading, model.py:350-352);
* the samplers are fused ``lax.scan`` trajectories (diffusion/ddim.py)
  instead of Python loops, so a full 50-step sample is one device program.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from music_style_transfer_ldm_tpu.diffusion.ddim import (
    ddim_sample, generation_time_grid, transfer_time_grid,
)
from music_style_transfer_ldm_tpu.diffusion.schedule import DiffusionSchedule
from music_style_transfer_ldm_tpu.models.autoencoder import (
    SpectrogramDecoder, SpectrogramEncoder,
)
from music_style_transfer_ldm_tpu.models.style_encoder import StyleEncoder
from music_style_transfer_ldm_tpu.models.unet import UNet

Dtype = Any


class LDM(nn.Module):
    """Composite model (ref: model.py:249-379)."""

    latent_dim: int = 32
    num_timesteps: int = 200
    beta_start: float = 1e-4
    beta_end: float = 0.02
    unet_num_filters: int = 64
    style_num_filters: int = 64
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        dt, pt = self.dtype, self.param_dtype
        self.encoder = SpectrogramEncoder(self.latent_dim, dtype=dt,
                                          param_dtype=pt)
        self.decoder = SpectrogramDecoder(self.latent_dim, dtype=dt,
                                          param_dtype=pt)
        self.unet = UNet(in_channels=self.latent_dim,
                         out_channels=self.latent_dim,
                         num_filters=self.unet_num_filters, dtype=dt,
                         param_dtype=pt)
        self.style_encoder = StyleEncoder(self.style_num_filters, dtype=dt,
                                          param_dtype=pt)

    @property
    def schedule(self) -> DiffusionSchedule:
        # Rebuilt from static config; XLA constant-folds the tables.
        return DiffusionSchedule.create(self.num_timesteps, self.beta_start,
                                        self.beta_end)

    # ---- component entry points (usable via nn.apply method=...) --------

    def encode(self, x: jax.Array, train: bool = False) -> jax.Array:
        return self.encoder(x, train=train)

    def decode(self, z: jax.Array, train: bool = False) -> jax.Array:
        return self.decoder(z, train=train)

    def style_embed(self, style: jax.Array) -> Dict[str, jax.Array]:
        return self.style_encoder(style)

    def denoise(self, z_t: jax.Array, t: jax.Array,
                style_embedding: Dict[str, jax.Array]) -> jax.Array:
        return self.unet(z_t, t, style_embedding)

    # ---- training forward (ref: model.py:355-379) ------------------------

    def __call__(self, x: jax.Array, style: jax.Array, t: jax.Array,
                 train: bool = False,
                 frozen_encoder: bool = False,
                 sample_weights: Optional[jax.Array] = None,
                 style_drop_mask: Optional[jax.Array] = None
                 ) -> Dict[str, jax.Array]:
        """Returns {z_t, noise, noise_pred, z_0, reconstructed}.

        Noise is drawn from the 'diffusion' RNG stream.  frozen_encoder=True
        keeps the encoder in eval mode (running BN stats) during LDM
        training, matching the reference's encoder.eval()/decoder.train()
        split (ref: model.py:346-347).  sample_weights is an optional [B]
        validity vector excluding data-parallel pad rows from train-mode
        batch statistics (see parallel/sharding.py).

        style_drop_mask is an optional [B] vector (1 = drop) that zeroes
        the style-embedding pyramid for the masked samples — classifier-
        free-guidance training (Ho & Salimans 2022): the UNet learns an
        unconditional prediction alongside the conditional one, enabling
        a continuous style-strength knob at sampling time (``guidance=``
        in content_style_transfer).  No reference counterpart.
        """
        sched = self.schedule
        x = x.astype(jnp.float32)
        style = style.astype(jnp.float32)

        z_0 = self.encoder(x, train=train and not frozen_encoder,
                           sample_weights=sample_weights)
        style_embedding = self.style_encoder(style)
        if style_drop_mask is not None:
            keep = (1.0 - style_drop_mask.astype(jnp.float32)
                    ).reshape((-1, 1, 1, 1))
            style_embedding = jax.tree_util.tree_map(
                lambda e: e * keep.astype(e.dtype), style_embedding)
        key = self.make_rng("diffusion")
        z_t, noise = sched.q_sample(key, z_0.astype(jnp.float32), t)
        noise_pred = self.unet(z_t, t, style_embedding)
        z_0_pred = sched.predict_start_from_noise(
            z_t, t, noise_pred.astype(jnp.float32))
        reconstructed = self.decoder(z_0_pred, train=train,
                                     sample_weights=sample_weights)
        reconstructed = (reconstructed.astype(jnp.float32) + 1.0) / 2.0
        return {
            "z_t": z_t,
            "noise": noise,
            "noise_pred": noise_pred,
            "z_0": z_0,
            "reconstructed": reconstructed,
        }


# ---------------- sampling wrappers (pure functions over variables) -------
#
# The jitted implementations take `model` as a static argument: linen
# modules are frozen/hashable, so each (model, steps, eta, return_logs)
# combination compiles exactly once and is reused across calls — building
# a fresh denoise closure per call would defeat jax's jit cache.


def _denoise_fn(model: LDM, variables, style_embedding,
                guidance: float = 1.0):
    """Bind params + style embedding into an (x, t[B]) -> eps predictor.

    guidance != 1.0 applies classifier-free guidance (Ho & Salimans
    2022): eps = eps_uncond + g * (eps_cond - eps_uncond), with the
    unconditional branch a zeroed style pyramid (exactly what
    ``style_drop_mask`` zeroes during training).  The two branches run as
    ONE UNet call on a 2B batch — on TPU that keeps every conv a single
    larger MXU matmul instead of two kernel launches.  g=0 is fully
    unconditional, g=1 conditional (and takes the single-branch fast
    path), g>1 amplifies the style.
    """
    if guidance == 1.0:
        def fn(x, t):
            return model.apply(variables, x, t, style_embedding,
                               method=LDM.denoise).astype(jnp.float32)
        return fn

    null_embedding = jax.tree_util.tree_map(jnp.zeros_like, style_embedding)

    def fn(x, t):
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        emb2 = jax.tree_util.tree_map(
            lambda c, u: jnp.concatenate([c, u], axis=0),
            style_embedding, null_embedding)
        eps2 = model.apply(variables, x2, t2, emb2,
                           method=LDM.denoise).astype(jnp.float32)
        eps_c, eps_u = jnp.split(eps2, 2, axis=0)
        return eps_u + guidance * (eps_c - eps_u)
    return fn


def _run_sampler(sampler: str, denoise_fn, sched, z_t, times, eta,
                 return_logs):
    """'ddim' (reference parity, eta-capable) or 'dpm++'
    (DPM-Solver++(2M), deterministic, ~2x fewer steps at equal ODE
    accuracy, diffusion/dpm.py)."""
    if sampler == "ddim":
        return ddim_sample(denoise_fn, sched, z_t, times, eta=eta,
                           return_logs=return_logs)
    if sampler == "dpm++":
        if eta:
            raise ValueError("dpm++ is deterministic; eta must be 0")
        from music_style_transfer_ldm_tpu.diffusion.dpm import (
            dpm_solver_pp_2m,
        )
        return dpm_solver_pp_2m(denoise_fn, sched, z_t, times,
                                return_logs=return_logs)
    raise ValueError(f"unknown sampler {sampler!r}")


@functools.partial(jax.jit,
                   static_argnames=("model", "timesteps", "eta",
                                    "return_logs", "z_shape", "sampler",
                                    "guidance"))
def _style_sample_impl(model: LDM, variables, key, z_shape, style_spec,
                       timesteps, eta, return_logs, sampler="ddim",
                       guidance=1.0, latent_stats=None):
    sched = model.schedule
    eps = jax.random.normal(key, z_shape, jnp.float32)
    if latent_stats is not None:
        # Moment-matched z_T: with T=200 linear betas, alpha_bar[T-1] is
        # ~0.134, so sqrt(alpha_bar) ~ 0.37 of the SIGNAL survives at the
        # end of the schedule — the denoiser was trained on
        # q(z_T|z_0) = sqrt(ab) z_0 + sqrt(1-ab) eps, never on pure
        # N(0, I).  Generation therefore starts off-prior unless z_T is
        # drawn from the true marginal: with per-channel corpus latent
        # moments (mu, sigma), q(z_T) = N(sqrt(ab) mu, ab sigma^2 + 1-ab).
        # (The reference inherits the same mismatch, ref: model.py:394.)
        mu, sigma = latent_stats
        ab = sched.alpha_bars[model.num_timesteps - 1]
        z_t = (jnp.sqrt(ab) * mu
               + jnp.sqrt(ab * sigma * sigma + (1.0 - ab)) * eps)
    else:
        z_t = eps
    style_embedding = model.apply(variables, style_spec,
                                  method=LDM.style_embed)
    times = generation_time_grid(model.num_timesteps, timesteps)
    sampled, logs = _run_sampler(
        sampler, _denoise_fn(model, variables, style_embedding, guidance),
        sched, z_t, times, eta, return_logs)
    decoded = model.apply(variables, sampled, method=LDM.decode)
    decoded = (decoded.astype(jnp.float32) + 1.0) / 2.0
    return decoded, logs


def corpus_latent_stats(model: LDM, variables, images,
                        batch: int = 64) -> Tuple[jax.Array, jax.Array]:
    """Per-channel (mu, sigma) of the encoder's latent distribution over a
    corpus of [N, H, W, 1] images in [0, 1] — the inputs moment-matched
    generation needs (see _style_sample_impl latent_stats).  Tiny host
    artifact: two [latent_dim] vectors."""
    import numpy as np
    zs = []
    enc = jax.jit(lambda x: model.apply(variables, x, method=LDM.encode))
    for s in range(0, len(images), batch):
        zs.append(np.asarray(enc(jnp.asarray(images[s:s + batch],
                                             jnp.float32))))
    z = np.concatenate(zs).astype(np.float64)
    mu = z.mean(axis=(0, 1, 2))
    sigma = z.std(axis=(0, 1, 2))
    return jnp.asarray(mu, jnp.float32), jnp.asarray(sigma, jnp.float32)


def style_ddim_sample(model: LDM, variables, key: jax.Array,
                      z_shape: Tuple[int, ...], style_spec: jax.Array,
                      timesteps: int = 100, eta: float = 0.0,
                      return_logs: bool = False,
                      sampler: str = "ddim",
                      guidance: float = 1.0,
                      latent_stats=None
                      ) -> Tuple[jax.Array, Optional[dict]]:
    """Style-conditioned generation from pure noise
    (ref: model.py:382-407 style_ddim_sample_wrapper).

    Returns decoded spectrogram images in [0, 1] (NHWC).
    sampler='dpm++' runs DPM-Solver++(2M) on the same grid.
    guidance != 1 applies classifier-free style guidance (needs a model
    trained/finetuned with style_dropout > 0; see _denoise_fn).
    latent_stats=(mu, sigma) [latent_dim] switches z_T from N(0, I) to the
    schedule's true marginal q(z_T) under those corpus latent moments
    (corpus_latent_stats) — see _style_sample_impl for why N(0, I) is
    off-prior at T=200.
    """
    return _style_sample_impl(model, variables, key, tuple(z_shape),
                              style_spec.astype(jnp.float32), timesteps,
                              float(eta), return_logs, sampler,
                              float(guidance), latent_stats)


@functools.partial(jax.jit,
                   static_argnames=("model", "num_timesteps", "eta",
                                    "return_logs", "sampler", "steps",
                                    "guidance"))
def _transfer_impl(model: LDM, variables, key, content_spec, style_spec,
                   num_timesteps, eta, return_logs, sampler="ddim",
                   steps=None, guidance=1.0):
    sched = model.schedule
    z_0 = model.apply(variables, content_spec.astype(jnp.float32),
                      method=LDM.encode).astype(jnp.float32)
    batch = content_spec.shape[0]
    t = jnp.full((batch,), num_timesteps - 1, jnp.int32)
    if key.ndim > 1:
        # Per-item keys: each request's noise depends only on its own key,
        # so results are reproducible regardless of microbatch composition.
        eps = jax.vmap(
            lambda k, z: jax.random.normal(k, z.shape, jnp.float32))(key, z_0)
        z_t = sched.q_sample_with_noise(z_0, t, eps)
    else:
        z_t, _ = sched.q_sample(key, z_0, t)

    style_embedding = model.apply(variables, style_spec.astype(jnp.float32),
                                  method=LDM.style_embed)
    times = transfer_time_grid(num_timesteps, steps)
    sampled, logs = _run_sampler(
        sampler, _denoise_fn(model, variables, style_embedding, guidance),
        sched, z_t, times, eta, return_logs)

    decoded = model.apply(variables, sampled, method=LDM.decode)
    decoded = (decoded.astype(jnp.float32) + 1.0) / 2.0
    z_t_decoded = model.apply(variables, z_t, method=LDM.decode)
    return decoded, z_t_decoded, logs


def content_style_transfer(model: LDM, variables, key: jax.Array,
                           content_spec: jax.Array, style_spec: jax.Array,
                           num_timesteps: int = 100, eta: float = 0.0,
                           return_logs: bool = False,
                           sampler: str = "ddim",
                           steps: Optional[int] = None,
                           guidance: float = 1.0
                           ) -> Tuple[jax.Array, jax.Array, Optional[dict]]:
    """SDEdit-style content+style transfer — the product path
    (ref: model.py:468-501 content_style_transfer_wrapper).

    Encodes content, partially noises it to t = num_timesteps - 1, then
    denoises over a unit-step grid conditioned on the style embedding.
    ``key`` may be a single PRNG key or a batch of per-item keys [B, 2]
    (microbatch-stable reproducibility).  num_timesteps must not exceed the
    schedule length: the reference silently indexes out of range there
    (its own default of 250 crashes against T=200, model.py:468); here it
    is a clear error instead of silent clamping.
    Returns (decoded, z_t_decoded, logs); decoded images are in [0, 1].

    sampler='dpm++' (DPM-Solver++(2M)) with steps < num_timesteps walks a
    coarse grid: ~half the denoiser evaluations for the same ODE accuracy
    as the unit-step DDIM walk (diffusion/dpm.py).

    guidance != 1 applies classifier-free style guidance — a continuous
    style-strength knob (0 = ignore style, 1 = plain conditional,
    > 1 = amplified style) for models trained/finetuned with
    style_dropout > 0.  Costs one extra UNet batch-double per step.
    """
    if num_timesteps > model.num_timesteps:
        raise ValueError(
            f"num_timesteps={num_timesteps} exceeds the schedule length "
            f"T={model.num_timesteps}")
    return _transfer_impl(model, variables, key,
                          content_spec.astype(jnp.float32),
                          style_spec.astype(jnp.float32), num_timesteps,
                          float(eta), return_logs, sampler,
                          None if steps is None else int(steps),
                          float(guidance))


def match_moments(imgs: jax.Array, reference: jax.Array,
                  clip: Tuple[float, float] = (0.0, 1.0)) -> jax.Array:
    """Per-item affine level/contrast correction toward a reference image.

    The r03 independent evaluation (evaluation/metrics.py;
    docs/results/fullscale/transfer_eval.json) found the diffusion
    decoder's outputs carry the style's envelope SHAPE (81% band-shape
    reduction) but at ~4x compressed global level/contrast — a known
    diffusion-decoder artifact that std-normalized perceptual metrics are
    structurally blind to.  This classic moment-matching post-correction
    (the spectrogram analogue of style-transfer color matching) rescales
    each output so its global mean/std equal its style reference's:

        out = (img - mean(img)) / std(img) * std(ref) + mean(ref)

    clipped back to the valid range.  Opt-in on every inference surface
    (``--match-level`` in the CLI, ``EngineConfig.match_level``); off by
    default for parity with the reference's raw decoder output.
    """
    axes = tuple(range(1, imgs.ndim))
    m_o = jnp.mean(imgs, axis=axes, keepdims=True)
    s_o = jnp.std(imgs, axis=axes, keepdims=True)
    m_r = jnp.mean(reference, axis=axes, keepdims=True)
    s_r = jnp.std(reference, axis=axes, keepdims=True)
    out = (imgs - m_o) / jnp.maximum(s_o, 1e-6) * s_r + m_r
    return jnp.clip(out, clip[0], clip[1])


def checkpoint_distill_meta(full_checkpoint) -> Optional[dict]:
    """The ``distill`` metadata dict a progressively distilled checkpoint
    carries (training/distill.py saves {"steps", "t_max", "stages",
    "guidance"}), or None for a stock checkpoint or unreadable path.

    Lets callers (cli transfer/serve) validate that the requested
    --steps/--sample-steps match the grid the student was trained on:
    a student distilled over t_max=50 sampled with the default
    --steps 100 silently walks noise levels it never saw.
    """
    from music_style_transfer_ldm_tpu.training import checkpoint as ckpt_lib

    try:
        payload = ckpt_lib.restore_pytree(full_checkpoint)
    except Exception:  # noqa: BLE001 — advisory only; loading errors
        return None    # surface through load_ldm's real restore
    meta = payload.get("distill")
    return dict(meta) if isinstance(meta, dict) else None


def load_ldm(config, full_checkpoint: Optional[str] = None,
             autoencoder_checkpoint: Optional[str] = None,
             dtype=jnp.bfloat16, use_ema: bool = True):
    """Build an LDM + variables from checkpoints, with the reference's
    fallback semantics made explicit (ref: model.py:262-352: try the full
    model, fall back to encoder/decoder-only weights; unlike the reference,
    nothing is silently re-initialized afterwards).

    A checkpoint trained with TrainConfig.ema_decay > 0 carries EMA
    weights; every inference surface prefers them (use_ema=True, the
    DDPM/LDM sampling convention) — pass use_ema=False to sample from
    the raw weights (e.g. to continue fine-tuning behavior exactly).

    Returns (model, variables).  With no checkpoint, variables are fresh.
    """
    from music_style_transfer_ldm_tpu.training import checkpoint as ckpt_lib

    model = LDM(latent_dim=config.model.latent_dim,
                num_timesteps=config.diffusion.num_timesteps,
                beta_start=config.diffusion.beta_start,
                beta_end=config.diffusion.beta_end,
                unet_num_filters=config.model.unet_num_filters,
                style_num_filters=config.model.style_num_filters,
                dtype=dtype)
    S = config.model.image_size
    x = jnp.zeros((1, S, S, config.model.in_channels))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        x, x, jnp.zeros((1,), jnp.int32))
    params = dict(variables["params"])
    batch_stats = dict(variables.get("batch_stats", {}))

    if full_checkpoint is not None:
        try:
            payload = ckpt_lib.restore_pytree(full_checkpoint)
            loaded = payload["params"]
            if use_ema and payload.get("ema_params") is not None:
                loaded = payload["ema_params"]
                print("load_ldm: using EMA weights "
                      "(pass use_ema=False for raw)", flush=True)
            return model, {"params": loaded,
                           "batch_stats": payload["batch_stats"]}
        except Exception as e:  # noqa: BLE001 — reference fallback behavior
            if autoencoder_checkpoint is None:
                # No fallback available: surface the failure rather than
                # silently serving randomly initialized weights.
                raise
            print(f"Could not load full LDM checkpoint: {e}")
            print("Falling back to encoder/decoder weights")

    if autoencoder_checkpoint is not None:
        ae = ckpt_lib.load_autoencoder(autoencoder_checkpoint)
        for comp in ("encoder", "decoder"):
            params[comp] = jax.tree_util.tree_map(
                jnp.asarray, ae["params"][comp])
            batch_stats[comp] = jax.tree_util.tree_map(
                jnp.asarray, ae["batch_stats"][comp])

    return model, {"params": params, "batch_stats": batch_stats}
