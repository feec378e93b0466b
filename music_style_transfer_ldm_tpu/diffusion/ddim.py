"""DDIM sampling as a single fused ``lax.scan``.

The reference runs its DDIM loops in Python, one UNet launch per step
(ref: models/model.py:409-465 generation, :503-559 transfer).  Here the
whole trajectory is one compiled scan: the timestep pair grid is a static
table, the body is one denoiser call + the DDIM update, and the per-step
diagnostics the reference appends to Python lists (pred_x0 / noise_pred,
ref: model.py:460-463) become stacked scan outputs (optional, since
materializing them costs HBM).

The update rule replicates the reference exactly (ref: model.py:446-458):

  x0_hat = (x - sqrt(1-ab_t) eps_hat) / sqrt(ab_t)
  x <- sqrt(ab_next) x0_hat + sqrt(1-ab_next) eps_hat
       + eta (sqrt(1-ab_next) - sqrt(1-ab_t)) eps_hat

(eta interpolates the direction terms; the reference adds no fresh noise
for eta > 0 — a quirk preserved for parity.)
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from music_style_transfer_ldm_tpu.diffusion.schedule import DiffusionSchedule


def generation_time_grid(num_timesteps: int, steps: int) -> np.ndarray:
    """times = linspace(T-1, 0, steps) floored to int (ref: model.py:420)."""
    return np.linspace(num_timesteps - 1, 0, steps).astype(np.int32)


def transfer_time_grid(num_timesteps: int,
                       steps: int | None = None) -> np.ndarray:
    """Unit-step grid over the first N timesteps (ref: model.py:514).

    steps < N subsamples the grid (linspace) — the reference always walks
    every step; a coarse grid pairs with higher-order samplers
    (diffusion/dpm.py) for fewer denoiser evaluations.  steps > N is
    rejected: flooring more linspace points than integers in the range
    guarantees duplicate consecutive timesteps, which are harmless for
    DDIM but divide by a zero log-SNR step (NaN) in DPM-Solver++."""
    if steps is not None and steps > num_timesteps:
        raise ValueError(f"steps={steps} > num_timesteps={num_timesteps}: "
                         "the grid would contain duplicate timesteps")
    return np.linspace(num_timesteps - 1, 0,
                       steps or num_timesteps).astype(np.int32)


def ddim_sample(denoise_fn: Callable[[jax.Array, jax.Array], jax.Array],
                schedule: DiffusionSchedule, x: jax.Array,
                times: jax.Array, eta: float = 0.0,
                return_logs: bool = False,
                unroll: int = 2) -> Tuple[jax.Array, dict | None]:
    """Run DDIM over a timestep grid.

    denoise_fn: (x, t[B]) -> predicted noise (the UNet wrapped with params
      and style embedding already bound).
    x: starting latent [B, ...] (pure noise for generation, partially-noised
      content for SDEdit transfer).
    times: [S] int32 descending grid; S-1 update steps are taken
      (ref loops ``for i in range(len(times)-1)``, model.py:431,:525).

    NOT jitted here: jit the caller (models/ldm.py compiles each sampler
    once per (model, steps, eta) — jitting on denoise_fn directly would
    key the cache on closure identity and recompile every call).

    Returns (x_final, logs) where logs stacks per-step pred_x0/noise_pred
    along a leading step axis when return_logs=True.
    """
    times = jnp.asarray(times, jnp.int32)
    pairs = jnp.stack([times[:-1], times[1:]], axis=1)  # [S-1, 2]
    batch = x.shape[0]

    def body(x, pair):
        t, t_next = pair[0], pair[1]
        t_b = jnp.full((batch,), t, jnp.int32)
        eps_hat = denoise_fn(x, t_b)

        ab_t = schedule.alpha_bars[t].reshape((1,) * x.ndim)
        ab_next = schedule.alpha_bars[t_next].reshape((1,) * x.ndim)

        x0_hat = (x - jnp.sqrt(1.0 - ab_t) * eps_hat) / jnp.sqrt(ab_t)
        dir_t = jnp.sqrt(1.0 - ab_t) * eps_hat
        dir_next = jnp.sqrt(1.0 - ab_next) * eps_hat
        x_new = (jnp.sqrt(ab_next) * x0_hat + dir_next
                 + eta * (dir_next - dir_t))
        ys = (x0_hat, eps_hat) if return_logs else None
        return x_new, ys

    # Modest unrolling shaves per-iteration scan overhead (~6% measured at
    # batch 1 on TPU v5e) at negligible compile cost.
    x_final, ys = jax.lax.scan(body, x, pairs, unroll=unroll)
    logs = None
    if return_logs:
        logs = {"timesteps": times[:-1], "pred_x0": ys[0],
                "noise_pred": ys[1]}
    return x_final, logs
