"""DDPM forward process: linear beta schedule, closed-form q-sampling.

Re-implements the reference's ForwardDiffusion module
(ref: models/model.py:90-124) as a stateless pytree of precomputed tables —
no nn.Module needed since nothing is learned.  All ops are elementwise
gathers/FMAs that XLA fuses into surrounding computations.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def linear_beta_schedule(num_timesteps: int = 200, beta_start: float = 1e-4,
                         beta_end: float = 0.02) -> jax.Array:
    """Linear beta in [beta_start, beta_end] (ref: model.py:96-98)."""
    return jnp.linspace(beta_start, beta_end, num_timesteps,
                        dtype=jnp.float32)


class DiffusionSchedule(NamedTuple):
    """Precomputed schedule tables (ref buffers beta_t/alpha_t/alpha_bar_t)."""

    betas: jax.Array        # [T]
    alphas: jax.Array       # [T]
    alpha_bars: jax.Array   # [T] cumulative product

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]

    @classmethod
    def create(cls, num_timesteps: int = 200, beta_start: float = 1e-4,
               beta_end: float = 0.02) -> "DiffusionSchedule":
        betas = linear_beta_schedule(num_timesteps, beta_start, beta_end)
        alphas = 1.0 - betas
        return cls(betas=betas, alphas=alphas,
                   alpha_bars=jnp.cumprod(alphas))

    def _gather(self, t: jax.Array, x_ndim: int) -> jax.Array:
        """alpha_bar[t] broadcast against an x of rank x_ndim
        (ref: model.py:107 .view(-1,1,1,1))."""
        ab = self.alpha_bars[t]
        return ab.reshape(ab.shape + (1,) * (x_ndim - ab.ndim))

    def q_sample(self, key: jax.Array, x0: jax.Array, t: jax.Array
                 ) -> Tuple[jax.Array, jax.Array]:
        """Forward process: returns (z_t, eps) (ref: model.py:102-115)."""
        ab = self._gather(t, x0.ndim)
        eps = jax.random.normal(key, x0.shape, x0.dtype)
        z_t = jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * eps
        return z_t, eps

    def q_sample_with_noise(self, x0: jax.Array, t: jax.Array,
                            eps: jax.Array) -> jax.Array:
        """Forward process with caller-provided noise (deterministic tests)."""
        ab = self._gather(t, x0.ndim)
        return jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * eps

    def predict_start_from_noise(self, z_t: jax.Array, t: jax.Array,
                                 noise_pred: jax.Array) -> jax.Array:
        """x0_hat = (z_t - sqrt(1-ab)*eps_hat) / sqrt(ab)
        (ref: model.py:117-124)."""
        ab = self._gather(t, z_t.ndim)
        return (z_t - jnp.sqrt(1.0 - ab) * noise_pred) / jnp.sqrt(ab)
