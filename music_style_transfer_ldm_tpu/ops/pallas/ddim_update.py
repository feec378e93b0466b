"""Fused DDIM update step as a Pallas kernel.

The per-step DDIM state update (ref: models/model.py:446-458) is a chain of
five elementwise ops over the latent.  Inside the sampling scan XLA already
fuses most of it; this kernel guarantees a single VMEM pass (one read of x
and eps_hat, one write of x_new) with the schedule scalars prefetched into
SMEM, and serves as the template for further sampler fusion work.

    x0_hat = (x - sqrt(1-ab_t) * eps) * rsqrt(ab_t)
    x_new  = sqrt(ab_next) * x0_hat
             + (sqrt(1-ab_next) + eta*(sqrt(1-ab_next) - sqrt(1-ab_t))) * eps
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(scal_ref, x_ref, eps_ref, out_ref):
    ab_t = scal_ref[0, 0]
    ab_next = scal_ref[0, 1]
    eta = scal_ref[0, 2]
    sq1m_t = jnp.sqrt(1.0 - ab_t)
    sq1m_n = jnp.sqrt(1.0 - ab_next)
    x = x_ref[:]
    eps = eps_ref[:]
    x0_hat = (x - sq1m_t * eps) * jax.lax.rsqrt(ab_t)
    coeff = sq1m_n + eta * (sq1m_n - sq1m_t)
    out_ref[:] = jnp.sqrt(ab_next) * x0_hat + coeff * eps


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_ddim_update(x: jax.Array, eps_hat: jax.Array, ab_t: jax.Array,
                      ab_next: jax.Array, eta: jax.Array,
                      interpret: bool | None = None) -> jax.Array:
    """One DDIM update over an arbitrary-shaped latent batch."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    shape = x.shape
    n = x.size
    # Lay out as [rows, 512]: the LDM latent (B,16,16,32) flattens exactly;
    # other sizes fall back to a [1, n] row.
    cols = 512 if n % 512 == 0 else n
    x2 = x.reshape(-1, cols).astype(jnp.float32)
    e2 = eps_hat.reshape(-1, cols).astype(jnp.float32)
    scalars = jnp.stack([ab_t, ab_next, eta]).astype(jnp.float32)[None, :]
    out = pl.pallas_call(
        _kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, jnp.float32),
        interpret=interpret,
    )(scalars, x2, e2)
    return out.reshape(shape)
