"""DPM-Solver++(2M): second-order multistep ODE sampler, fused lax.scan.

A beyond-reference capability (the reference only has DDIM,
ref: models/model.py:409-559): DPM-Solver++ integrates the same
probability-flow ODE with a second-order multistep rule in log-SNR space
(Lu et al., arXiv 2211.01095), so ~half the denoiser evaluations reach the
same ODE accuracy as DDIM — a direct 2x on transfer/generation latency at
matched quality (tested: tests/test_diffusion.py order-of-convergence
checks; single-step equality with DDIM is exact).

Deterministic (eta-free); shares the time-grid conventions of
diffusion/ddim.py, so it is a drop-in `sampler="dpm++"` switch in the LDM
wrappers.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from music_style_transfer_ldm_tpu.diffusion.schedule import DiffusionSchedule


def dpm_solver_pp_2m(denoise_fn: Callable[[jax.Array, jax.Array], jax.Array],
                     schedule: DiffusionSchedule, x: jax.Array,
                     times: jax.Array,
                     return_logs: bool = False,
                     unroll: int = 2) -> Tuple[jax.Array, dict | None]:
    """Run DPM-Solver++(2M) over a descending timestep grid.

    Same contract as ddim_sample: S-1 update steps over `times` [S]; the
    first step is first-order (no history), later steps use the 2M
    multistep correction  D_i = (1 + 1/(2 r_i)) x0_i - x0_{i-1}/(2 r_i)
    with r_i = h_{i-1}/h_i and the exact exponential update
    x_{i+1} = (sigma_n/sigma_t) x - alpha_n (e^{-h} - 1) D_i.
    """
    import numpy as _np
    t_host = _np.asarray(times)
    if t_host.ndim == 1 and len(_np.unique(t_host)) != len(t_host):
        raise ValueError(
            "duplicate timesteps in the grid: the multistep update divides "
            "by the log-SNR step h, which is zero across a duplicate pair "
            "(use steps <= num_timesteps)")
    times = jnp.asarray(times, jnp.int32)
    pairs = jnp.stack([times[:-1], times[1:]], axis=1)  # [S-1, 2]
    batch = x.shape[0]
    ab = schedule.alpha_bars

    def lam_of(t):
        a = jnp.sqrt(ab[t])
        s = jnp.sqrt(1.0 - ab[t])
        return jnp.log(a / s)

    def body(carry, pair):
        x, prev_x0, prev_lam, have_prev = carry
        t, t_next = pair[0], pair[1]
        ab_t = ab[t].reshape((1,) * x.ndim)
        ab_n = ab[t_next].reshape((1,) * x.ndim)
        a_t, s_t = jnp.sqrt(ab_t), jnp.sqrt(1.0 - ab_t)
        a_n, s_n = jnp.sqrt(ab_n), jnp.sqrt(1.0 - ab_n)
        lam_t, lam_n = lam_of(t), lam_of(t_next)

        eps_hat = denoise_fn(x, jnp.full((batch,), t, jnp.int32))
        x0 = (x - s_t * eps_hat) / a_t

        h = lam_n - lam_t
        r = jnp.where(have_prev, (lam_t - prev_lam) / h, 1.0)
        correction = jnp.where(have_prev, (x0 - prev_x0) / (2.0 * r), 0.0)
        D = x0 + correction
        x_new = (s_n / s_t) * x - a_n * jnp.expm1(-h) * D
        ys = (x0, eps_hat) if return_logs else None
        return (x_new, x0, lam_t, jnp.bool_(True)), ys

    init = (x, jnp.zeros_like(x), jnp.float32(0.0), jnp.bool_(False))
    (x_final, _, _, _), ys = jax.lax.scan(body, init, pairs, unroll=unroll)
    logs = None
    if return_logs:
        logs = {"timesteps": times[:-1], "pred_x0": ys[0],
                "noise_pred": ys[1]}
    return x_final, logs
