"""Scheduler and DDIM sampler tests: forward/reverse consistency and eta=0
determinism (reference has these only as dead/commented code,
ref: models/tests.py:21-151)."""

import jax
import jax.numpy as jnp
import numpy as np

from music_style_transfer_ldm_tpu.diffusion import (
    DiffusionSchedule, ddim_sample, generation_time_grid, transfer_time_grid,
)


def test_schedule_tables_match_reference_formula():
    s = DiffusionSchedule.create(200, 1e-4, 0.02)
    betas = np.linspace(1e-4, 0.02, 200, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(s.betas), betas, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.alphas), 1 - betas, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.alpha_bars),
                               np.cumprod(1 - betas), rtol=1e-5)
    assert s.num_timesteps == 200


def test_q_sample_statistics():
    s = DiffusionSchedule.create(200)
    x0 = jnp.ones((8, 16, 16, 32))
    t = jnp.full((8,), 199, jnp.int32)
    z_t, eps = s.q_sample(jax.random.PRNGKey(0), x0, t)
    ab = float(s.alpha_bars[199])
    # At t=T-1 alpha_bar ~= 0.134: z_t ~ sqrt(ab)*1 + sqrt(1-ab)*N(0,1).
    assert abs(float(z_t.mean()) - np.sqrt(ab)) < 0.02
    assert abs(float(z_t.std()) - np.sqrt(1 - ab)) < 0.02
    assert eps.shape == x0.shape


def test_forward_reverse_consistency():
    # ref: tests.py:96-128 — predict_start_from_noise inverts q_sample
    # exactly when given the true noise.
    s = DiffusionSchedule.create(200)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 32))
    for tval in [0, 50, 199]:
        t = jnp.full((4,), tval, jnp.int32)
        z_t, eps = s.q_sample(jax.random.PRNGKey(2), x0, t)
        x0_rec = s.predict_start_from_noise(z_t, t, eps)
        np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0),
                                   rtol=1e-3, atol=1e-4)


def test_time_grids_match_reference():
    # generation: linspace(T-1, 0, S).long() (ref: model.py:420)
    g = generation_time_grid(200, 50)
    assert g[0] == 199 and g[-1] == 0 and len(g) == 50
    ref = np.linspace(199, 0, 50).astype(np.int64)
    np.testing.assert_array_equal(g, ref)
    # transfer: unit steps (ref: model.py:514)
    tgrid = transfer_time_grid(100)
    np.testing.assert_array_equal(tgrid, np.arange(99, -1, -1))


def _linear_denoiser():
    # A deterministic stand-in "UNet": eps_hat = 0.1 * x.
    def fn(x, t):
        return 0.1 * x
    return fn


def test_ddim_eta0_is_deterministic():
    s = DiffusionSchedule.create(200)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 32))
    times = generation_time_grid(200, 20)
    out1, _ = ddim_sample(_linear_denoiser(), s, x, times, eta=0.0)
    out2, _ = ddim_sample(_linear_denoiser(), s, x, times, eta=0.0)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_ddim_scan_matches_python_loop():
    """The fused lax.scan must produce exactly what the reference's Python
    loop produces (ref: model.py:431-458), verified against a numpy replica."""
    s = DiffusionSchedule.create(200)
    ab = np.asarray(s.alpha_bars)
    x0 = np.random.RandomState(7).randn(1, 4, 4, 2).astype(np.float32)
    times = generation_time_grid(200, 10)
    eta = 0.3

    x = x0.copy()
    for i in range(len(times) - 1):
        t, t_next = int(times[i]), int(times[i + 1])
        eps = 0.1 * x
        abt, abn = ab[t], ab[t_next]
        x0_hat = (x - np.sqrt(1 - abt) * eps) / np.sqrt(abt)
        dir_t = np.sqrt(1 - abt) * eps
        dir_n = np.sqrt(1 - abn) * eps
        x = np.sqrt(abn) * x0_hat + dir_n + eta * (dir_n - dir_t)

    got, _ = ddim_sample(_linear_denoiser(), s, jnp.asarray(x0), times,
                         eta=eta)
    np.testing.assert_allclose(np.asarray(got), x, rtol=2e-4, atol=2e-5)


def test_ddim_logs_stacked():
    s = DiffusionSchedule.create(200)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 4, 2))
    times = generation_time_grid(200, 8)
    out, logs = ddim_sample(_linear_denoiser(), s, x, times, eta=0.0,
                            return_logs=True)
    assert logs is not None
    assert logs["pred_x0"].shape == (7, 2, 4, 4, 2)
    assert logs["noise_pred"].shape == (7, 2, 4, 4, 2)
    assert logs["timesteps"].shape == (7,)
