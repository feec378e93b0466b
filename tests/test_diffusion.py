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


# ---------------------------------------------------------------------------
# DPM-Solver++(2M) — the beyond-reference fast sampler (diffusion/dpm.py).
# ---------------------------------------------------------------------------


def _smooth_denoiser():
    """A smooth, t-dependent stand-in eps-model: any such vector field
    defines a probability-flow ODE whose fine-grid solution is the ground
    truth for convergence checks."""
    def fn(x, t):
        tt = (t.astype(jnp.float32) / 200.0).reshape((-1,) + (1,) *
                                                     (x.ndim - 1))
        return jnp.tanh(x) * (0.5 + tt) + 0.1 * jnp.sin(3.0 * x)
    return fn


def test_dpm_single_step_equals_ddim():
    """With no history the 2M solver's exponential update is algebraically
    identical to the eta=0 DDIM update — exact to float precision."""
    from music_style_transfer_ldm_tpu.diffusion import DiffusionSchedule
    from music_style_transfer_ldm_tpu.diffusion.ddim import ddim_sample
    from music_style_transfer_ldm_tpu.diffusion.dpm import dpm_solver_pp_2m
    sched = DiffusionSchedule.create(200, 1e-4, 0.02)
    fn = _smooth_denoiser()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    times = np.asarray([150, 60], np.int32)
    a, _ = ddim_sample(fn, sched, x, times, eta=0.0)
    b, _ = dpm_solver_pp_2m(fn, sched, x, times)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_dpm_second_order_beats_ddim_at_equal_steps():
    """Convergence: against a 200-step fine-grid reference solution,
    coarse-grid DPM++(2M) lands closer than coarse-grid DDIM at every
    tested step count — the whole point of shipping the second sampler."""
    from music_style_transfer_ldm_tpu.diffusion import DiffusionSchedule
    from music_style_transfer_ldm_tpu.diffusion.ddim import (
        ddim_sample, transfer_time_grid,
    )
    from music_style_transfer_ldm_tpu.diffusion.dpm import dpm_solver_pp_2m
    sched = DiffusionSchedule.create(200, 1e-4, 0.02)
    fn = _smooth_denoiser()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    ref, _ = ddim_sample(fn, sched, x, transfer_time_grid(200), eta=0.0)
    ref = np.asarray(ref)
    for steps in (10, 25, 50):
        grid = transfer_time_grid(200, steps)
        d, _ = ddim_sample(fn, sched, x, grid, eta=0.0)
        p, _ = dpm_solver_pp_2m(fn, sched, x, grid)
        err_ddim = float(np.abs(np.asarray(d) - ref).mean())
        err_dpm = float(np.abs(np.asarray(p) - ref).mean())
        assert err_dpm < err_ddim, (steps, err_dpm, err_ddim)
    # and the coarse DPM++ run is genuinely accurate in absolute terms:
    # 25 steps within ~1e-2 of the 200-step solution.
    grid = transfer_time_grid(200, 25)
    p, _ = dpm_solver_pp_2m(fn, sched, x, grid)
    assert float(np.abs(np.asarray(p) - ref).mean()) < 1.5e-2


def test_dpm_transfer_wrapper_and_coarse_grid(rng):
    """sampler='dpm++' + steps=25 through the product transfer path."""
    from music_style_transfer_ldm_tpu.models.ldm import (
        LDM, content_style_transfer,
    )
    import pytest
    # default filter widths: the reference UNet couples nf*2 == temb dim
    model = LDM(latent_dim=8, num_timesteps=50)
    x = jnp.asarray(rng.rand(1, 64, 64, 1).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        x, x, jnp.zeros((1,), jnp.int32))
    out, _, _ = content_style_transfer(model, variables,
                                       jax.random.PRNGKey(2), x, x,
                                       num_timesteps=50, sampler="dpm++",
                                       steps=13)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # deterministic sampler rejects eta
    with pytest.raises(ValueError):
        content_style_transfer(model, variables, jax.random.PRNGKey(2),
                               x, x, num_timesteps=50, sampler="dpm++",
                               eta=0.5)
