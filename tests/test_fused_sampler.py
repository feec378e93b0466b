"""Fused whole-trajectory DDIM Pallas kernel vs the scan sampler.

Three parity layers, strongest to weakest coupling:
  1. the packed matmul formulation (selection-matrix im2col, flipped
     transpose kernels, precomputed K/V + time MLP, folded A/B update)
     against the flax UNet + lax.scan sampler — validates the math;
  2. the Pallas kernel (interpret mode on CPU) against that packed
     reference — validates the kernel (rolls, refs, grid carry);
  3. the end-to-end wrapper against models.ldm.content_style_transfer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_style_transfer_ldm_tpu.diffusion.ddim import transfer_time_grid
from music_style_transfer_ldm_tpu.models.ldm import (
    LDM, content_style_transfer,
)
from music_style_transfer_ldm_tpu.ops.pallas.fused_sampler import (
    fused_content_style_transfer, fused_ddim_sample, pack_operands,
    reference_ddim_sample,
)


@pytest.fixture(scope="module")
def setup():
    model = LDM(dtype=jnp.float32)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 128, 128, 1), jnp.float32)
    s = jnp.asarray(rng.rand(1, 128, 128, 1), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "diffusion": jax.random.PRNGKey(1)},
                           x, s, jnp.zeros((1,), jnp.int32))
    return model, variables, x, s


def _packed(model, variables, x, s, key, steps, eta=0.0):
    emb = model.apply(variables, s, method=LDM.style_embed)
    sched = model.schedule
    z0 = model.apply(variables, x, method=LDM.encode)
    z_t, _ = sched.q_sample(key, z0.astype(jnp.float32),
                            jnp.full((1,), steps - 1, jnp.int32))
    times = transfer_time_grid(steps)
    ops, names = pack_operands(variables["params"]["unet"], emb, sched,
                               times, eta, dtype=jnp.float32)
    return ops, names, z_t, times


def test_packed_math_matches_flax_scan(setup):
    model, variables, x, s = setup
    key = jax.random.PRNGKey(42)
    ref, _, _ = content_style_transfer(model, variables, key, x, s,
                                       num_timesteps=12)
    ops, names, z_t, times = _packed(model, variables, x, s, key, 12)
    lat = reference_ddim_sample(ops, names, z_t, len(times) - 1)
    dec = (model.apply(variables, lat, method=LDM.decode) + 1.0) / 2.0
    np.testing.assert_allclose(np.asarray(dec), np.asarray(ref), atol=1e-5)


def test_pallas_kernel_matches_packed_reference(setup):
    model, variables, x, s = setup
    key = jax.random.PRNGKey(7)
    ops, names, z_t, times = _packed(model, variables, x, s, key, 12)
    lat_ref = reference_ddim_sample(ops, names, z_t, len(times) - 1)
    lat_pal = fused_ddim_sample(ops, names, z_t, len(times) - 1,
                                dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(lat_pal), np.asarray(lat_ref),
                               atol=1e-5)


def test_wrapper_end_to_end(setup):
    model, variables, x, s = setup
    key = jax.random.PRNGKey(3)
    ref, _, _ = content_style_transfer(model, variables, key, x, s,
                                       num_timesteps=12)
    out = fused_content_style_transfer(model, variables, key, x, s,
                                       num_timesteps=12, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # determinism
    out2 = fused_content_style_transfer(model, variables, key, x, s,
                                        num_timesteps=12, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_eta_parity(setup):
    """eta > 0 folds into the same A/B update (ref: model.py:449-458)."""
    model, variables, x, s = setup
    key = jax.random.PRNGKey(11)
    ref, _, _ = content_style_transfer(model, variables, key, x, s,
                                       num_timesteps=10, eta=0.5)
    out = fused_content_style_transfer(model, variables, key, x, s,
                                       num_timesteps=10, eta=0.5,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_generation_parity(setup):
    """Fused generation (noise -> image) matches style_ddim_sample."""
    from music_style_transfer_ldm_tpu.models.ldm import style_ddim_sample
    from music_style_transfer_ldm_tpu.ops.pallas.fused_sampler import (
        fused_style_sample,
    )
    model, variables, _, s = setup
    key = jax.random.PRNGKey(21)
    z_shape = (1, 16, 16, 32)
    ref, _ = style_ddim_sample(model, variables, key, z_shape, s,
                               timesteps=12)
    out = fused_style_sample(model, variables, key, z_shape, s,
                             timesteps=12, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_dpm_parity(setup):
    """Fused DPM-Solver++(2M) (x <- A x + B eps + C prev_x0 folding)
    matches the scan implementation (diffusion/dpm.py), full + coarse
    grid."""
    model, variables, x, s = setup
    key = jax.random.PRNGKey(17)
    for steps in (None, 7):
        ref, _, _ = content_style_transfer(model, variables, key, x, s,
                                           num_timesteps=14,
                                           sampler="dpm++", steps=steps)
        out = fused_content_style_transfer(model, variables, key, x, s,
                                           num_timesteps=14,
                                           sampler="dpm++", steps=steps,
                                           interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)


def test_batch_guard(setup):
    model, variables, x, s = setup
    x2 = jnp.concatenate([x, x], axis=0)
    with pytest.raises(ValueError, match="batch-1"):
        fused_content_style_transfer(model, variables, jax.random.PRNGKey(0),
                                     x2, x2, num_timesteps=10)


def test_nonflagship_geometry_rejected():
    """A clear error, not an opaque matmul shape mismatch, for UNet widths
    the kernel's selection matrices weren't built for."""
    from music_style_transfer_ldm_tpu.diffusion.ddim import (
        transfer_time_grid,
    )
    model = LDM(dtype=jnp.float32, latent_dim=16)
    x = jnp.zeros((1, 128, 128, 1))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "diffusion": jax.random.PRNGKey(1)},
                           x, x, jnp.zeros((1,), jnp.int32))
    emb = model.apply(variables, x, method=LDM.style_embed)
    with pytest.raises(ValueError, match="flagship UNet geometry"):
        pack_operands(variables["params"]["unet"], emb, model.schedule,
                      transfer_time_grid(10), 0.0, dtype=jnp.float32)


def test_schedule_length_guard(setup):
    """Same T-bound error as the scan path (models/ldm.py:249): without it
    the alpha_bar gather silently clamps under jit."""
    model, variables, x, s = setup
    with pytest.raises(ValueError, match="exceeds the schedule"):
        fused_content_style_transfer(model, variables, jax.random.PRNGKey(0),
                                     x, s, num_timesteps=250)


def test_dpm_duplicate_grid_rejected(setup):
    """A grid with duplicate timesteps (steps > num_timesteps) would divide
    by a zero log-SNR step in the 2M update — both dpm++ layers reject it
    instead of emitting NaN images."""
    from music_style_transfer_ldm_tpu.diffusion.ddim import (
        transfer_time_grid,
    )
    from music_style_transfer_ldm_tpu.diffusion.dpm import dpm_solver_pp_2m
    model, variables, x, s = setup
    with pytest.raises(ValueError, match="duplicate"):
        transfer_time_grid(10, 20)
    dup_grid = np.asarray([9, 7, 7, 4, 0], np.int32)
    with pytest.raises(ValueError, match="duplicate"):
        dpm_solver_pp_2m(lambda z, t: z, model.schedule,
                         jnp.zeros((1, 16, 16, 32)), dup_grid)
    emb = model.apply(variables, s, method=LDM.style_embed)
    with pytest.raises(ValueError, match="duplicate"):
        pack_operands(variables["params"]["unet"], emb, model.schedule,
                      dup_grid, 0.0, dtype=jnp.float32, sampler="dpm++")
