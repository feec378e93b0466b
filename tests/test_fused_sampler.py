"""Fused whole-trajectory DDIM Pallas kernel vs the scan sampler.

Three parity layers, strongest to weakest coupling:
  1. the packed matmul formulation (stacked-row roll-tap convs +
     resampling matrices, precomputed K/V + time MLP, folded A/B/C
     update) against the flax UNet + lax.scan sampler — validates the
     math;
  2. the Pallas kernel (interpret mode on CPU) against that packed
     reference — validates the kernel (rolls, refs, grid carry);
  3. the end-to-end wrapper against models.ldm.content_style_transfer.

Batched cases (stacked-row layout, per-element styles) run the same three
layers at B=4.
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
    """Batches beyond the VMEM-bounded pack limit get a clear error."""
    from music_style_transfer_ldm_tpu.ops.pallas.fused_sampler import (
        FUSED_MAX_BATCH,
    )
    model, variables, x, s = setup
    n = FUSED_MAX_BATCH + 1
    xb = jnp.concatenate([x] * n, axis=0)
    with pytest.raises(ValueError, match="at most"):
        fused_content_style_transfer(model, variables, jax.random.PRNGKey(0),
                                     xb, xb, num_timesteps=10)


@pytest.fixture(scope="module")
def setup_b4():
    model = LDM(dtype=jnp.float32)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(4, 128, 128, 1), jnp.float32)
    s = jnp.asarray(rng.rand(4, 128, 128, 1), jnp.float32)  # 4 styles
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "diffusion": jax.random.PRNGKey(1)},
                           x, s, jnp.zeros((4,), jnp.int32))
    return model, variables, x, s


def test_batched_kernel_matches_packed_reference(setup_b4):
    """Pallas kernel (interpret) == jnp executor of the same packed math
    at B=4 with a different style per element."""
    model, variables, x, s = setup_b4
    emb = model.apply(variables, s, method=LDM.style_embed)
    sched = model.schedule
    z0 = model.apply(variables, x, method=LDM.encode)
    z_t, _ = sched.q_sample(jax.random.PRNGKey(2), z0.astype(jnp.float32),
                            jnp.full((4,), 11, jnp.int32))
    times = transfer_time_grid(12)
    ops, names = pack_operands(variables["params"]["unet"], emb, sched,
                               times, 0.0, dtype=jnp.float32, batch=4)
    lat_ref = reference_ddim_sample(ops, names, z_t, len(times) - 1)
    lat_pal = fused_ddim_sample(ops, names, z_t, len(times) - 1,
                                dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(lat_pal), np.asarray(lat_ref),
                               atol=1e-5)


def test_batched_wrapper_matches_scan(setup_b4):
    """End-to-end batched fused transfer == scan sampler at B=4 with
    per-element styles AND per-element noising keys."""
    model, variables, x, s = setup_b4
    keys = jax.random.split(jax.random.PRNGKey(9), 4)
    ref, _, _ = content_style_transfer(model, variables, keys, x, s,
                                       num_timesteps=12)
    out = fused_content_style_transfer(model, variables, keys, x, s,
                                       num_timesteps=12, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_batched_equals_per_element(setup_b4):
    """Batch elements compute independently: the B=4 kernel output equals
    four B=1 runs with the same per-item keys (grouping-invariance the
    serving engine and the CLI chunk batching rely on)."""
    model, variables, x, s = setup_b4
    keys = jax.random.split(jax.random.PRNGKey(13), 4)
    out = fused_content_style_transfer(model, variables, keys, x, s,
                                       num_timesteps=10, interpret=True)
    for b in range(4):
        one = fused_content_style_transfer(
            model, variables, keys[b:b + 1], x[b:b + 1], s[b:b + 1],
            num_timesteps=10, interpret=True)
        np.testing.assert_allclose(np.asarray(out[b:b + 1]),
                                   np.asarray(one), atol=1e-5)


def test_batched_dpm_parity(setup_b4):
    """Batched fused DPM-Solver++(2M) on the coarse grid == scan."""
    model, variables, x, s = setup_b4
    keys = jax.random.split(jax.random.PRNGKey(23), 4)
    ref, _, _ = content_style_transfer(model, variables, keys, x, s,
                                       num_timesteps=14, sampler="dpm++",
                                       steps=7)
    out = fused_content_style_transfer(model, variables, keys, x, s,
                                       num_timesteps=14, sampler="dpm++",
                                       steps=7, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


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
