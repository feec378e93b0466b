"""Pallas kernels vs their pure-JAX references (interpreter mode on CPU;
the same kernels compile natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from music_style_transfer_ldm_tpu.audio import mel as M
from music_style_transfer_ldm_tpu.audio.quantize import db_to_unit_image
from music_style_transfer_ldm_tpu.diffusion import (
    DiffusionSchedule, ddim_sample, generation_time_grid,
)
from music_style_transfer_ldm_tpu.ops import (
    fused_ddim_update, fused_mel_unit_image,
)


def test_fused_mel_image_matches_reference_chain(rng):
    fb = np.asarray(M.mel_filterbank(22050, 2048, 128))
    S = np.abs(rng.randn(3, 1025, 130)).astype(np.float32) ** 2

    got = np.asarray(fused_mel_unit_image(jnp.asarray(fb), jnp.asarray(S)))

    mel = np.einsum("mf,bft->bmt", fb, S)
    db = np.asarray(M.power_to_db(jnp.asarray(mel), batched=True))
    want = np.asarray(db_to_unit_image(jnp.asarray(db)))
    assert got.shape == want.shape == (3, 128, 130)
    np.testing.assert_allclose(got, want, atol=1.0 / 255.0 + 1e-5)
    # Quantized outputs live on the exact /255 grid.
    np.testing.assert_allclose(got * 255.0, np.round(got * 255.0), atol=1e-4)


def test_fused_mel_image_per_item_ref(rng):
    fb = np.asarray(M.mel_filterbank(22050, 2048, 64))
    S = np.abs(rng.randn(2, 1025, 50)).astype(np.float32)
    S[1] *= 1e4  # wildly different scales
    got = np.asarray(fused_mel_unit_image(jnp.asarray(fb), jnp.asarray(S)))
    # each item has its own ref=max -> both hit 1.0 at their peak
    assert got[0].max() == 1.0 and got[1].max() == 1.0


def test_fused_ddim_update_matches_formula(rng):
    x = rng.randn(2, 16, 16, 32).astype(np.float32)
    eps = rng.randn(2, 16, 16, 32).astype(np.float32)
    ab_t, ab_next, eta = 0.31, 0.52, 0.3
    got = np.asarray(fused_ddim_update(
        jnp.asarray(x), jnp.asarray(eps), jnp.float32(ab_t),
        jnp.float32(ab_next), jnp.float32(eta)))
    x0_hat = (x - np.sqrt(1 - ab_t) * eps) / np.sqrt(ab_t)
    dir_t = np.sqrt(1 - ab_t) * eps
    dir_n = np.sqrt(1 - ab_next) * eps
    want = np.sqrt(ab_next) * x0_hat + dir_n + eta * (dir_n - dir_t)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_ddim_update_matches_sampler_step(rng):
    """One fused-kernel step == one ddim_sample scan step."""
    sched = DiffusionSchedule.create(200)
    x0 = jnp.asarray(rng.randn(1, 16, 16, 32).astype(np.float32))
    times = generation_time_grid(200, 3)  # one update: t=199 -> 99
    denoise = lambda x, t: 0.2 * x
    # scan does two steps; replicate with the kernel
    want, _ = ddim_sample(denoise, sched, x0, times, eta=0.0)
    x = x0
    ab = sched.alpha_bars
    for i in range(2):
        t, tn = int(times[i]), int(times[i + 1])
        x = fused_ddim_update(x, 0.2 * x, ab[t], ab[tn], jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(x), np.asarray(want), rtol=1e-4,
                               atol=1e-5)


def test_fused_ddim_update_odd_shape(rng):
    x = rng.randn(5, 7, 3).astype(np.float32)  # not divisible by 512
    eps = rng.randn(5, 7, 3).astype(np.float32)
    got = np.asarray(fused_ddim_update(
        jnp.asarray(x), jnp.asarray(eps), jnp.float32(0.5),
        jnp.float32(0.4), jnp.float32(0.0)))
    assert got.shape == x.shape
    assert np.isfinite(got).all()
