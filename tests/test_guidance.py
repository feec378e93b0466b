"""Classifier-free style guidance (no reference counterpart).

Covers the three layers of the feature: the guided denoiser combiner
(models/ldm.py:_denoise_fn), the training-side style-embedding dropout
(LDM.__call__ style_drop_mask; TrainConfig.style_dropout), and the
product plumbing (content_style_transfer guidance=, EngineConfig
validation).  The reference has no unconditional branch at all — its
UNet always sees the style embedding (ref: models/model.py:355-379).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_style_transfer_ldm_tpu.config import default_config
from music_style_transfer_ldm_tpu.models.ldm import (
    LDM, _denoise_fn, content_style_transfer,
)


def tiny_model(S=64):
    model = LDM(latent_dim=32, dtype=jnp.float32)
    x = jnp.zeros((1, S, S, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        x, x, jnp.zeros((1,), jnp.int32))
    return model, {"params": variables["params"],
                   "batch_stats": variables.get("batch_stats", {})}


def test_guided_denoise_matches_closed_form(rng):
    """The guided predictor is exactly eps_u + g * (eps_c - eps_u) with
    the unconditional branch a zeroed style pyramid — checked against
    separately-computed conditional/unconditional UNet calls for g = 0
    (fully unconditional), g > 1 (amplified), and fractional g."""
    model, variables = tiny_model()
    style = jnp.asarray(rng.rand(2, 64, 64, 1).astype(np.float32))
    emb = model.apply(variables, style, method=LDM.style_embed)
    z = jnp.asarray(rng.randn(2, 8, 8, 32).astype(np.float32))
    t = jnp.full((2,), 37, jnp.int32)

    eps_c = model.apply(variables, z, t, emb, method=LDM.denoise)
    emb0 = jax.tree_util.tree_map(jnp.zeros_like, emb)
    eps_u = model.apply(variables, z, t, emb0, method=LDM.denoise)

    for g in (0.0, 0.5, 2.0, 3.5):
        got = _denoise_fn(model, variables, emb, guidance=g)(z, t)
        want = eps_u + g * (eps_c - eps_u)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5)


def test_guidance_one_is_the_plain_path(rng):
    """g=1 takes the single-branch fast path and equals the default."""
    model, variables = tiny_model()
    content = jnp.asarray(rng.rand(2, 64, 64, 1).astype(np.float32))
    style = jnp.asarray(rng.rand(2, 64, 64, 1).astype(np.float32))
    key = jax.random.PRNGKey(3)
    base, _, _ = content_style_transfer(model, variables, key, content,
                                        style, num_timesteps=50, steps=4)
    same, _, _ = content_style_transfer(model, variables, key, content,
                                        style, num_timesteps=50, steps=4,
                                        guidance=1.0)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same))


def test_transfer_guidance_runs_and_differs(rng):
    """Guided transfer is finite and actually moves the output (the
    random-init conditional and unconditional branches differ, so g != 1
    must change the trajectory); works for dpm++ too."""
    model, variables = tiny_model()
    content = jnp.asarray(rng.rand(2, 64, 64, 1).astype(np.float32))
    style = jnp.asarray(rng.rand(2, 64, 64, 1).astype(np.float32))
    key = jax.random.PRNGKey(3)
    base, _, _ = content_style_transfer(model, variables, key, content,
                                        style, num_timesteps=50, steps=4)
    for sampler in ("ddim", "dpm++"):
        guided, _, _ = content_style_transfer(
            model, variables, key, content, style, num_timesteps=50,
            steps=4, sampler=sampler, guidance=2.0)
        assert np.all(np.isfinite(np.asarray(guided)))
        assert not np.allclose(np.asarray(guided), np.asarray(base),
                               atol=1e-6)


def test_style_drop_mask_zeroes_embedding_rows(rng):
    """style_drop_mask=1 rows predict with a ZEROED pyramid (bit-matching
    a manual zeroed-embedding denoise); mask=0 rows are untouched; the
    noising draw is mask-independent (same z_t either way)."""
    model, variables = tiny_model()
    content = jnp.asarray(rng.rand(2, 64, 64, 1).astype(np.float32))
    style = jnp.asarray(rng.rand(2, 64, 64, 1).astype(np.float32))
    t = jnp.asarray([10, 150], jnp.int32)
    rngs = {"diffusion": jax.random.PRNGKey(7)}

    out_plain = model.apply(variables, content, style, t, rngs=rngs)
    mask = jnp.asarray([1.0, 0.0])
    out_masked = model.apply(variables, content, style, t,
                             style_drop_mask=mask, rngs=rngs)

    np.testing.assert_array_equal(np.asarray(out_plain["z_t"]),
                                  np.asarray(out_masked["z_t"]))
    emb = model.apply(variables, style, method=LDM.style_embed)
    keep = jnp.asarray([0.0, 1.0]).reshape(2, 1, 1, 1)
    emb_masked = jax.tree_util.tree_map(lambda e: e * keep, emb)
    want = model.apply(variables, out_plain["z_t"], t, emb_masked,
                       method=LDM.denoise)
    np.testing.assert_allclose(np.asarray(out_masked["noise_pred"]),
                               np.asarray(want), atol=1e-6)
    # The kept row matches the unmasked forward exactly.
    np.testing.assert_allclose(np.asarray(out_masked["noise_pred"][1]),
                               np.asarray(out_plain["noise_pred"][1]),
                               atol=1e-6)
    assert not np.allclose(np.asarray(out_masked["noise_pred"][0]),
                           np.asarray(out_plain["noise_pred"][0]),
                           atol=1e-6)


def test_trainer_style_dropout_step(rng):
    """One LDM train step with style_dropout > 0: finite loss, UNet moves
    (the cfg knob reaches the jitted step)."""
    from music_style_transfer_ldm_tpu.training import LDMTrainer
    cfg = default_config()
    cfg.train = dataclasses.replace(cfg.train, batch_size=4,
                                    compute_dtype="float32",
                                    style_dropout=0.5)
    cfg.model = dataclasses.replace(cfg.model, image_size=64)
    trainer = LDMTrainer(cfg, perceptual=False)
    state = trainer.init_state(0)
    x = jnp.asarray(rng.rand(4, 64, 64, 1).astype(np.float32))
    state, metrics = trainer._train_step(state, x, x, jax.random.PRNGKey(0),
                                         (None, None))
    assert np.isfinite(float(metrics["total_loss"]))


def test_engine_rejects_fused_guidance():
    from music_style_transfer_ldm_tpu.serving.engine import (
        EngineConfig, InferenceEngine,
    )
    model, variables = tiny_model()
    with pytest.raises(ValueError, match="guidance"):
        InferenceEngine(model, variables,
                        EngineConfig(sampler="fused", guidance=2.0))


def test_moment_matched_generation_init(rng):
    """latent_stats switches z_T to the schedule's true marginal
    q(z_T) = N(sqrt(ab) mu, ab sigma^2 + 1 - ab): corpus_latent_stats
    returns the encoder's per-channel latent moments, and generation
    with them runs end to end (models/ldm.py _style_sample_impl)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from music_style_transfer_ldm_tpu.models.ldm import (
        LDM, corpus_latent_stats, style_ddim_sample,
    )

    model = LDM(latent_dim=32, num_timesteps=200)
    x = jnp.asarray(rng.rand(2, 64, 64, 1).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "diffusion": jax.random.PRNGKey(1)},
        x, x, jnp.zeros((2,), jnp.int32))

    corpus = rng.rand(6, 64, 64, 1).astype(np.float32)
    mu, sigma = corpus_latent_stats(model, variables, corpus, batch=4)
    assert mu.shape == (32,) and sigma.shape == (32,)
    z = np.asarray(jax.jit(
        lambda c: model.apply(variables, c, method=LDM.encode))(
            jnp.asarray(corpus)))
    np.testing.assert_allclose(np.asarray(mu), z.mean(axis=(0, 1, 2)),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sigma), z.std(axis=(0, 1, 2)),
                               rtol=1e-4, atol=1e-5)

    # Schedule sanity: the mismatch being corrected is real — a large
    # fraction of signal survives at T-1 on the reference schedule.
    ab = float(model.schedule.alpha_bars[model.num_timesteps - 1])
    assert 0.1 < ab < 0.2  # sqrt(ab) ~ 0.37 of z_0 remains at "pure noise"

    out_plain, _ = style_ddim_sample(
        model, variables, jax.random.PRNGKey(3), (2, 8, 8, 32), x,
        timesteps=3)
    out_mm, _ = style_ddim_sample(
        model, variables, jax.random.PRNGKey(3), (2, 8, 8, 32), x,
        timesteps=3, latent_stats=(mu, sigma))
    for out in (out_plain, out_mm):
        assert out.shape == (2, 64, 64, 1)
        assert np.isfinite(np.asarray(out)).all()
        assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0
    # Different init distribution => different samples (same key).
    assert float(jnp.abs(out_mm - out_plain).max()) > 1e-6
