"""Padded tail batches are mask-and-renormalized: pad rows contribute to
neither the losses nor the BatchNorm statistics, so the tail batch's loss
equals the unpadded loss (closing the documented re-weighting bias of
pad_batch_to_multiple).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from music_style_transfer_ldm_tpu.config import default_config
from music_style_transfer_ldm_tpu.losses.basic import (
    compression_loss, diffusion_loss, mse, weighted_batch_mean,
)
from music_style_transfer_ldm_tpu.parallel import (
    batch_validity_weights, make_mesh, shard_batch,
)
from music_style_transfer_ldm_tpu.training import AETrainer, LDMTrainer


def tiny_config():
    cfg = default_config()
    cfg.train = dataclasses.replace(cfg.train, batch_size=4, num_epochs=1,
                                    compute_dtype="float32")
    cfg.model = dataclasses.replace(cfg.model, image_size=64)
    return cfg


def test_weighted_batch_mean_equals_unpadded_mean(rng):
    x = rng.randn(5, 3, 3).astype(np.float32)
    pad = np.concatenate([x, 1e6 * np.ones((3, 3, 3), np.float32)])
    w = jnp.asarray([1, 1, 1, 1, 1, 0, 0, 0], jnp.float32)
    got = float(weighted_batch_mean(jnp.asarray(pad), w))
    np.testing.assert_allclose(got, x.mean(), rtol=1e-6)
    # weights=None is the plain mean
    np.testing.assert_allclose(
        float(weighted_batch_mean(jnp.asarray(x), None)), x.mean(),
        rtol=1e-6)


def test_weighted_losses_ignore_pad_rows(rng):
    a = rng.rand(5, 8, 8, 1).astype(np.float32)
    b = rng.rand(5, 8, 8, 1).astype(np.float32)
    pad_a = np.concatenate([a, 7.0 * np.ones((3, 8, 8, 1), np.float32)])
    pad_b = np.concatenate([b, np.zeros((3, 8, 8, 1), np.float32)])
    w = jnp.asarray([1.0] * 5 + [0.0] * 3)
    np.testing.assert_allclose(
        float(mse(jnp.asarray(pad_a), jnp.asarray(pad_b), w)),
        float(mse(jnp.asarray(a), jnp.asarray(b))), rtol=1e-6)
    np.testing.assert_allclose(
        float(diffusion_loss(jnp.asarray(pad_a), jnp.asarray(pad_b), w)),
        float(diffusion_loss(jnp.asarray(a), jnp.asarray(b))), rtol=1e-6)
    z = rng.randn(5, 4, 4, 2).astype(np.float32)
    pad_z = np.concatenate([z, 9.0 * np.ones((3, 4, 4, 2), np.float32)])
    np.testing.assert_allclose(
        float(compression_loss(jnp.asarray(pad_a), jnp.asarray(pad_b),
                               jnp.asarray(pad_z), None, weights=w)),
        float(compression_loss(jnp.asarray(a), jnp.asarray(b),
                               jnp.asarray(z), None)), rtol=1e-6)


def test_batch_validity_weights_shape():
    assert batch_validity_weights(8, 4) is None  # divisible: no padding
    w = batch_validity_weights(5, 4)
    np.testing.assert_array_equal(np.asarray(w),
                                  [1, 1, 1, 1, 1, 0, 0, 0])


def test_batchnorm_mask_excludes_pad_rows(rng):
    """Masked train-mode BN stats on a padded batch equal the unpadded
    batch's stats (flax BatchNorm mask support, models/autoencoder.py)."""
    from music_style_transfer_ldm_tpu.models.autoencoder import (
        SpectrogramEncoder,
    )
    enc = SpectrogramEncoder(latent_dim=32)
    x = rng.rand(5, 64, 64, 1).astype(np.float32)
    garbage = 50.0 * rng.rand(3, 64, 64, 1).astype(np.float32)
    pad = jnp.asarray(np.concatenate([x, garbage]))
    w = jnp.asarray([1.0] * 5 + [0.0] * 3)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    _, upd_ref = enc.apply(variables, jnp.asarray(x), train=True,
                           mutable=["batch_stats"])
    _, upd_pad = enc.apply(variables, pad, train=True, sample_weights=w,
                           mutable=["batch_stats"])
    for a, b in zip(jax.tree_util.tree_leaves(upd_ref["batch_stats"]),
                    jax.tree_util.tree_leaves(upd_pad["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_ae_tail_batch_loss_equals_unpadded(rng):
    """The VERDICT 'Done' criterion: a padded+masked tail batch produces
    the same loss (and BN stats) as the unpadded batch."""
    cfg = tiny_config()
    # Unpadded on a single-device mesh (5 rows can't shard over 4).
    t1 = AETrainer(cfg, mesh=make_mesh((1, 1), devices=jax.devices()[:1]),
                   perceptual=False)
    s1 = t1.init_state(0)
    # Padded + masked on a (4, 1) data-parallel mesh.
    mesh = make_mesh((4, 1), devices=jax.devices()[:4])
    t4 = AETrainer(cfg, mesh=mesh, perceptual=False)
    s4 = t4.init_state(0)

    x = rng.rand(5, 64, 64, 1).astype(np.float32)
    w = batch_validity_weights(5, mesh.shape["data"], mesh)
    xp = shard_batch(jnp.asarray(x), mesh)
    assert xp.shape[0] == 8

    s1, loss1 = t1._train_step(s1, jnp.asarray(x), None)
    s4, loss4 = t4._train_step(s4, xp, None, w)
    # rtol: cross-mesh reduction order costs ~1e-5 relative; the bias an
    # unmasked pad would introduce is orders of magnitude larger.
    np.testing.assert_allclose(float(loss4), float(loss1), rtol=1e-3)
    # Updated running BN stats match too (pad rows excluded from stats).
    for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                    jax.tree_util.tree_leaves(s4.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-6)
    # Val path renormalizes the same way.
    l1 = t1._val_step(s1, jnp.asarray(x), None)
    l4 = t4._val_step(s4, xp, None, w)
    np.testing.assert_allclose(float(l4), float(l1), rtol=1e-3)


def test_ldm_step_invariant_to_pad_row_contents(rng):
    """Full jitted LDM train step: replacing the pad rows with garbage
    changes nothing — proof that masked losses AND masked BN statistics
    exclude them (same key => identical t draws and noise)."""
    cfg = tiny_config()
    mesh = make_mesh((4, 1), devices=jax.devices()[:4])
    trainer = LDMTrainer(cfg, mesh=mesh, perceptual=True)
    state = trainer.init_state(0)
    fp = trainer._feature_params()

    content = rng.rand(5, 64, 64, 1).astype(np.float32)
    style = rng.rand(5, 64, 64, 1).astype(np.float32)
    w = batch_validity_weights(5, mesh.shape["data"], mesh)

    def padded(base, filler):
        return jax.device_put(
            jnp.asarray(np.concatenate([base, filler])),
            shard_batch(jnp.zeros((8, 64, 64, 1)), mesh).sharding)

    garbage = 10.0 * rng.rand(3, 64, 64, 1).astype(np.float32)
    key = jax.random.PRNGKey(7)
    _, m_rep = trainer._train_step(
        state, padded(content, np.repeat(content[-1:], 3, axis=0)),
        padded(style, np.repeat(style[-1:], 3, axis=0)), key, fp, w)
    state2 = trainer.init_state(0)
    _, m_garbage = trainer._train_step(
        state2, padded(content, garbage), padded(style, garbage), key, fp, w)
    for k in m_rep:
        np.testing.assert_allclose(float(m_rep[k]), float(m_garbage[k]),
                                   rtol=1e-5, err_msg=k)
