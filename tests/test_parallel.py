"""Mesh/sharding unit tests: dp padding, tp rules, sequence parallelism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_style_transfer_ldm_tpu.models import SpectrogramEncoder, UNet
from music_style_transfer_ldm_tpu.parallel import (
    make_mesh, sequence_sharding, shard_batch,
)
from music_style_transfer_ldm_tpu.parallel.sharding import (
    pad_batch_to_multiple, param_partition_spec,
)


def test_make_mesh_shapes():
    m = make_mesh((-1, 1))
    assert m.shape["data"] == 8 and m.shape["model"] == 1
    m = make_mesh((2, 4))
    assert m.shape["data"] == 2 and m.shape["model"] == 4
    with pytest.raises(ValueError):
        make_mesh((3, 2))  # 6 != 8


def test_pad_batch_to_multiple():
    x = jnp.arange(10).reshape(5, 2)
    y = pad_batch_to_multiple(x, 4)
    assert y.shape == (8, 2)
    np.testing.assert_array_equal(np.asarray(y[5:]),
                                  np.tile(np.asarray(x[-1:]), (3, 1)))
    assert pad_batch_to_multiple(x, 5) is x  # already divisible


def test_param_partition_rules():
    mesh = make_mesh((2, 4))
    wide = jnp.zeros((3, 3, 64, 128))
    narrow = jnp.zeros((3, 3, 1, 64))
    assert param_partition_spec((), wide, mesh)[-1] == "model"
    assert param_partition_spec((), narrow, mesh) == jax.sharding.PartitionSpec()


def test_sequence_parallel_conv_matches_replicated(rng):
    """Time-axis sharding over 'model': GSPMD halo exchange must reproduce
    the replicated result exactly (the 'sp' dimension for wide clips)."""
    mesh = make_mesh((2, 4))
    enc = SpectrogramEncoder(32)
    x = jnp.asarray(rng.rand(4, 128, 512, 1).astype(np.float32))
    v = enc.init(jax.random.PRNGKey(0), x)
    xs = shard_batch(x, mesh, sequence_parallel=True)
    assert xs.sharding.spec == sequence_sharding(mesh).spec
    f = jax.jit(lambda vv, a: enc.apply(vv, a))
    out_sharded = np.asarray(f(v, xs))
    out_repl = np.asarray(f(v, x))
    np.testing.assert_allclose(out_sharded, out_repl, rtol=1e-5, atol=1e-5)


def test_sequence_parallel_unet(rng):
    """The full UNet runs with a time-sharded latent (wide clip case)."""
    mesh = make_mesh((2, 4))
    unet = UNet(in_channels=32, out_channels=32)
    z = jnp.asarray(rng.rand(2, 16, 64, 32).astype(np.float32))  # 4 chunks
    emb = {
        "s5": jnp.ones((2, 4, 16, 256)), "s6": jnp.ones((2, 2, 8, 512)),
        "s1": jnp.ones((2, 64, 256, 64)), "s2": jnp.ones((2, 32, 128, 128)),
        "s3": jnp.ones((2, 16, 64, 256)), "s4": jnp.ones((2, 8, 32, 256)),
    }
    v = unet.init(jax.random.PRNGKey(0), z, jnp.zeros((2,), jnp.int32), emb)
    zs = shard_batch(z, mesh, sequence_parallel=True)
    out = jax.jit(lambda vv, a: unet.apply(
        vv, a, jnp.zeros((2,), jnp.int32), emb))(v, zs)
    assert out.shape == z.shape
    assert np.isfinite(np.asarray(out)).all()


def test_sequence_parallel_pads_odd_width(rng):
    """Widths not divisible by the model axis are zero-padded (the dataset
    builder's silence-pad convention), not an error."""
    mesh = make_mesh((2, 4))
    x = jnp.asarray(rng.rand(4, 64, 130, 1).astype(np.float32))
    xs = shard_batch(x, mesh, sequence_parallel=True)
    assert xs.shape == (4, 64, 132, 1)  # padded up to /4
    np.testing.assert_allclose(np.asarray(xs[:, :, :130]), np.asarray(x),
                               atol=1e-7)
    assert float(jnp.abs(xs[:, :, 130:]).max()) == 0.0


def test_sequence_parallel_train_step_matches_replicated(rng):
    """Sequence-parallel TRAINING parity (VERDICT r04 #4): the full LDM
    train step — losses, GRADIENTS, BN stat update, Adam update — on a
    (2,4) mesh with width-sharded wide batches matches the unsharded
    single-device step.  The risk surface is conv halo exchange + global
    BN reductions + weighted losses under GSPMD; identical PRNG keys make
    the t draws and q-sample noise bit-equal, so any divergence is a
    sharding artifact.

    Parity is asserted on the GRADIENTS (the quantity GSPMD must get
    right): post-Adam params are only sanity-bounded, because Adam
    normalizes each grad by sqrt(v) — for near-zero bias grads that
    amplifies benign cross-shard reduction-order noise (~1e-7) to O(lr)
    sign flips, which says nothing about sharding correctness."""
    import dataclasses

    from music_style_transfer_ldm_tpu.config import default_config
    from music_style_transfer_ldm_tpu.training import LDMTrainer

    cfg = default_config()
    cfg.train = dataclasses.replace(cfg.train, batch_size=4,
                                    compute_dtype="float32")
    cfg.model = dataclasses.replace(cfg.model, image_size=64)

    # Wide clip: 64 mels x 256 frames (4 chunks) — the sp use case.
    content = rng.rand(4, 64, 256, 1).astype(np.float32)
    style = rng.rand(4, 64, 256, 1).astype(np.float32)
    key = jax.random.PRNGKey(11)
    t = jnp.asarray([3, 50, 120, 199], jnp.int32)

    def loss_and_grads(trainer, state, c, s):
        def loss_fn(params):
            return trainer._losses(params, state.batch_stats, c, s, t,
                                   jax.random.PRNGKey(5),
                                   trainer._feature_params())
        (_, (metrics, new_stats)), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(state.params)
        return metrics, new_stats, grads

    ref = LDMTrainer(cfg, mesh=make_mesh((1, 1), devices=jax.devices()[:1]),
                     perceptual=True)
    s_ref = ref.init_state(0)
    m_ref, bn_ref, g_ref = loss_and_grads(ref, s_ref, jnp.asarray(content),
                                          jnp.asarray(style))

    cfg_sp = dataclasses.replace(cfg)
    cfg_sp.mesh = dataclasses.replace(cfg.mesh, mesh_shape=(2, 4),
                                      sequence_parallel=True)
    mesh = make_mesh((2, 4))
    sp = LDMTrainer(cfg_sp, mesh=mesh, perceptual=True)
    s_sp = sp.init_state(0)
    c_sh = shard_batch(jnp.asarray(content), mesh, sequence_parallel=True)
    st_sh = shard_batch(jnp.asarray(style), mesh, sequence_parallel=True)
    assert c_sh.sharding.spec == sequence_sharding(mesh).spec
    m_sp, bn_sp, g_sp = loss_and_grads(sp, s_sp, c_sh, st_sh)

    # Same losses...
    for k in m_ref:
        np.testing.assert_allclose(float(m_sp[k]), float(m_ref[k]),
                                   rtol=2e-4, err_msg=k)
    # ...same gradients (scale-aware: rtol catches halo/BN bugs on the
    # meaningful elements, atol absorbs reduction-order noise on the
    # near-zero ones)...
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_sp)):
        a, b = np.asarray(a), np.asarray(b)
        scale = float(np.abs(a).max())
        np.testing.assert_allclose(b, a, rtol=5e-3,
                                   atol=1e-8 + 2e-4 * scale,
                                   err_msg=jax.tree_util.keystr(pa))
    # ...and same updated BN statistics.
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(bn_ref),
            jax.tree_util.tree_leaves_with_path(bn_sp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(pa))

    # Full jitted train step runs under the sp sharding; post-Adam params
    # stay within the 2*lr Adam-noise envelope of the replicated step
    # (a real halo/BN bug diverges at O(1)).
    s_ref2, _ = ref._train_step(s_ref, jnp.asarray(content),
                                jnp.asarray(style), key,
                                ref._feature_params())
    s_sp2, m_step = sp._train_step(s_sp, c_sh, st_sh, key,
                                   sp._feature_params())
    assert np.isfinite(float(m_step["total_loss"]))
    lr = cfg.train.learning_rate
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(s_ref2.params),
            jax.tree_util.tree_leaves_with_path(s_sp2.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=2.0 * lr,
                                   err_msg=jax.tree_util.keystr(pa))


def test_sequence_parallel_trainer_epoch_places_width_sharded(rng):
    """config.mesh.sequence_parallel=True makes the trainer's epoch loop
    width-shard every placed batch (the wiring train_epoch uses)."""
    import dataclasses

    from music_style_transfer_ldm_tpu.config import default_config
    from music_style_transfer_ldm_tpu.training import LDMTrainer

    cfg = default_config()
    cfg.train = dataclasses.replace(cfg.train, batch_size=2,
                                    compute_dtype="float32")
    cfg.model = dataclasses.replace(cfg.model, image_size=64)
    cfg.mesh = dataclasses.replace(cfg.mesh, mesh_shape=(2, 4),
                                   sequence_parallel=True)
    mesh = make_mesh((2, 4))
    trainer = LDMTrainer(cfg, mesh=mesh, perceptual=False)
    state = trainer.init_state(0)
    batch = [((rng.rand(2, 64, 256, 1).astype(np.float32), 0),
              (rng.rand(2, 64, 256, 1).astype(np.float32), 1))]
    state, avgs = trainer.train_epoch(state, batch, 0, jax.random.PRNGKey(0))
    assert np.isfinite(avgs["total_loss"])


def test_sequence_parallel_wide_clip_forward(rng):
    """The sp use case at real width: a 128x1024 spectrogram (a ~24 s
    clip as ONE window, 8x the training width) runs the full
    encode -> UNet -> decode stack with the time axis sharded over
    'model' and matches the replicated forward."""
    from music_style_transfer_ldm_tpu.models.ldm import LDM

    mesh = make_mesh((2, 4))
    model = LDM(latent_dim=32, num_timesteps=20)
    x = jnp.asarray(rng.rand(2, 128, 1024, 1).astype(np.float32))
    style = jnp.asarray(rng.rand(2, 128, 1024, 1).astype(np.float32))
    t = jnp.zeros((2,), jnp.int32)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "diffusion": jax.random.PRNGKey(1)}, x[:, :, :128],
                   style[:, :, :128], t)

    def fwd(xx, ss):
        out = model.apply(v, xx, ss, t,
                          rngs={"diffusion": jax.random.PRNGKey(2)})
        return out["noise_pred"], out["reconstructed"]

    xs = shard_batch(x, mesh, sequence_parallel=True)
    st = shard_batch(style, mesh, sequence_parallel=True)
    np_sh, rec_sh = jax.jit(fwd)(xs, st)
    assert rec_sh.shape == (2, 128, 1024, 1)
    np_rep, rec_rep = jax.jit(fwd)(x, style)
    np.testing.assert_allclose(np.asarray(rec_sh), np.asarray(rec_rep),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(np_sh), np.asarray(np_rep),
                               rtol=1e-4, atol=2e-5)
