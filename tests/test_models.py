"""Shape/parameter-parity tests for the model zoo, mirroring the reference's
shape unit tests (ref: models/tests.py:153-456) plus exact parameter-count
gates against report/results.tex:98-102."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_style_transfer_ldm_tpu.models import (
    LDM, CrossAttention, SpectrogramDecoder, SpectrogramEncoder, StyleEncoder,
    UNet,
)
from music_style_transfer_ldm_tpu.models.layers import (
    SinusoidalPositionEmbeddings,
)


def n_params(tree):
    return sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree))


@pytest.fixture(scope="module")
def keys():
    return jax.random.split(jax.random.PRNGKey(0), 8)


def test_encoder_dimensions_and_params(keys):
    # ref: tests.py:153-174 expects [B, 32, 16, 16]; NHWC here.
    enc = SpectrogramEncoder(latent_dim=32)
    x = jnp.zeros((4, 128, 128, 1))
    variables = enc.init(keys[0], x)
    z = enc.apply(variables, x)
    assert z.shape == (4, 16, 16, 32)
    # Exact parity: 111,840 trainable params (report/results.tex:98).
    assert n_params(variables["params"]) == 111840


def test_decoder_dimensions_range_and_params(keys):
    dec = SpectrogramDecoder(latent_dim=32)
    z = jax.random.normal(keys[1], (4, 16, 16, 32))
    variables = dec.init(keys[1], z)
    x = dec.apply(variables, z)
    assert x.shape == (4, 128, 128, 1)
    assert (np.asarray(x) >= -1).all() and (np.asarray(x) <= 1).all()
    # Exact parity: 198,209 params (report/results.tex:99).
    assert n_params(variables["params"]) == 198209


def test_autoencoder_roundtrip_shape(keys):
    enc = SpectrogramEncoder(latent_dim=32)
    dec = SpectrogramDecoder(latent_dim=32)
    x = jax.random.uniform(keys[2], (2, 128, 128, 1))
    ev = enc.init(keys[2], x)
    dv = dec.init(keys[3], enc.apply(ev, x))
    out = dec.apply(dv, enc.apply(ev, x))
    assert out.shape == x.shape


def test_style_encoder_dimensions_and_params(keys):
    # ref: tests.py:378-414 expected multi-resolution shapes.
    se = StyleEncoder(num_filters=64)
    x = jnp.zeros((4, 128, 128, 1))
    variables = se.init(keys[4], x)
    embs = se.apply(variables, x)
    expected = {
        "s1": (4, 64, 64, 64),
        "s2": (4, 32, 32, 128),
        "s3": (4, 16, 16, 256),
        "s4": (4, 8, 8, 256),
        "s5": (4, 4, 4, 256),
        "s6": (4, 2, 2, 512),
    }
    assert {k: v.shape for k, v in embs.items()} == expected
    # Exact parity: 2,729,984 params (report/results.tex:100).
    assert n_params(variables["params"]) == 2729984


def test_cross_attention_params_and_shape(keys):
    ca = CrossAttention(embed_dim=512, num_heads=4)
    q = jax.random.normal(keys[5], (2, 2, 2, 512))
    s = jax.random.normal(keys[6], (2, 2, 2, 512))
    variables = ca.init(keys[5], q, s)
    out = ca.apply(variables, q, s)
    assert out.shape == q.shape
    # torch MHA(512): packed in_proj 3*512*(512+1) + out 512*(512+1)
    assert n_params(variables["params"]) == 4 * 512 * 513  # 1,050,624


def test_unet_shape_preservation_and_params(keys):
    # ref: tests.py:424-456 — UNet preserves latent shape.
    unet = UNet(in_channels=32, out_channels=32, num_filters=64)
    z = jax.random.normal(keys[7], (4, 16, 16, 32))
    t = jnp.array([0, 10, 100, 199])
    style = {
        "s5": jnp.ones((4, 4, 4, 256)),
        "s6": jnp.ones((4, 2, 2, 512)),
        # s1..s4 unused by the UNet (ref: model.py:211,214) but part of the
        # pyramid API.
        "s1": jnp.ones((4, 64, 64, 64)),
        "s2": jnp.ones((4, 32, 32, 128)),
        "s3": jnp.ones((4, 16, 16, 256)),
        "s4": jnp.ones((4, 8, 8, 256)),
    }
    variables = unet.init(jax.random.PRNGKey(9), z, t, style)
    out = unet.apply(variables, z, t, style)
    assert out.shape == z.shape
    # UNet conv/mlp trunk + both cross-attention blocks:
    # 5,527,712 + 1,050,624 + 263,168 = 6,841,504 (derived from the reference
    # architecture definition, model.py:163-231; the report's 8,155,296
    # includes double-counted attention parameters).
    assert n_params(variables["params"]) == 6841504


def test_sinusoidal_time_embedding():
    mod = SinusoidalPositionEmbeddings(128)
    t = jnp.array([0.0, 1.0, 199.0])
    emb = mod.apply({}, t)
    assert emb.shape == (3, 128)
    e = np.asarray(emb)
    # t=0: all sins 0, all cos 1 (ref: model.py:239-246 layout sin||cos).
    np.testing.assert_allclose(e[0, :64], 0.0, atol=1e-7)
    np.testing.assert_allclose(e[0, 64:], 1.0, atol=1e-7)


def test_ldm_forward_outputs(keys):
    ldm = LDM(latent_dim=32, num_timesteps=200)
    x = jax.random.uniform(keys[0], (2, 128, 128, 1))
    style = jax.random.uniform(keys[1], (2, 128, 128, 1))
    t = jnp.array([5, 150])
    variables = ldm.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        x, style, t)
    out = ldm.apply(variables, x, style, t,
                    rngs={"diffusion": jax.random.PRNGKey(2)})
    assert set(out) == {"z_t", "noise", "noise_pred", "z_0", "reconstructed"}
    assert out["z_0"].shape == (2, 16, 16, 32)
    assert out["reconstructed"].shape == x.shape
    r = np.asarray(out["reconstructed"])
    assert r.min() >= 0.0 and r.max() <= 1.0  # rescaled (ref: model.py:371)


def test_ldm_total_trainable_params(keys):
    ldm = LDM(latent_dim=32)
    x = jnp.zeros((1, 128, 128, 1))
    variables = ldm.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        x, x, jnp.zeros((1,), jnp.int32))
    total = n_params(variables["params"])
    # encoder + decoder + style + unet(incl. attention) =
    # 111840 + 198209 + 2729984 + 6841504
    assert total == 9881537


def test_models_are_width_agnostic(keys):
    """Long-context capability: the conv/attention stack accepts wider time
    axes (any W divisible by 8), e.g. 128x256 two-chunk spectrograms."""
    enc = SpectrogramEncoder(latent_dim=32)
    dec = SpectrogramDecoder(latent_dim=32)
    se = StyleEncoder()
    unet = UNet(in_channels=32, out_channels=32)
    x = jnp.zeros((2, 128, 256, 1))
    ev = enc.init(keys[0], x)
    z = enc.apply(ev, x)
    assert z.shape == (2, 16, 32, 32)
    dv = dec.init(keys[1], z)
    assert dec.apply(dv, z).shape == (2, 128, 256, 1)
    sv = se.init(keys[2], x)
    emb = se.apply(sv, x)
    assert emb["s5"].shape == (2, 4, 8, 256)
    uv = unet.init(jax.random.PRNGKey(3), z,
                   jnp.zeros((2,), jnp.int32), emb)
    out = unet.apply(uv, z, jnp.zeros((2,), jnp.int32), emb)
    assert out.shape == z.shape


def test_load_ldm_fallback(tmp_path):
    """load_ldm: full checkpoint path with fallback to AE-only weights
    (ref: model.py:262-352 semantics, made explicit)."""
    import dataclasses
    from music_style_transfer_ldm_tpu.config import default_config
    from music_style_transfer_ldm_tpu.models.ldm import load_ldm
    from music_style_transfer_ldm_tpu.training import AETrainer
    from music_style_transfer_ldm_tpu.training import checkpoint as ckpt_lib

    cfg = default_config()
    cfg.model = dataclasses.replace(cfg.model, image_size=64)
    ae = AETrainer(cfg, perceptual=False)
    state = ae.init_state(0)
    ckpt_lib.save_autoencoder(tmp_path / "ae", state)

    # Missing full checkpoint -> falls back to the AE weights.
    model, variables = load_ldm(cfg, full_checkpoint=str(tmp_path / "nope"),
                                autoencoder_checkpoint=str(tmp_path / "ae"),
                                dtype=jnp.float32)
    for a, b in zip(jax.tree_util.tree_leaves(state.params["encoder"]),
                    jax.tree_util.tree_leaves(
                        variables["params"]["encoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # And the result actually runs a forward pass.
    x = jnp.zeros((1, 64, 64, 1))
    out = model.apply(variables, x, x, jnp.zeros((1,), jnp.int32),
                      rngs={"diffusion": jax.random.PRNGKey(0)})
    assert out["reconstructed"].shape == x.shape
