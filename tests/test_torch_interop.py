"""Numerical parity tests for reference-checkpoint migration
(interop/torch_weights.py): torch modules built from the architecture spec
are run side by side with the flax modules loaded via the converters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from music_style_transfer_ldm_tpu.interop import (  # noqa: E402
    convert_autoencoder_state_dicts, convert_decoder_state_dict,
    convert_encoder_state_dict, convert_ldm_state_dict,
    convert_style_encoder_state_dict, convert_unet_state_dict,
)
from music_style_transfer_ldm_tpu.models import (  # noqa: E402
    LDM, CrossAttention, SpectrogramDecoder, SpectrogramEncoder, StyleEncoder,
    UNet,
)


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _randomize_bn(module, rng):
    """Give running stats non-trivial values so eval-mode parity is real."""
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.tensor(
                rng.randn(m.num_features).astype(np.float32)))
            m.running_var.copy_(torch.tensor(
                np.abs(rng.randn(m.num_features)).astype(np.float32) + 0.5))


@pytest.fixture
def rng_t():
    torch.manual_seed(0)
    return np.random.RandomState(0)


def test_encoder_migration_parity(rng_t):
    t_enc = torch.nn.Sequential(
        torch.nn.Conv2d(1, 64, 3, 2, 1), torch.nn.BatchNorm2d(64),
        torch.nn.ReLU(),
        torch.nn.Conv2d(64, 128, 3, 2, 1), torch.nn.BatchNorm2d(128),
        torch.nn.ReLU(),
        torch.nn.Conv2d(128, 32, 3, 2, 1), torch.nn.BatchNorm2d(32))
    with torch.no_grad():
        _randomize_bn(t_enc, rng_t)
    t_enc.eval()

    params, stats = convert_encoder_state_dict(_sd(t_enc))
    enc = SpectrogramEncoder(latent_dim=32)
    x = rng_t.rand(2, 64, 64, 1).astype(np.float32)
    got = np.asarray(enc.apply({"params": params, "batch_stats": stats},
                               jnp.asarray(x), train=False))
    with torch.no_grad():
        want = t_enc(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1), atol=2e-4)


def test_decoder_migration_parity(rng_t):
    t_dec = torch.nn.Sequential(
        torch.nn.ConvTranspose2d(32, 128, 4, 2, 1), torch.nn.BatchNorm2d(128),
        torch.nn.ReLU(),
        torch.nn.ConvTranspose2d(128, 64, 4, 2, 1), torch.nn.BatchNorm2d(64),
        torch.nn.ReLU(),
        torch.nn.ConvTranspose2d(64, 1, 4, 2, 1), torch.nn.Tanh())
    with torch.no_grad():
        _randomize_bn(t_dec, rng_t)
    t_dec.eval()

    params, stats = convert_decoder_state_dict(_sd(t_dec))
    dec = SpectrogramDecoder(latent_dim=32)
    z = (rng_t.rand(2, 8, 8, 32).astype(np.float32) - 0.5)
    got = np.asarray(dec.apply({"params": params, "batch_stats": stats},
                               jnp.asarray(z), train=False))
    with torch.no_grad():
        want = t_dec(torch.tensor(z.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1), atol=2e-4)


def test_style_encoder_migration_parity(rng_t):
    class TStyle(torch.nn.Module):
        def __init__(self):
            super().__init__()
            chans = [(1, 64), (64, 128), (128, 256), (256, 256),
                     (256, 256), (256, 512)]
            for i, (ci, co) in enumerate(chans, 1):
                setattr(self, f"enc{i}", torch.nn.Conv2d(ci, co, 3, 2, 1))

        def forward(self, x):
            outs = []
            for i in range(1, 7):
                x = torch.relu(getattr(self, f"enc{i}")(x))
                outs.append(x)
            return outs

    t_se = TStyle().eval()
    params = convert_style_encoder_state_dict(_sd(t_se))
    se = StyleEncoder()
    x = rng_t.rand(2, 64, 64, 1).astype(np.float32)
    got = se.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        want = t_se(torch.tensor(x.transpose(0, 3, 1, 2)))
    for i in range(6):
        np.testing.assert_allclose(
            np.asarray(got[f"s{i+1}"]),
            want[i].numpy().transpose(0, 2, 3, 1), atol=2e-4)


def test_cross_attention_matches_torch_mha(rng_t):
    """Our CrossAttention must reproduce torch nn.MultiheadAttention with
    migrated packed-projection weights (ref: model.py:126-160 semantics)."""
    E, H = 256, 4
    t_mha = torch.nn.MultiheadAttention(E, H).eval()
    from music_style_transfer_ldm_tpu.interop.torch_weights import _mha
    sd = {f"attn.{k}": v for k, v in
          {k: v.detach().numpy() for k, v in t_mha.state_dict().items()
           }.items()}
    params = _mha(sd, "attn")

    B, h, w = 2, 4, 4
    q_img = rng_t.randn(B, h, w, E).astype(np.float32)
    s_img = rng_t.randn(B, h, w, E).astype(np.float32)
    ca = CrossAttention(embed_dim=E, num_heads=H)
    got = np.asarray(ca.apply({"params": params}, jnp.asarray(q_img),
                              jnp.asarray(s_img)))

    # the reference's [B,C,H,W] -> [H*W,B,C] reshape (model.py:144-150)
    def to_tokens(x):
        t = torch.tensor(x.transpose(0, 3, 1, 2))
        return t.permute(2, 3, 0, 1).reshape(h * w, B, E)

    with torch.no_grad():
        out, _ = t_mha(to_tokens(q_img), to_tokens(s_img), to_tokens(s_img))
    want = out.reshape(h, w, B, E).permute(2, 0, 1, 3).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4)


def _torch_unet_shapes_sd(rng):
    """A flat state dict with the reference UNet's exact key names and
    shapes (random values) for structure conversion."""
    sd = {}

    def conv(key, ci, co, k):
        sd[f"{key}.weight"] = rng.randn(co, ci, k, k).astype(np.float32)
        sd[f"{key}.bias"] = rng.randn(co).astype(np.float32)

    def convt(key, ci, co, k):
        sd[f"{key}.weight"] = rng.randn(ci, co, k, k).astype(np.float32)
        sd[f"{key}.bias"] = rng.randn(co).astype(np.float32)

    def linear(key, ci, co):
        sd[f"{key}.weight"] = rng.randn(co, ci).astype(np.float32)
        sd[f"{key}.bias"] = rng.randn(co).astype(np.float32)

    def mha(key, e):
        sd[f"{key}.in_proj_weight"] = rng.randn(3 * e, e).astype(np.float32)
        sd[f"{key}.in_proj_bias"] = rng.randn(3 * e).astype(np.float32)
        sd[f"{key}.out_proj.weight"] = rng.randn(e, e).astype(np.float32)
        sd[f"{key}.out_proj.bias"] = rng.randn(e).astype(np.float32)

    linear("time_mlp.1", 128, 128)
    linear("time_mlp.3", 128, 128)
    conv("enc1", 32, 64, 3)
    conv("enc2", 64, 128, 3)
    conv("enc3", 128, 256, 3)
    conv("enc4", 256, 512, 3)
    mha("cross_attention1.multihead_attn", 512)
    mha("cross_attention2.multihead_attn", 256)
    conv("bottleneck", 512, 512, 3)
    convt("dec4", 512, 256, 3)
    convt("dec3", 256, 128, 3)
    convt("dec2", 128, 64, 3)
    conv("dec1", 64, 32, 3)
    return sd


def test_unet_conversion_structure(rng_t):
    params = convert_unet_state_dict(_torch_unet_shapes_sd(rng_t))
    unet = UNet(in_channels=32, out_channels=32)
    z = jnp.zeros((1, 16, 16, 32))
    emb = {f"s{i}": jnp.zeros(s) for i, s in enumerate(
        [(1, 64, 64, 64), (1, 32, 32, 128), (1, 16, 16, 256),
         (1, 8, 8, 256), (1, 4, 4, 256), (1, 2, 2, 512)], 1)}
    ref = unet.init(jax.random.PRNGKey(0), z, jnp.zeros((1,), jnp.int32),
                    emb)["params"]
    got_shapes = jax.tree_util.tree_map(lambda v: tuple(v.shape), params)
    ref_shapes = jax.tree_util.tree_map(lambda v: tuple(v.shape), ref)
    assert got_shapes == ref_shapes
    # and it runs
    out = unet.apply({"params": params}, z, jnp.zeros((1,), jnp.int32), emb)
    assert out.shape == z.shape


def test_full_ldm_state_dict_conversion(rng_t):
    """Prefix-split conversion of a full reference checkpoint layout runs
    through the actual LDM module."""
    t_enc = torch.nn.Sequential(
        torch.nn.Conv2d(1, 64, 3, 2, 1), torch.nn.BatchNorm2d(64),
        torch.nn.ReLU(), torch.nn.Conv2d(64, 128, 3, 2, 1),
        torch.nn.BatchNorm2d(128), torch.nn.ReLU(),
        torch.nn.Conv2d(128, 32, 3, 2, 1), torch.nn.BatchNorm2d(32))
    t_dec = torch.nn.Sequential(
        torch.nn.ConvTranspose2d(32, 128, 4, 2, 1),
        torch.nn.BatchNorm2d(128), torch.nn.ReLU(),
        torch.nn.ConvTranspose2d(128, 64, 4, 2, 1), torch.nn.BatchNorm2d(64),
        torch.nn.ReLU(), torch.nn.ConvTranspose2d(64, 1, 4, 2, 1),
        torch.nn.Tanh())
    flat = {}
    # reference nests the Sequentials under attributes of the same name
    for k, v in _sd(t_enc).items():
        flat[f"encoder.encoder.{k}"] = v
    for k, v in _sd(t_dec).items():
        flat[f"decoder.decoder.{k}"] = v
    for k, v in _torch_unet_shapes_sd(rng_t).items():
        flat[f"unet.{k}"] = v
    chans = [(1, 64), (64, 128), (128, 256), (256, 256), (256, 256),
             (256, 512)]
    for i, (ci, co) in enumerate(chans, 1):
        flat[f"style_encoder.enc{i}.weight"] = rng_t.randn(
            co, ci, 3, 3).astype(np.float32)
        flat[f"style_encoder.enc{i}.bias"] = rng_t.randn(co).astype(
            np.float32)
    flat["noise_scheduler.beta_t"] = np.linspace(1e-4, 0.02, 200)

    payload = convert_ldm_state_dict(flat)
    model = LDM(latent_dim=32, num_timesteps=200)
    x = jnp.asarray(rng_t.rand(1, 128, 128, 1).astype(np.float32))
    out = model.apply(
        {"params": payload["params"], "batch_stats": payload["batch_stats"]},
        x, x, jnp.zeros((1,), jnp.int32),
        rngs={"diffusion": jax.random.PRNGKey(0)})
    assert out["reconstructed"].shape == x.shape
    assert np.isfinite(np.asarray(out["reconstructed"])).all()


def test_autoencoder_pth_pair_conversion(rng_t):
    """encoder.pth + decoder.pth pair -> trainer-consumable AE payload with
    end-to-end numeric parity of the reconstruction."""
    t_enc = torch.nn.Sequential(
        torch.nn.Conv2d(1, 64, 3, 2, 1), torch.nn.BatchNorm2d(64),
        torch.nn.ReLU(), torch.nn.Conv2d(64, 128, 3, 2, 1),
        torch.nn.BatchNorm2d(128), torch.nn.ReLU(),
        torch.nn.Conv2d(128, 32, 3, 2, 1), torch.nn.BatchNorm2d(32))
    t_dec = torch.nn.Sequential(
        torch.nn.ConvTranspose2d(32, 128, 4, 2, 1),
        torch.nn.BatchNorm2d(128), torch.nn.ReLU(),
        torch.nn.ConvTranspose2d(128, 64, 4, 2, 1), torch.nn.BatchNorm2d(64),
        torch.nn.ReLU(), torch.nn.ConvTranspose2d(64, 1, 4, 2, 1),
        torch.nn.Tanh())
    with torch.no_grad():
        _randomize_bn(t_enc, rng_t)
        _randomize_bn(t_dec, rng_t)
    t_enc.eval()
    t_dec.eval()
    # reference state dicts carry the attribute prefix
    enc_sd = {f"encoder.{k}": v for k, v in _sd(t_enc).items()}
    dec_sd = {f"decoder.{k}": v for k, v in _sd(t_dec).items()}
    payload = convert_autoencoder_state_dicts(enc_sd, dec_sd)

    enc = SpectrogramEncoder(latent_dim=32)
    dec = SpectrogramDecoder(latent_dim=32)
    x = rng_t.rand(2, 128, 128, 1).astype(np.float32)
    z = enc.apply({"params": payload["params"]["encoder"],
                   "batch_stats": payload["batch_stats"]["encoder"]},
                  jnp.asarray(x), train=False)
    got = np.asarray(dec.apply(
        {"params": payload["params"]["decoder"],
         "batch_stats": payload["batch_stats"]["decoder"]}, z, train=False))
    with torch.no_grad():
        want = t_dec(t_enc(torch.tensor(x.transpose(0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1), atol=5e-4)


def test_k3_transpose_conv_migration_parity(rng_t):
    """The UNet decoder deconv path (ConvTranspose2d k3 s2 p1 op1 ->
    convT_k3 VALID + crop with flipped kernel) must be numerically exact —
    a wrong flip or crop offset would de-align the UNet's additive skips
    for migrated checkpoints."""
    from music_style_transfer_ldm_tpu.interop.torch_weights import _convT
    from music_style_transfer_ldm_tpu.models.layers import (
        convT_k3, crop_k3_output,
    )
    t = torch.nn.ConvTranspose2d(8, 6, 3, stride=2, padding=1,
                                 output_padding=1).eval()
    sd = {f"d.{k}": v.detach().numpy() for k, v in t.state_dict().items()}
    params = _convT(sd, "d")
    mod = convT_k3(6)
    x = rng_t.randn(2, 5, 7, 8).astype(np.float32)
    got = np.asarray(crop_k3_output(
        mod.apply({"params": params}, jnp.asarray(x))))
    with torch.no_grad():
        want = t(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    assert got.shape == tuple(np.transpose(want, (0, 2, 3, 1)).shape)
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1), atol=1e-5)


def test_vggish_conversion_numerical_parity(rng_t):
    """convert_torchvggish_state_dict must reproduce the torch conv trunk's
    per-ReLU feature maps (the actual tensors the style loss consumes)."""
    from music_style_transfer_ldm_tpu.losses import (
        VGGishFeatures, convert_torchvggish_state_dict,
    )
    # torchvggish `features` topology: conv/relu/pool stack with convs at
    # Sequential indices 0,3,6,8,11,13.
    t = torch.nn.Sequential(
        torch.nn.Conv2d(1, 64, 3, padding=1), torch.nn.ReLU(),
        torch.nn.MaxPool2d(2, 2),
        torch.nn.Conv2d(64, 128, 3, padding=1), torch.nn.ReLU(),
        torch.nn.MaxPool2d(2, 2),
        torch.nn.Conv2d(128, 256, 3, padding=1), torch.nn.ReLU(),
        torch.nn.Conv2d(256, 256, 3, padding=1), torch.nn.ReLU(),
        torch.nn.MaxPool2d(2, 2),
        torch.nn.Conv2d(256, 512, 3, padding=1), torch.nn.ReLU(),
        torch.nn.Conv2d(512, 512, 3, padding=1), torch.nn.ReLU(),
        torch.nn.MaxPool2d(2, 2)).eval()
    sd = {f"features.{k}": v.detach().numpy()
          for k, v in t.state_dict().items()}
    params = convert_torchvggish_state_dict(sd)

    x = rng_t.rand(2, 64, 64, 1).astype(np.float32)
    feats = VGGishFeatures().apply({"params": params}, jnp.asarray(x))

    with torch.no_grad():
        cur = torch.tensor(x.transpose(0, 3, 1, 2))
        torch_feats = []
        for layer in t:
            cur = layer(cur)
            if isinstance(layer, torch.nn.ReLU):
                torch_feats.append(cur.numpy().transpose(0, 2, 3, 1))
    assert len(feats) == len(torch_feats) == 6
    for got, want in zip(feats, torch_feats):
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)
