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
