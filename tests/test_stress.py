"""Concurrency stress + edge-case tests for the native loader and optimizer
plumbing."""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_style_transfer_ldm_tpu.datasets.packed import (
    PackedSpectrogramDataset, build_native, write_pack,
)


@pytest.fixture
def pack(tmp_path, rng):
    images = rng.randint(0, 256, (64, 128, 130), np.uint8)
    labels = (np.arange(64) % 4).astype(np.uint16)
    write_pack(tmp_path / "s.spk", images, labels, ["a", "b", "c", "d"])
    return tmp_path / "s.spk", images


def test_concurrent_native_gathers(pack, rng):
    """Many threads hammering back-to-back gathers: exercises the worker
    pool's per-task isolation (regression for the cross-epoch race)."""
    path, images = pack
    if build_native() is None:
        pytest.skip("no C++ toolchain")
    ds = PackedSpectrogramDataset(path)
    assert ds.native
    errors = []

    def worker(seed):
        r = np.random.RandomState(seed)
        try:
            for _ in range(50):
                idx = r.randint(0, 64, 32).astype(np.int64)
                x, y = ds.gather(idx)
                # verify one random row against ground truth
                k = int(r.randint(0, 32))
                expect = images[idx[k], :128, :128].astype(np.float32) / 255
                np.testing.assert_allclose(x[k, :, :, 0], expect, atol=1e-7)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(s,)) for s in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    ds.close()


def test_native_out_of_range_raises(pack):
    path, _ = pack
    if build_native() is None:
        pytest.skip("no C++ toolchain")
    ds = PackedSpectrogramDataset(path)
    with pytest.raises(IndexError):
        ds.gather(np.asarray([0, 64], np.int64))
    with pytest.raises(IndexError):
        ds.gather(np.asarray([-1], np.int64))
    ds.close()


def test_set_learning_rate_plain_and_masked():
    import optax
    from music_style_transfer_ldm_tpu.training.optim import (
        make_optimizer, set_learning_rate,
    )
    params = {"a": jnp.ones(3), "encoder": {"w": jnp.ones(2)}}

    plain = make_optimizer("adamw", 1e-3)
    st = plain.init(params)
    st = set_learning_rate(st, 5e-4)
    assert float(st.hyperparams["learning_rate"]) == pytest.approx(5e-4)

    masked = make_optimizer(
        "adam", 1e-3,
        freeze_mask=lambda p: {k: jax.tree_util.tree_map(
            lambda _: k == "encoder", v) for k, v in p.items()})
    st = masked.init(params)
    st = set_learning_rate(st, 1e-5)
    inner = st.inner_states["train"].inner_state
    assert float(inner.hyperparams["learning_rate"]) == pytest.approx(1e-5)
    # and an update still runs after the LR write
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = masked.update(grads, st, params)
    assert float(jnp.abs(updates["encoder"]["w"]).max()) == 0.0  # frozen
    assert float(jnp.abs(updates["a"]).max()) > 0.0


def test_transfer_single_step_edge():
    """num_timesteps=1: empty DDIM grid — decode of the noised latent."""
    from music_style_transfer_ldm_tpu.models.ldm import (
        LDM, content_style_transfer,
    )
    model = LDM(latent_dim=32, num_timesteps=20)
    x = jnp.zeros((1, 128, 128, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        x, x, jnp.zeros((1,), jnp.int32))
    decoded, z_t_dec, _ = content_style_transfer(
        model, variables, jax.random.PRNGKey(0), x, x, num_timesteps=1)
    assert decoded.shape == x.shape
    # exceeding the schedule is a clear error
    with pytest.raises(ValueError, match="exceeds the schedule"):
        content_style_transfer(model, variables, jax.random.PRNGKey(0),
                               x, x, num_timesteps=21)
