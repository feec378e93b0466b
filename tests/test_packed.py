"""specpack native dataset tests: format round-trip, native/numpy parity,
crop+normalize correctness."""

import numpy as np
import pytest

from music_style_transfer_ldm_tpu.datasets.packed import (
    PackedSpectrogramDataset, build_native, build_pack, write_pack,
)


@pytest.fixture
def pack_file(tmp_path, rng):
    images = rng.randint(0, 256, (20, 128, 130), np.uint8)
    labels = np.arange(20, dtype=np.uint16) % 3
    write_pack(tmp_path / "d.spk", images, labels,
               ["guitar", "piano", "violin"])
    return tmp_path / "d.spk", images, labels


def test_numpy_reader_roundtrip(pack_file):
    path, images, labels = pack_file
    ds = PackedSpectrogramDataset(path, use_native=False)
    assert not ds.native
    assert len(ds) == 20
    assert ds.classes == ["guitar", "piano", "violin"]
    x, y = ds.gather(np.asarray([0, 7, 19]))
    assert x.shape == (3, 128, 128, 1) and x.dtype == np.float32
    np.testing.assert_allclose(
        x[1, :, :, 0], images[7, :128, :128].astype(np.float32) / 255.0,
        atol=1e-7)
    np.testing.assert_array_equal(y, labels[[0, 7, 19]])


def test_native_matches_numpy(pack_file):
    path, images, labels = pack_file
    if build_native() is None:
        pytest.skip("no C++ toolchain")
    nat = PackedSpectrogramDataset(path, use_native=True)
    ref = PackedSpectrogramDataset(path, use_native=False)
    assert nat.native, "native library should have loaded"
    idx = np.asarray([3, 1, 4, 1, 5, 9, 2, 6], np.int64)
    xn, yn = nat.gather(idx)
    xr, yr = ref.gather(idx)
    np.testing.assert_array_equal(yn, yr)
    np.testing.assert_allclose(xn, xr, atol=1e-7)
    assert nat.classes == ref.classes
    nat.close()


def test_native_large_batch_parallel(pack_file, rng):
    path, _, _ = pack_file
    if build_native() is None:
        pytest.skip("no C++ toolchain")
    ds = PackedSpectrogramDataset(path)
    idx = rng.randint(0, 20, 512).astype(np.int64)
    x, y = ds.gather(idx)
    assert x.shape == (512, 128, 128, 1)
    # spot-check a few rows against single gathers
    for k in [0, 100, 511]:
        xi, yi = ds.gather(idx[k:k + 1])
        np.testing.assert_array_equal(x[k], xi[0])
    ds.close()


def test_build_pack_from_folder(tmp_path, rng):
    from PIL import Image
    for label in ["a", "b"]:
        d = tmp_path / "imgs" / label
        d.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(rng.randint(0, 256, (128, 130), np.uint8),
                            mode="L").save(d / f"{i}.png")
    n = build_pack(tmp_path / "imgs", tmp_path / "out.spk")
    assert n == 6
    ds = PackedSpectrogramDataset(tmp_path / "out.spk", use_native=False)
    assert ds.classes == ["a", "b"]
    x, y = ds.gather(np.arange(6))
    assert list(y) == [0, 0, 0, 1, 1, 1]


def test_bad_magic_rejected(tmp_path):
    (tmp_path / "junk.spk").write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError):
        PackedSpectrogramDataset(tmp_path / "junk.spk", use_native=False)


def test_getitem_matches_folder_semantics(pack_file):
    path, images, labels = pack_file
    ds = PackedSpectrogramDataset(path, use_native=False)
    x, y = ds[5]
    assert x.shape == (128, 128, 1)
    assert y == int(labels[5])


def test_packed_pair_dataset_matches_folder(tmp_path, rng):
    """PackedPairDataset over a pack built from a PNG tree returns the same
    pairs as SpectrogramPairDataset over the tree itself."""
    from PIL import Image
    from music_style_transfer_ldm_tpu.datasets import (
        SpectrogramPairDataset, generate_pairings,
    )
    from music_style_transfer_ldm_tpu.datasets.packed import (
        PackedPairDataset,
    )
    for label in ["a", "b", "c"]:
        d = tmp_path / "imgs" / label
        d.mkdir(parents=True)
        for i in range(4):
            Image.fromarray(rng.randint(0, 256, (128, 130), np.uint8),
                            mode="L").save(d / f"{i}.png")
    generate_pairings(tmp_path / "imgs", tmp_path / "pairs.csv",
                      num_pairs=10)
    build_pack(tmp_path / "imgs", tmp_path / "d.spk")

    folder_ds = SpectrogramPairDataset(tmp_path / "imgs",
                                       tmp_path / "pairs.csv")
    packed_ds = PackedPairDataset(tmp_path / "d.spk", tmp_path / "pairs.csv")
    assert len(folder_ds) == len(packed_ds) == 10
    for i in [0, 3, 9]:
        (fa, la), (fb, lb) = folder_ds[i]
        (pa, pla), (pb, plb) = packed_ds[i]
        assert (la, lb) == (pla, plb)
        np.testing.assert_allclose(fa, pa, atol=1e-7)
        np.testing.assert_allclose(fb, pb, atol=1e-7)
    # vectorized path agrees with itemized path
    c, s = packed_ds.gather_pairs([0, 3, 9])
    np.testing.assert_allclose(c[1], packed_ds[3][0][0], atol=1e-7)
    np.testing.assert_allclose(s[2], packed_ds[9][1][0], atol=1e-7)


def test_packed_batch_loader_single(pack_file):
    from music_style_transfer_ldm_tpu.datasets.loader import PackedBatchLoader
    path, images, labels = pack_file
    ds = PackedSpectrogramDataset(path, use_native=False)
    loader = PackedBatchLoader(ds, batch_size=8, shuffle=False)
    batches = list(loader)
    assert len(batches) == 3  # 20 items -> 8 + 8 + 4
    x, y = batches[0]
    assert x.shape == (8, 128, 128, 1) and y.shape == (8,)
    np.testing.assert_array_equal(
        np.concatenate([b[1] for b in batches]), labels)


def test_packed_batch_loader_pairs(pack_file, tmp_path):
    from music_style_transfer_ldm_tpu.datasets.loader import PackedBatchLoader
    from music_style_transfer_ldm_tpu.datasets.packed import PackedPairDataset
    path, images, labels = pack_file
    # tiny pairings CSV over the 3 classes
    csv = tmp_path / "pairs.csv"
    rows = ["guitar,0,piano,1", "piano,2,violin,0", "violin,3,guitar,1",
            "guitar,2,violin,4", "piano,0,guitar,5"]
    csv.write_text("\n".join(rows) + "\n")
    ds = PackedPairDataset(path, csv, use_native=False)
    loader = PackedBatchLoader(ds, batch_size=2, shuffle=False)
    assert loader.pair
    batches = list(loader)
    assert len(batches) == 3
    (content, l1), (style, l2) = batches[0]
    assert content.shape == (2, 128, 128, 1)
    assert l1 == ["guitar", "piano"] and l2 == ["piano", "violin"]
    # Vectorized path agrees with the per-item path.
    (c0, _), (s0, _) = ds[0]
    np.testing.assert_allclose(content[0], c0, atol=1e-7)
    np.testing.assert_allclose(style[0], s0, atol=1e-7)


def test_gather_uint8_mode(pack_file):
    path, images, labels = pack_file
    ds = PackedSpectrogramDataset(path, use_native=False)
    x8, y = ds.gather(np.asarray([2, 5]), dtype="uint8")
    assert x8.dtype == np.uint8 and x8.shape == (2, 128, 128, 1)
    np.testing.assert_array_equal(x8[0, :, :, 0], images[2, :128, :128])
    xf, _ = ds.gather(np.asarray([2, 5]))
    np.testing.assert_allclose(x8.astype(np.float32) / 255.0, xf, atol=1e-7)
    if build_native() is not None:
        nat = PackedSpectrogramDataset(path, use_native=True)
        xn, yn = nat.gather(np.asarray([2, 5]), dtype="uint8")
        np.testing.assert_array_equal(xn, x8)
        nat.close()


def test_uint8_batches_train_identically(rng):
    """A u8 batch through the jitted step gives the same loss as the same
    batch shipped as unit floats (device-side normalization)."""
    import dataclasses
    import jax.numpy as jnp
    from music_style_transfer_ldm_tpu.config import default_config
    from music_style_transfer_ldm_tpu.training import AETrainer
    cfg = default_config()
    cfg.train = dataclasses.replace(cfg.train, compute_dtype="float32")
    cfg.model = dataclasses.replace(cfg.model, image_size=64)
    u8 = rng.randint(0, 256, (4, 64, 64, 1)).astype(np.uint8)
    f32 = u8.astype(np.float32) / 255.0
    tr = AETrainer(cfg, perceptual=False)
    s_a = tr.init_state(0)
    s_b = tr.init_state(0)
    _, loss_u8 = tr._train_step(s_a, jnp.asarray(u8), None)
    _, loss_f32 = tr._train_step(s_b, jnp.asarray(f32), None)
    np.testing.assert_allclose(float(loss_u8), float(loss_f32), rtol=1e-6)


def test_device_resident_pairs_match_host_gather(pack_file, tmp_path):
    """HBM-resident gather returns exactly the host path's batches."""
    import jax.numpy as jnp
    from music_style_transfer_ldm_tpu.datasets import (
        DevicePairLoader, DeviceResidentPairs, PackedPairDataset,
    )
    path, images, labels = pack_file
    csv = tmp_path / "pairs.csv"
    csv.write_text("guitar,0,piano,1\npiano,2,violin,0\nviolin,3,guitar,1\n"
                   "guitar,2,violin,4\npiano,0,guitar,5\n")
    host = PackedPairDataset(path, csv, use_native=False)
    dev = DeviceResidentPairs(path, csv)
    idx = np.asarray([4, 0, 2])
    hc, hs = host.gather_pairs(idx)
    dc, ds_ = dev.gather_pairs(idx)
    np.testing.assert_allclose(np.asarray(dc).astype(np.float32) / 255.0,
                               hc, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ds_).astype(np.float32) / 255.0,
                               hs, atol=1e-7)
    # loader yields the pair structure with labels, u8 device arrays
    loader = DevicePairLoader(dev, batch_size=2, shuffle=False)
    (c, l1), (s, l2) = next(iter(loader))
    assert c.dtype == jnp.uint8 and c.shape == (2, 128, 128, 1)
    assert l1 == ["guitar", "piano"] and l2 == ["piano", "violin"]
    assert len(list(loader)) == 3


def test_device_resident_pairs_honor_float_dtype(pack_file, tmp_path):
    """gather_pairs(dtype='float32') returns [0,1] floats — same contract
    as the host gathers (PackedBatchLoader's pair mode defaults to it)."""
    from music_style_transfer_ldm_tpu.datasets import (
        DeviceResidentPairs, PackedPairDataset,
    )
    path, _, _ = pack_file
    csv = tmp_path / "pairs.csv"
    csv.write_text("guitar,0,piano,1\npiano,2,violin,0\n")
    host = PackedPairDataset(path, csv, use_native=False)
    dev = DeviceResidentPairs(path, csv)
    hc, hs = host.gather_pairs(np.asarray([0, 1]), dtype="float32")
    dc, ds_ = dev.gather_pairs(np.asarray([0, 1]), dtype="float32")
    assert np.asarray(dc).dtype == np.float32
    assert float(np.asarray(dc).max()) <= 1.0
    np.testing.assert_allclose(np.asarray(dc), hc, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ds_), hs, atol=1e-7)


def test_device_resident_pairs_feed_train_step(pack_file, tmp_path):
    """An LDM train step consumes device-resident u8 batches directly."""
    import dataclasses
    from music_style_transfer_ldm_tpu.config import default_config
    from music_style_transfer_ldm_tpu.datasets import (
        DevicePairLoader, DeviceResidentPairs,
    )
    from music_style_transfer_ldm_tpu.training import LDMTrainer
    path, _, _ = pack_file
    csv = tmp_path / "pairs.csv"
    csv.write_text("guitar,0,piano,1\npiano,2,violin,0\nviolin,3,guitar,1\n"
                   "guitar,2,violin,4\n")
    cfg = default_config()
    cfg.train = dataclasses.replace(cfg.train, compute_dtype="float32")
    trainer = LDMTrainer(cfg, perceptual=False)
    state = trainer.init_state(0)
    dev = DeviceResidentPairs(path, csv, mesh=trainer.mesh)
    loader = DevicePairLoader(dev, batch_size=4, shuffle=False)
    state, avgs = trainer.train_epoch(state, loader, 0,
                                      __import__("jax").random.PRNGKey(0))
    assert np.isfinite(avgs["total_loss"])
