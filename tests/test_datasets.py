"""Input-pipeline tests (ref: models/dataset.py behaviors): folder
enumeration order, crop/normalize transform, deterministic pairings,
loader collation."""

import csv
import numpy as np
import pytest
from PIL import Image

from music_style_transfer_ldm_tpu.datasets import (
    BatchLoader, SpectrogramDataset, SpectrogramPairDataset,
    generate_pairings, train_test_split,
)


@pytest.fixture
def image_root(tmp_path, rng):
    """processed_images/<instrument>/*.png tree like build_dataset.py."""
    for label in ["guitar", "piano", "violin"]:
        d = tmp_path / "processed_images" / label
        d.mkdir(parents=True)
        for i in range(6):
            arr = rng.randint(0, 256, (128, 130), np.uint8)
            Image.fromarray(arr, mode="L").save(d / f"song_chunk{i}.png")
    return tmp_path / "processed_images"


def test_folder_dataset_classes_and_shapes(image_root):
    ds = SpectrogramDataset(image_root)
    assert len(ds) == 18
    assert ds.classes == ["guitar", "piano", "violin"]  # sorted
    x, y = ds[0]
    assert x.shape == (128, 128, 1)  # cropped from 130 (ref: dataset.py:51)
    assert x.dtype == np.float32
    assert 0.0 <= x.min() and x.max() <= 1.0
    assert y == 0


def test_folder_dataset_label_indexing(image_root):
    ds = SpectrogramDataset(image_root)
    labels = [ds[i][1] for i in range(len(ds))]
    assert labels == [0] * 6 + [1] * 6 + [2] * 6


def test_generate_pairings_deterministic(image_root, tmp_path):
    out1 = tmp_path / "p1.csv"
    out2 = tmp_path / "p2.csv"
    generate_pairings(image_root, out1, num_pairs=50)
    generate_pairings(image_root, out2, num_pairs=50)
    assert out1.read_text() == out2.read_text()
    rows = list(csv.reader(open(out1)))
    assert len(rows) == 50
    for l1, i1, l2, i2 in rows:
        assert l1 != l2  # cross-instrument only (ref: dataset.py:291)
        assert 0 <= int(i1) < 6 and 0 <= int(i2) < 6


def test_pair_dataset(image_root, tmp_path):
    pfile = tmp_path / "pairs.csv"
    generate_pairings(image_root, pfile, num_pairs=20)
    ds = SpectrogramPairDataset(image_root, pfile)
    assert len(ds) == 20
    (img1, lbl1), (img2, lbl2) = ds[0]
    assert img1.shape == (128, 128, 1) and img2.shape == (128, 128, 1)
    assert lbl1 != lbl2
    assert isinstance(lbl1, str)


def test_pair_dataset_reads_reference_format(image_root, tmp_path):
    # A CSV in the reference's exact format loads as-is.
    pfile = tmp_path / "ref_format.csv"
    pfile.write_text("guitar,0,piano,3\nviolin,5,guitar,1\n")
    ds = SpectrogramPairDataset(image_root, pfile)
    assert len(ds) == 2
    (a, la), (b, lb) = ds[1]
    assert (la, lb) == ("violin", "guitar")


def test_train_test_split():
    tr, te = train_test_split(100, 0.8, seed=1)
    assert len(tr) == 80 and len(te) == 20
    assert set(tr) | set(te) == set(range(100))
    tr2, _ = train_test_split(100, 0.8, seed=1)
    np.testing.assert_array_equal(tr, tr2)


def test_batch_loader_unpaired(image_root):
    ds = SpectrogramDataset(image_root)
    loader = BatchLoader(ds, batch_size=5, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == 4  # 18 / 5 -> 3 full + 1 partial
    x, y = batches[0]
    assert x.shape == (5, 128, 128, 1)
    assert y.shape == (5,)
    total = sum(b[0].shape[0] for b in batches)
    assert total == 18


def test_batch_loader_paired(image_root, tmp_path):
    pfile = tmp_path / "pairs.csv"
    generate_pairings(image_root, pfile, num_pairs=12)
    ds = SpectrogramPairDataset(image_root, pfile)
    loader = BatchLoader(ds, batch_size=4, shuffle=False)
    (c, cl), (s, sl) = next(iter(loader))
    assert c.shape == (4, 128, 128, 1) and s.shape == (4, 128, 128, 1)
    assert len(cl) == 4 and isinstance(cl[0], str)


def test_batch_loader_shuffle_epochs_differ(image_root):
    ds = SpectrogramDataset(image_root)
    loader = BatchLoader(ds, batch_size=18, shuffle=True, seed=0,
                         num_threads=1)
    y1 = next(iter(loader))[1]
    y2 = next(iter(loader))[1]
    assert not np.array_equal(y1, y2)  # reshuffled across epochs


def test_batch_loader_sync_and_threaded_agree(image_root):
    ds = SpectrogramDataset(image_root)
    sync = BatchLoader(ds, batch_size=6, shuffle=False, num_threads=1)
    thr = BatchLoader(ds, batch_size=6, shuffle=False, num_threads=4)
    for (xa, ya), (xb, yb) in zip(sync, thr):
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)


def test_batch_loader_propagates_worker_errors():
    class Broken:
        def __len__(self):
            return 10

        def __getitem__(self, idx):
            if idx == 5:
                raise RuntimeError("corrupt sample")
            return np.zeros((4, 4), np.float32)

    loader = BatchLoader(Broken(), batch_size=4, shuffle=False,
                         num_threads=4)
    with pytest.raises(RuntimeError, match="corrupt sample"):
        list(loader)


def test_prepare_dataset_parity(image_root):
    from music_style_transfer_ldm_tpu.config import default_config
    from music_style_transfer_ldm_tpu.datasets import prepare_dataset
    cfg = default_config()
    train_loader, test_loader = prepare_dataset(cfg, root=str(image_root))
    n_train = sum(b[0].shape[0] for b in train_loader)
    n_test = sum(b[0].shape[0] for b in test_loader)
    assert n_train == 14 and n_test == 4  # 80/20 of 18


def test_downloader_gated_without_ytdlp(tmp_path):
    """Acquisition must fail with a clear error when yt-dlp is absent
    (ref failure-collection semantics preserved when it IS present)."""
    import importlib.util
    from music_style_transfer_ldm_tpu.data.downloader import AudioDownloader
    if importlib.util.find_spec("yt_dlp") is not None:
        pytest.skip("yt-dlp installed")
    dl = AudioDownloader(output_dir=str(tmp_path))
    with pytest.raises(RuntimeError, match="yt-dlp"):
        dl.download_audio("https://example.invalid/x", instrument="piano")


def test_downloader_csv_parsing(tmp_path, monkeypatch):
    """download_from_csv parses instrument/title/url rows (header tolerated)
    and reports collected failures."""
    from music_style_transfer_ldm_tpu.data import downloader as dl_mod
    calls = []

    dl = dl_mod.AudioDownloader(output_dir=str(tmp_path))
    monkeypatch.setattr(
        dl, "download_audio",
        lambda url, instrument="", title=None: calls.append(
            (instrument, title, url)))
    csv_path = tmp_path / "urls.csv"
    csv_path.write_text(
        "instrument,title,url\npiano,song a,http://x/1\n"
        "guitar,song b,http://x/2\n")
    dl.download_from_csv(str(csv_path))
    assert calls == [("piano", "song a", "http://x/1"),
                     ("guitar", "song b", "http://x/2")]
