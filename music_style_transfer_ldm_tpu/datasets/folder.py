"""Spectrogram image-folder datasets.

Replaces the torchvision ImageFolder stack (ref: models/dataset.py:28-303):

* ``SpectrogramDataset`` — unpaired dataset over
  ``processed_images/<label>/*.png`` for autoencoder pretraining; labels are
  the sorted folder names (same class indexing as ImageFolder).
* ``SpectrogramPairDataset`` — paired (content, style) dataset driven by the
  deterministic pairings CSV (label1, idx1, label2, idx2), byte-compatible
  with the reference's ``spectrogram_pair_dataset_pairings.csv``.
* ``generate_pairings`` — seed-42 deterministic pair generator
  (ref: dataset.py:263-303).

Images load via PIL into float32 [0, 1] arrays cropped to 128x128 (the
reference's crop((0,0,128,128)) + Grayscale + ToTensor transform,
ref: dataset.py:47-55), shaped NHWC [128, 128, 1].

Per-index ordering matches torchvision: files are enumerated in sorted
os.walk order within each class folder, so pairings CSVs index identically.
"""

from __future__ import annotations

import csv
import os
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

_IMG_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".gif", ".tiff", ".webp")


def _sorted_image_files(directory: Path) -> List[Path]:
    """Files under `directory` in torchvision make_dataset order
    (sorted os.walk, sorted filenames; ref: dataset.py:185-191)."""
    out: List[Path] = []
    for root, _, fnames in sorted(os.walk(directory, followlinks=True)):
        for fname in sorted(fnames):
            if fname.lower().endswith(_IMG_EXTENSIONS):
                out.append(Path(root) / fname)
    return out


def list_image_folder(root: str | Path
                      ) -> Tuple[List[Tuple[Path, int]], List[str]]:
    """(samples, classes) like torchvision ImageFolder: classes are sorted
    subfolder names; samples are (path, class_index)."""
    root = Path(root)
    classes = sorted(d.name for d in root.iterdir() if d.is_dir())
    samples: List[Tuple[Path, int]] = []
    for idx, cls in enumerate(classes):
        for p in _sorted_image_files(root / cls):
            samples.append((p, idx))
    return samples, classes


def load_image_unit(path: str | Path, size: int = 128) -> np.ndarray:
    """PNG -> float32 [size, size, 1] in [0, 1] (crop from top-left, the
    reference's crop((0, 0, 128, 128)); ref: dataset.py:51-53)."""
    from PIL import Image
    img = Image.open(path).convert("L")
    arr = np.asarray(img, np.uint8)
    arr = arr[:size, :size]
    if arr.shape != (size, size):  # zero-pad undersized images
        padded = np.zeros((size, size), np.uint8)
        padded[:arr.shape[0], :arr.shape[1]] = arr
        arr = padded
    return (arr.astype(np.float32) / 255.0)[..., None]


class SpectrogramDataset:
    """Unpaired dataset for AE pretraining (ref: dataset.py:28-55)."""

    def __init__(self, root: str | Path, image_size: int = 128):
        self.samples, self.classes = list_image_folder(root)
        self.image_size = image_size

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, int]:
        path, label = self.samples[idx]
        return load_image_unit(path, self.image_size), label


class _SingleClassFolder:
    """Images directly inside one label folder (the reference's
    ImageFolderNoSubdirs single-class case; ref: dataset.py:119-203)."""

    def __init__(self, folder: Path, image_size: int = 128):
        self.files = _sorted_image_files(folder)
        self.image_size = image_size

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> np.ndarray:
        return load_image_unit(self.files[idx], self.image_size)


class SpectrogramPairDataset:
    """Paired (content, style) dataset from a pairings CSV
    (ref: dataset.py:206-244).  __getitem__ returns
    ((img1, label1), (img2, label2)) with string labels, like the reference.
    """

    def __init__(self, root_folder: str | Path, pairing_file: str | Path,
                 image_size: int = 128):
        self.root_folder = Path(root_folder)
        self.pairs: List[Tuple[str, int, str, int]] = []
        with open(pairing_file, "r") as f:
            for row in csv.reader(f):
                if row:
                    self.pairs.append((row[0], int(row[1]), row[2],
                                       int(row[3])))
        self.datasets: Dict[str, _SingleClassFolder] = {}
        for folder in sorted(os.listdir(self.root_folder)):
            fp = self.root_folder / folder
            if fp.is_dir():
                self.datasets[folder] = _SingleClassFolder(fp, image_size)

    def __len__(self) -> int:
        return len(self.pairs)

    def __getitem__(self, index: int):
        label1, idx1, label2, idx2 = self.pairs[index]
        img1 = self.datasets[label1][idx1]
        img2 = self.datasets[label2][idx2]
        return (img1, label1), (img2, label2)


def generate_pairings(root_folder: str | Path,
                      output_file_path: str | Path =
                      "spectrogram_pair_dataset_pairings.csv",
                      num_pairs: int = 15000, seed: int = 42) -> None:
    """Deterministic cross-label pairing CSV (ref: dataset.py:263-303).

    Uses the same RandomState(42) draw sequence (choice without replacement,
    then two randints) so the generated CSV is reproducible.
    """
    root_folder = Path(root_folder)
    labels = sorted(d.name for d in root_folder.iterdir() if d.is_dir())
    if len(labels) < 2:
        raise ValueError("Need at least two classes to form pairs.")
    sizes = {lb: len(_sorted_image_files(root_folder / lb)) for lb in labels}

    rng = np.random.RandomState(seed)
    rows = []
    for _ in range(num_pairs):
        label1, label2 = rng.choice(labels, size=2, replace=False)
        idx1 = rng.randint(0, sizes[label1])
        idx2 = rng.randint(0, sizes[label2])
        rows.append((label1, idx1, label2, idx2))

    with open(output_file_path, "w", newline="") as f:
        writer = csv.writer(f)
        for row in rows:
            writer.writerow(row)


# Public alias for inventory parity with the reference's ImageFolderNoSubdirs
# (ref: models/dataset.py:119-203): a dataset over a leaf directory treated
# as one class.
ImageFolderNoSubdirs = _SingleClassFolder
