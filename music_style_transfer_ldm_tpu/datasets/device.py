"""Device-resident dataset: the whole spectrogram pack lives in HBM.

The TPU-native input path when the dataset fits device memory (the
reference recipe's 2,400 images are ~40 MB as uint8 vs 16 GB of v5e HBM):
images upload ONCE, and each training step ships only int32 indices
(~1 KB) — the per-batch gather + [0,1] normalization happen on device.
This removes the host->device image traffic entirely, which dominates
step time when the chip sits behind a network relay (measured ~4 MB/s
effective for float32 batches; see docs/PERFORMANCE.md).

Yields the same ((content, labels), (style, labels)) batch structure as
BatchLoader/PackedBatchLoader, so it is a drop-in train_epoch input.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import numpy as np


class DeviceResidentPairs:
    """Paired (content, style) batches gathered in HBM.

    Same pairings-CSV contract as SpectrogramPairDataset/PackedPairDataset
    (ref: models/dataset.py:206-244).  Images are stored uint8 on device
    (replicated when a mesh is given, so any data shard can gather its own
    rows); the trainers normalize on device (training/state.as_unit_images).
    """

    def __init__(self, pack_path: str | Path, pairing_file: str | Path,
                 crop: int = 128, mesh=None):
        import jax
        from music_style_transfer_ldm_tpu.datasets.packed import (
            PackedPairDataset,
        )
        host = PackedPairDataset(pack_path, pairing_file, crop=crop,
                                 use_native=False)
        n = len(host.pack)
        all_imgs, _ = host.pack.gather(np.arange(n, dtype=np.int64),
                                       dtype="uint8")
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sharding = NamedSharding(mesh, P())  # replicated
            self.images = jax.device_put(all_imgs, sharding)
        else:
            self.images = jax.device_put(all_imgs)
        self.pairs = host.pairs
        ci = [host._class_indices[l1][i1] for l1, i1, _, _ in host.pairs]
        si = [host._class_indices[l2][i2] for _, _, l2, i2 in host.pairs]
        self._content_idx = np.asarray(ci, np.int32)
        self._style_idx = np.asarray(si, np.int32)
        host.pack.close()

    def __len__(self) -> int:
        return len(self.pairs)

    def gather_pairs(self, indices, dtype: str = "uint8"):
        """Device-side batch gather -> (content, style) jax arrays.

        dtype='uint8' (default, the trainers normalize on device) returns
        raw [0, 255]; any float dtype returns [0, 1] — same contract as
        PackedSpectrogramDataset.gather / PackedPairDataset.gather_pairs,
        so drop-in consumers (e.g. PackedBatchLoader's pair mode, which
        defaults to float32) get unit-scaled values, not raw bytes.
        """
        import jax.numpy as jnp
        idx = np.asarray(indices, np.int64)
        content = jnp.take(self.images, jnp.asarray(self._content_idx[idx]),
                           axis=0)
        style = jnp.take(self.images, jnp.asarray(self._style_idx[idx]),
                         axis=0)
        if dtype != "uint8":
            scale = jnp.asarray(1.0 / 255.0, dtype)
            content = content.astype(dtype) * scale
            style = style.astype(dtype) * scale
        return content, style


class DevicePairLoader:
    """Epoch iterator over DeviceResidentPairs: per batch, only the index
    vector crosses the host->device boundary."""

    def __init__(self, dataset: DeviceResidentPairs, batch_size: int = 128,
                 indices: Optional[Sequence[int]] = None,
                 shuffle: bool = True, seed: int = 0,
                 drop_last: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.indices = (np.arange(len(dataset)) if indices is None
                        else np.asarray(indices))
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.indices)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        order = self.indices
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            order = rng.permutation(order)
        self._epoch += 1
        for i in range(len(self)):
            bidx = order[i * self.batch_size:(i + 1) * self.batch_size]
            content, style = self.dataset.gather_pairs(bidx)
            rows = [self.dataset.pairs[int(j)] for j in bidx]
            yield ((content, [r[0] for r in rows]),
                   (style, [r[2] for r in rows]))
