"""Batch loading: host-side assembly with background prefetch.

Replaces torch DataLoader usage (ref: models/dataset.py:306-341 — which ran
with num_workers=0, i.e. fully synchronous).  Here a thread pool decodes
PNGs and assembles the next batch while the device computes the current
step, and batches are optionally placed onto the mesh ('data'-sharded)
ahead of time — the host/device pipeline the reference lacks.
"""

from __future__ import annotations

import threading
from queue import Queue
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np


def process_local_indices(indices, process_index: int,
                          process_count: int) -> np.ndarray:
    """Contiguous per-process slice of a global batch's index list.

    Multi-host input sharding: every process computes the same global batch
    order (seeded shuffle), then loads only rows
    [pi * ceil(n/P) : (pi + 1) * ceil(n/P)] of each batch.  A partial tail
    batch is padded by repeating its final index so all processes yield the
    same local shape (required to assemble the global array with
    jax.make_array_from_process_local_data, see
    parallel/sharding.py:global_batch_from_local).  The contiguous layout
    matches NamedSharding's row ownership when the mesh is built from
    jax.devices() (process-contiguous device order).
    """
    if not 0 <= process_index < process_count:
        raise ValueError(f"process_index {process_index} not in "
                         f"[0, {process_count})")
    idx = np.asarray(indices)
    n = len(idx)
    per = -(-n // process_count)  # ceil
    short = per * process_count - n
    if short:
        idx = np.concatenate([idx, np.repeat(idx[-1:], short)])
    return idx[process_index * per:(process_index + 1) * per]


def train_test_split(n: int, train_fraction: float = 0.8,
                     seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Random index split (ref: torch random_split 80/20,
    dataset.py:309-311; deterministic via numpy seed here)."""
    perm = np.random.RandomState(seed).permutation(n)
    k = int(train_fraction * n)
    return perm[:k], perm[k:]


class BatchLoader:
    """Iterate minibatches of stacked numpy arrays from an indexable dataset.

    dataset[idx] may return an array, a (array, label) tuple, or the pair
    dataset's ((img, lbl), (img, lbl)); batches stack each array leaf and
    collect labels into lists.
    """

    def __init__(self, dataset, batch_size: int = 128,
                 indices: Optional[Sequence[int]] = None, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = False,
                 num_threads: int = 8, prefetch: int = 2,
                 process_index: int = 0, process_count: int = 1):
        """batch_size is the GLOBAL batch size.  With process_count > 1
        (multi-host), every process iterates the identical global batch
        order but loads/yields only its contiguous 1/process_count slice
        (see process_local_indices); assemble the global device array with
        parallel.sharding.global_batch_from_local.  Prefer drop_last=True
        multi-host: a partial tail batch is padded by repeating its final
        row, slightly re-weighting that one batch."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.indices = (np.arange(len(dataset)) if indices is None
                        else np.asarray(indices))
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.indices)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _collate(self, items):
        first = items[0]
        if isinstance(first, tuple) and isinstance(first[0], tuple):
            # pair dataset: ((img, lbl), (img, lbl))
            a = self._collate([it[0] for it in items])
            b = self._collate([it[1] for it in items])
            return a, b
        if isinstance(first, tuple):
            arrs = np.stack([it[0] for it in items])
            labels = [it[1] for it in items]
            if all(isinstance(l, (int, np.integer)) for l in labels):
                labels = np.asarray(labels, np.int32)
            return arrs, labels
        return np.stack(items)

    def __iter__(self) -> Iterator:
        order = self.indices
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            order = rng.permutation(order)
        self._epoch += 1

        n_batches = len(self)
        batches_idx = [order[i * self.batch_size:(i + 1) * self.batch_size]
                       for i in range(n_batches)]
        if self.process_count > 1:
            batches_idx = [process_local_indices(b, self.process_index,
                                                 self.process_count)
                           for b in batches_idx]

        if self.num_threads <= 1:
            for bidx in batches_idx:
                yield self._collate([self.dataset[int(i)] for i in bidx])
            return

        # Background assembly with a bounded queue (double buffering).
        q: Queue = Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            from concurrent.futures import ThreadPoolExecutor
            try:
                with ThreadPoolExecutor(self.num_threads) as pool:
                    for bidx in batches_idx:
                        items = list(pool.map(
                            lambda i: self.dataset[int(i)], bidx))
                        q.put(self._collate(items))
                q.put(stop)
            except BaseException as e:  # noqa: BLE001 — surface to consumer
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                t.join()
                raise item
            yield item
        t.join()


class PackedBatchLoader:
    """Vectorized batch loader over a gather-capable packed dataset.

    One native mmap gather per batch (datasets/packed.py) instead of
    batch_size ``__getitem__`` calls — the specpack hot path for training
    at the reference recipe's scale (batch 128).  ``pair=True`` (auto when
    the dataset has ``gather_pairs``) yields the
    ``((content, labels), (style, labels))`` structure LDMTrainer's
    train_epoch consumes; otherwise yields ``(images, labels)``.
    Prefetches the next batch on a background thread while the device
    computes; same multi-host slicing contract as BatchLoader.
    """

    def __init__(self, dataset, batch_size: int = 128,
                 indices: Optional[Sequence[int]] = None,
                 shuffle: bool = True, seed: int = 0,
                 drop_last: bool = False, prefetch: int = 2,
                 process_index: int = 0, process_count: int = 1,
                 pair: Optional[bool] = None, dtype: str = "float32"):
        self.dataset = dataset
        self.batch_size = batch_size
        self.indices = (np.arange(len(dataset)) if indices is None
                        else np.asarray(indices))
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        self.pair = (hasattr(dataset, "gather_pairs") if pair is None
                     else pair)
        # 'uint8' ships raw bytes and lets the trainers normalize on
        # device: 4x less host->device transfer (a first-order win when
        # the chip sits behind a network relay).
        self.dtype = dtype
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.indices)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _fetch(self, bidx):
        if self.pair:
            content, style = self.dataset.gather_pairs(bidx,
                                                       dtype=self.dtype)
            rows = [self.dataset.pairs[int(i)] for i in bidx]
            return ((content, [r[0] for r in rows]),
                    (style, [r[2] for r in rows]))
        return self.dataset.gather(bidx, dtype=self.dtype)

    def __iter__(self) -> Iterator:
        order = self.indices
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            order = rng.permutation(order)
        self._epoch += 1
        batches_idx = [order[i * self.batch_size:(i + 1) * self.batch_size]
                       for i in range(len(self))]
        if self.process_count > 1:
            batches_idx = [process_local_indices(b, self.process_index,
                                                 self.process_count)
                           for b in batches_idx]

        q: Queue = Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for bidx in batches_idx:
                    q.put(self._fetch(bidx))
                q.put(stop)
            except BaseException as e:  # noqa: BLE001 — surface to consumer
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                t.join()
                raise item
            yield item
        t.join()


def prepare_dataset(config, root: str | None = None):
    """(train_loader, test_loader) for AE pretraining — API parity with the
    reference's prepare_dataset (ref: models/dataset.py:306-316): 80/20
    random split, shuffled train, unshuffled test."""
    from music_style_transfer_ldm_tpu.datasets.folder import (
        SpectrogramDataset,
    )
    root = root or config.data.processed_dir
    ds = SpectrogramDataset(root, image_size=config.model.image_size)
    tr_idx, te_idx = train_test_split(len(ds), config.train.train_split,
                                      seed=config.train.seed)
    train_loader = BatchLoader(ds, config.train.batch_size, indices=tr_idx,
                               shuffle=True, seed=config.train.seed)
    test_loader = BatchLoader(ds, config.train.batch_size, indices=te_idx,
                              shuffle=False)
    return train_loader, test_loader
