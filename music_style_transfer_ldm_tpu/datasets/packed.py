"""Packed spectrogram dataset ("specpack"): builder + native-backed reader.

High-throughput replacement for PNG-per-sample loading in the training hot
path (the reference decodes PNGs one at a time through PIL per epoch,
ref: models/dataset.py:306-341).  A pack is built once from the ETL output;
reads are mmap + multithreaded gather/convert in C++
(native/specpack.cc) with a pure-numpy fallback when the shared library
isn't built.

Usage:
    build_pack("processed_images", "train.spk")
    ds = PackedSpectrogramDataset("train.spk")
    batch, labels = ds.gather(indices)          # [n,128,128,1] f32, [n] i32
"""

from __future__ import annotations

import ctypes
import struct
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_MAGIC = 0x314B5053  # "SPK1"
_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "libspecpack.so"


_BUILD_RESULT: dict = {}


def build_native(force: bool = False) -> Optional[Path]:
    """Compile libspecpack.so with make/g++; None if toolchain missing.

    Runs make once per process (memoized) so a stale library never shadows
    updated C++ without paying a subprocess per dataset construction;
    force=True rebuilds unconditionally.
    """
    if not force and "path" in _BUILD_RESULT:
        return _BUILD_RESULT["path"]
    try:
        cmd = ["make", "-C", str(_NATIVE_DIR)]
        if force:
            cmd.insert(1, "-B")
        subprocess.run(cmd, check=True, capture_output=True)
        result = _SO_PATH if _SO_PATH.exists() else None
    except (OSError, subprocess.CalledProcessError):
        result = _SO_PATH if _SO_PATH.exists() else None
    _BUILD_RESULT["path"] = result
    return result


def _load_native() -> Optional[ctypes.CDLL]:
    so = build_native()
    if so is None:
        return None
    lib = ctypes.CDLL(str(so))
    lib.spk_open.restype = ctypes.c_void_p
    lib.spk_open.argtypes = [ctypes.c_char_p]
    lib.spk_close.argtypes = [ctypes.c_void_p]
    for fn in ("spk_n_items", "spk_height", "spk_width", "spk_n_classes"):
        getattr(lib, fn).restype = ctypes.c_uint32
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    lib.spk_class_names.restype = ctypes.c_uint32
    lib.spk_class_names.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_uint32]
    lib.spk_labels.restype = ctypes.c_int
    lib.spk_labels.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                               ctypes.c_int64, ctypes.c_void_p]
    lib.spk_gather_f32.restype = ctypes.c_int
    lib.spk_gather_f32.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_int64, ctypes.c_int32,
                                   ctypes.c_int32, ctypes.c_void_p]
    lib.spk_gather_u8.restype = ctypes.c_int
    lib.spk_gather_u8.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_int64, ctypes.c_void_p]
    return lib


def _align8(x: int) -> int:
    return (x + 7) & ~7


def write_pack(path: str | Path, images: np.ndarray, labels: np.ndarray,
               class_names: Sequence[str]) -> None:
    """Serialize [n, h, w] uint8 images + labels into the SPK1 container."""
    images = np.ascontiguousarray(images, np.uint8)
    labels = np.ascontiguousarray(labels, np.uint16)
    n, h, w = images.shape
    name_table = b"".join(
        struct.pack("<H", len(c.encode())) + c.encode() for c in class_names)
    with open(path, "wb") as f:
        f.write(struct.pack("<6I", _MAGIC, n, h, w, len(class_names),
                            len(name_table)))
        f.write(name_table)
        f.write(b"\0" * (_align8(24 + len(name_table)) -
                         (24 + len(name_table))))
        f.write(labels.tobytes())
        pos = _align8(24 + len(name_table)) + labels.nbytes
        f.write(b"\0" * (_align8(pos) - pos))
        f.write(images.tobytes())


def build_pack(image_root: str | Path, out_path: str | Path) -> int:
    """Pack a processed_images/<label>/*.png tree; returns item count."""
    from PIL import Image
    from music_style_transfer_ldm_tpu.datasets.folder import list_image_folder
    samples, classes = list_image_folder(image_root)
    if not samples:
        raise ValueError(f"no images under {image_root}")
    first = np.asarray(Image.open(samples[0][0]).convert("L"))
    h, w = first.shape
    images = np.empty((len(samples), h, w), np.uint8)
    labels = np.empty((len(samples),), np.uint16)
    for i, (p, lbl) in enumerate(samples):
        images[i] = np.asarray(Image.open(p).convert("L"), np.uint8)
        labels[i] = lbl
    write_pack(out_path, images, labels, classes)
    return len(samples)


class PackedSpectrogramDataset:
    """Reader over a .spk file; native-accelerated when available."""

    def __init__(self, path: str | Path, crop: int = 128,
                 use_native: bool = True):
        self.path = Path(path)
        self.crop = crop
        self._lib = _load_native() if use_native else None
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.spk_open(str(self.path).encode())
            if not self._handle:
                self._lib = None
        if self._handle:
            self.n = int(self._lib.spk_n_items(self._handle))
            self.height = int(self._lib.spk_height(self._handle))
            self.width = int(self._lib.spk_width(self._handle))
            need = self._lib.spk_class_names(self._handle, None, 0)
            buf = ctypes.create_string_buffer(need)
            self._lib.spk_class_names(self._handle, buf, need)
            self.classes = buf.raw[:need].decode().split("\n") if need else []
            self._images = None
            self._labels = None
        else:
            self._open_numpy()
        self.native = self._handle is not None

    # ---- numpy fallback ---------------------------------------------------

    def _open_numpy(self) -> None:
        raw = np.memmap(self.path, dtype=np.uint8, mode="r")
        magic, n, h, w, n_classes, table_bytes = struct.unpack(
            "<6I", raw[:24].tobytes())
        if magic != _MAGIC:
            raise ValueError(f"{self.path} is not a specpack file")
        self.n, self.height, self.width = int(n), int(h), int(w)
        table = raw[24:24 + table_bytes].tobytes()
        names, off = [], 0
        for _ in range(n_classes):
            (ln,) = struct.unpack_from("<H", table, off)
            off += 2
            names.append(table[off:off + ln].decode())
            off += ln
        self.classes = names
        pos = _align8(24 + table_bytes)
        self._labels = raw[pos:pos + 2 * n].view(np.uint16)
        pos = _align8(pos + 2 * n)
        self._images = raw[pos:pos + n * h * w].reshape(n, h, w)

    # ---- API ---------------------------------------------------------------

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, idx: int):
        x, y = self.gather(np.asarray([idx], np.int64))
        return x[0], int(y[0])

    def gather(self, indices, process_index: int = 0,
               process_count: int = 1,
               dtype: str = "float32") -> tuple[np.ndarray, np.ndarray]:
        """indices -> ([n, crop, crop, 1] images, [n] int32 labels).

        dtype 'float32' returns unit-range floats; 'uint8' returns the raw
        stored bytes — 4x less host->device transfer (the trainers
        normalize on device), which matters when the chip is behind a
        network relay.  With process_count > 1, ``indices`` is the GLOBAL
        batch and only this process's contiguous slice is mmap-gathered
        (multi-host input sharding; see
        datasets/loader.py:process_local_indices)."""
        if process_count > 1:
            from music_style_transfer_ldm_tpu.datasets.loader import (
                process_local_indices,
            )
            indices = process_local_indices(indices, process_index,
                                            process_count)
        idx = np.ascontiguousarray(indices, np.int64)
        n = len(idx)
        c = self.crop
        if c > self.height or c > self.width:
            raise ValueError(
                f"crop {c} larger than stored image "
                f"{self.height}x{self.width}")
        if self._handle:
            labels = np.empty((n,), np.int32)
            if dtype == "uint8":
                full = np.empty((n, self.height, self.width), np.uint8)
                rc = self._lib.spk_gather_u8(
                    self._handle, idx.ctypes.data_as(ctypes.c_void_p), n,
                    full.ctypes.data_as(ctypes.c_void_p))
                out = np.ascontiguousarray(full[:, :c, :c])
            else:
                out = np.empty((n, c, c), np.float32)
                rc = self._lib.spk_gather_f32(
                    self._handle, idx.ctypes.data_as(ctypes.c_void_p), n, c,
                    c, out.ctypes.data_as(ctypes.c_void_p))
            if rc == -2:
                raise IndexError(
                    f"index out of range for pack of {self.n} items")
            if rc != 0:
                raise ValueError("crop larger than stored image")
            rc = self._lib.spk_labels(
                self._handle, idx.ctypes.data_as(ctypes.c_void_p), n,
                labels.ctypes.data_as(ctypes.c_void_p))
            if rc != 0:
                raise IndexError(
                    f"index out of range for pack of {self.n} items")
            return out[..., None], labels
        if n and (idx.min() < 0 or idx.max() >= self.n):
            raise IndexError(
                f"index out of range for pack of {self.n} items")
        imgs = self._images[idx][:, :c, :c]
        labels = self._labels[idx].astype(np.int32)
        if dtype == "uint8":
            return np.ascontiguousarray(imgs)[..., None], labels
        return (imgs.astype(np.float32) / 255.0)[..., None], labels

    def close(self) -> None:
        if self._handle:
            self._lib.spk_close(self._handle)
            self._handle = None

    def __del__(self):  # noqa: D105
        try:
            self.close()
        except Exception:  # noqa: BLE001 — interpreter teardown
            pass


def main(argv=None) -> int:
    import argparse
    p = argparse.ArgumentParser("specpack")
    p.add_argument("--build", action="store_true",
                   help="compile the native library")
    p.add_argument("--pack", nargs=2, metavar=("IMAGE_ROOT", "OUT"),
                   help="pack an image tree")
    args = p.parse_args(argv)
    if args.build:
        so = build_native(force=True)
        print(f"native library: {so}")
    if args.pack:
        n = build_pack(args.pack[0], args.pack[1])
        print(f"packed {n} items -> {args.pack[1]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())


class PackedPairDataset:
    """Paired (content, style) dataset over a specpack — the native-speed
    backend for LDM training (same pairings-CSV contract as
    SpectrogramPairDataset, ref: models/dataset.py:206-244).

    Per-class item indices are derived from the pack's label table in the
    same sorted order the folder datasets use, so a pairings CSV generated
    against the PNG tree indexes identically here.
    """

    def __init__(self, pack_path: str | Path, pairing_file: str | Path,
                 crop: int = 128, use_native: bool = True):
        import csv as _csv
        self.pack = PackedSpectrogramDataset(pack_path, crop=crop,
                                             use_native=use_native)
        # label -> array of global item indices (stored order == sorted
        # folder enumeration order from build_pack).
        if self.pack._handle:
            labels = np.empty((self.pack.n,), np.int32)
            idx = np.arange(self.pack.n, dtype=np.int64)
            self.pack._lib.spk_labels(
                self.pack._handle,
                idx.ctypes.data_as(ctypes.c_void_p), self.pack.n,
                labels.ctypes.data_as(ctypes.c_void_p))
        else:
            labels = np.asarray(self.pack._labels, np.int32)
        self._class_indices = {
            cls: np.flatnonzero(labels == i).astype(np.int64)
            for i, cls in enumerate(self.pack.classes)}

        self.pairs: list[tuple[str, int, str, int]] = []
        with open(pairing_file, "r") as f:
            for row in _csv.reader(f):
                if row:
                    self.pairs.append((row[0], int(row[1]), row[2],
                                       int(row[3])))

    def __len__(self) -> int:
        return len(self.pairs)

    def __getitem__(self, index: int):
        label1, i1, label2, i2 = self.pairs[index]
        x, _ = self.pack.gather(np.asarray(
            [self._class_indices[label1][i1],
             self._class_indices[label2][i2]], np.int64))
        return (x[0], label1), (x[1], label2)

    def gather_pairs(self, indices,
                     dtype: str = "float32") -> tuple[np.ndarray, np.ndarray]:
        """Vectorized batch path: -> (content [n,c,c,1], style [n,c,c,1]).

        One native gather for the whole batch (2n images) instead of 2n
        PNG decodes.  dtype 'uint8' ships raw bytes (see
        PackedSpectrogramDataset.gather).
        """
        rows = [self.pairs[int(i)] for i in np.asarray(indices)]
        flat = np.asarray(
            [self._class_indices[l1][i1] for l1, i1, _, _ in rows]
            + [self._class_indices[l2][i2] for _, _, l2, i2 in rows],
            np.int64)
        x, _ = self.pack.gather(flat, dtype=dtype)
        n = len(rows)
        return x[:n], x[n:]
