"""Offline dataset ETL: audio files -> spectrogram image folder tree.

ref: data/build_dataset.py — same semantics (3 s chunks, zero-pad the last,
1800 s per-file cap, 128-mel images to processed_images/<instrument>/
<stem>_chunk<i>.png) but the DSP runs as ONE batched jitted device call per
file instead of the reference's per-chunk librosa+PIL loop
(ref: build_dataset.py:105-117).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional

import numpy as np

from music_style_transfer_ldm_tpu.audio.processor import AudioProcessor

AUDIO_EXTENSIONS = (".mp3", ".wav", ".m4a", ".flac", ".ogg")


def chunk_audio(audio: np.ndarray, sr: int, chunk_seconds: float = 3.0,
                max_duration: Optional[float] = 1800.0,
                hop_seconds: Optional[float] = None) -> np.ndarray:
    """[T] -> [n_chunks, chunk_samples], zero-padding the last chunk and
    capping total duration (ref: build_dataset.py:105-110 loop semantics:
    a chunk starting before the cap is still processed in full).

    hop_seconds < chunk_seconds yields OVERLAPPING chunks (inference-side
    crossfade stitching, audio/processor.crossfade_stitch); the default
    hop == chunk is the reference's disjoint dataset convention.
    """
    chunk = int(chunk_seconds * sr)
    hop = chunk if hop_seconds is None else max(1, int(hop_seconds * sr))
    starts = list(range(0, len(audio), hop))
    # Drop trailing windows that start past the signal (possible when
    # hop < chunk and the previous window already covered the tail).
    starts = [s for s in starts if s < len(audio)] or [0]
    if max_duration is not None:
        starts = [s for s in starts if (s / sr) < max_duration]
    out = np.zeros((len(starts), chunk), np.float32)
    for j, s in enumerate(starts):
        piece = audio[s:s + chunk]
        out[j, :len(piece)] = piece
    return out


def _audio_files(root: Path) -> List[Path]:
    return sorted(p for p in root.rglob("*")
                  if p.suffix.lower() in AUDIO_EXTENSIONS)


def build_dataset_folder_structure(audio_dir: str = "downloads",
                                   output_root: str = "processed_images",
                                   chunk_size_sec: float = 3.0,
                                   max_duration: Optional[float] = 1800.0,
                                   n_mels: int = 128,
                                   batch_chunks: int = 64) -> int:
    """Process every audio file under audio_dir into PNG spectrograms
    (ref: build_dataset.py:75-119). Returns the number of images written.

    The per-file chunk batch goes through one jitted device computation
    (STFT + mel + dB + uint8 quantize); PNG encode stays on host.
    """
    from PIL import Image
    ap = AudioProcessor()
    audio_root = Path(audio_dir)
    written = 0
    for f in _audio_files(audio_root):
        instrument = f.parent.name
        out_dir = Path(output_root) / instrument
        out_dir.mkdir(parents=True, exist_ok=True)

        audio, sr = ap.load_audio(f)
        audio = ap.trim_silence(audio)
        chunks = chunk_audio(audio, sr, chunk_size_sec, max_duration)
        if len(chunks) == 0:
            continue
        for start in range(0, len(chunks), batch_chunks):
            batch = chunks[start:start + batch_chunks]
            db = ap.get_mel_spectrogram(batch, sr, n_mels=n_mels)
            imgs = ap.mel_spectrogram_to_grayscale_image(db)  # [b, mel, F]
            for j in range(imgs.shape[0]):
                idx = start + j
                Image.fromarray(imgs[j], mode="L").save(
                    out_dir / f"{f.stem}_chunk{idx}.png")
                written += 1
        print(f"processed {f} -> {len(chunks)} chunks")
    return written


def build_dataset_df(audio_dir: str = "downloads", save_to_file: bool = True,
                     save_path: str = "downloads/processed_dataset.parquet",
                     chunk_size_sec: float = 3.0,
                     max_duration: Optional[float] = 1800.0,
                     n_mels: int = 128):
    """Parquet variant storing raw PNG bytes per row
    (ref: build_dataset.py:20-72; columns spectogram/instrument/title/
    chunk_id, chunk_id in samples like the reference)."""
    import io as _io

    import pandas as pd
    from PIL import Image

    ap = AudioProcessor()
    rows = []
    for f in _audio_files(Path(audio_dir)):
        audio, sr = ap.load_audio(f)
        audio = ap.trim_silence(audio)
        chunks = chunk_audio(audio, sr, chunk_size_sec, max_duration)
        if len(chunks) == 0:
            continue
        db = ap.get_mel_spectrogram(chunks, sr, n_mels=n_mels)
        imgs = ap.mel_spectrogram_to_grayscale_image(db)
        chunk_samples = int(chunk_size_sec * sr)
        for j in range(imgs.shape[0]):
            buf = _io.BytesIO()
            Image.fromarray(imgs[j], mode="L").save(buf, format="PNG")
            rows.append({"spectogram": buf.getvalue(),
                         "instrument": f.parent.name, "title": f.stem,
                         "chunk_id": j * chunk_samples})
    df = pd.DataFrame(rows,
                      columns=["spectogram", "instrument", "title",
                               "chunk_id"])
    if save_to_file:
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        df.to_parquet(save_path)
    return df
