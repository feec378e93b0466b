"""Generate the committed golden regression fixture for the DSP chain.

Freezes the full codec path — clip -> mel dB -> uint8 image -> NNLS
mel-to-STFT -> Griffin-Lim audio — for three synthetic clips into
tests/data/golden_dsp.npz, so any refactor of audio/ that shifts the codec
fails tests/test_golden_dsp.py instead of slipping silently (the
reference's fidelity gate is tests/audio_reconstruction_test.py:16-88,
which only eyeballs artifacts; this is its quantitative counterpart).

Run on CPU:  python tools/make_golden_dsp.py
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
SR = 22050
SECONDS = 3


def synthesize_clips() -> dict[str, np.ndarray]:
    """Three deterministic 3 s clips covering tonal, sweeping, and noisy
    content (the codec behaves differently on each)."""
    t = np.arange(SECONDS * SR, dtype=np.float64) / SR
    env = np.minimum(1.0, 10.0 * np.minimum(t, t[-1] - t))  # fade in/out
    chord = 0.3 * env * (np.sin(2 * np.pi * 220.0 * t)
                         + 0.7 * np.sin(2 * np.pi * 277.18 * t)
                         + 0.5 * np.sin(2 * np.pi * 329.63 * t))
    f0, f1 = 100.0, 4000.0
    phase = 2 * np.pi * (f0 * t + (f1 - f0) * t ** 2 / (2 * t[-1]))
    chirp = 0.4 * env * np.sin(phase)
    rng = np.random.RandomState(7)
    noise = 0.2 * env * rng.randn(t.size)
    return {"chord": chord.astype(np.float32),
            "chirp": chirp.astype(np.float32),
            "noise": noise.astype(np.float32)}


def main() -> None:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, str(REPO))
    from music_style_transfer_ldm_tpu.audio.griffinlim import mel_to_stft
    from music_style_transfer_ldm_tpu.audio.mel import db_to_power
    from music_style_transfer_ldm_tpu.audio.processor import AudioProcessor
    from music_style_transfer_ldm_tpu.audio.quantize import uint8_image_to_db

    proc = AudioProcessor(target_sr=SR)
    out: dict[str, np.ndarray] = {}
    for name, clip in synthesize_clips().items():
        mel_db = np.asarray(proc.get_mel_spectrogram(clip, n_mels=128))
        img = proc.mel_spectrogram_to_grayscale_image(mel_db)
        stft_power = np.asarray(mel_to_stft(
            db_to_power(uint8_image_to_db(img)), sr=SR,
            nnls_iters=proc.nnls_iters))
        audio = np.asarray(proc.grayscale_mel_spectrogram_image_to_audio(
            img, length=clip.size))
        out[f"{name}_clip"] = clip
        out[f"{name}_mel_db"] = mel_db.astype(np.float32)
        out[f"{name}_img"] = img
        out[f"{name}_stft_power"] = stft_power.astype(np.float32)
        out[f"{name}_audio"] = audio.astype(np.float32)
        print(f"{name}: mel {mel_db.shape} img {img.dtype}{img.shape} "
              f"stft {stft_power.shape} audio {audio.shape}")

    dest = REPO / "tests" / "data" / "golden_dsp.npz"
    dest.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(dest, **out)
    print(f"wrote {dest} ({dest.stat().st_size / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
