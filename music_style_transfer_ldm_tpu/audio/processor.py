"""High-level audio processing facade.

API-parity replacement for the reference's ``AudioPreprocessor``
(ref: data/audio_processor.py:13-182), redesigned so every step after file
decode is a jitted, batched JAX computation: the reference round-trips
through numpy/PIL per chunk, here a whole batch of chunks flows
device-resident from waveform to image and back.

Shape conventions: waveforms are [..., T]; spectrograms are
[..., n_mels|n_freq, n_frames] (librosa layout); images are uint8 or float
arrays in the same layout (rows = mel bins, cols = frames).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from music_style_transfer_ldm_tpu.audio import io as audio_io
from music_style_transfer_ldm_tpu.audio import mel as _mel
from music_style_transfer_ldm_tpu.audio import quantize as _quant
from music_style_transfer_ldm_tpu.audio import stft as _stft
from music_style_transfer_ldm_tpu.audio import griffinlim as _gl


class AudioProcessor:
    """TPU-native counterpart of the reference's AudioPreprocessor."""

    def __init__(self, target_sr: int = 22050, n_fft: int = 2048,
                 hop_length: int = 512, nnls_iters: int = 64):
        self.target_sr = target_sr
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.nnls_iters = nnls_iters

    # ---------------- host-side (file decode / dynamic shapes) -----------

    def load_audio(self, filepath) -> tuple[np.ndarray, int]:
        """ref: audio_processor.py:21-28."""
        return audio_io.load_audio(filepath, sr=self.target_sr)

    def trim_silence(self, audio: np.ndarray, top_db: float = 20.0,
                     frame_length: int = 2048, hop_length: int = 512
                     ) -> np.ndarray:
        """Trim leading/trailing silence (librosa.effects.trim equivalent;
        ref: audio_processor.py:30-38).  Host-side numpy: the output length
        is data-dependent, which cannot live under jit.
        """
        y = np.asarray(audio, np.float32)
        if y.size == 0:
            return y
        pad = frame_length // 2
        yp = np.pad(y, (pad, pad))
        nf = 1 + (len(yp) - frame_length) // hop_length
        idx = (np.arange(nf)[:, None] * hop_length +
               np.arange(frame_length)[None, :])
        power = np.mean(yp[idx] ** 2, axis=1)  # rms**2 per frame
        ref = max(power.max(), 1e-10)
        db = 10.0 * np.log10(np.maximum(power, 1e-10) / ref)
        nonsilent = np.flatnonzero(db > -top_db)
        if nonsilent.size == 0:
            return y[:0]
        start = int(nonsilent[0]) * hop_length
        end = min(len(y), (int(nonsilent[-1]) + 1) * hop_length)
        return y[start:end]

    # ---------------- device-side (jitted, batched) ----------------------

    def get_mel_spectrogram(self, audio, sr: int | None = None,
                            n_mels: int = 256) -> jax.Array:
        """Log-mel spectrogram in dB, per-item ref=max
        (ref: audio_processor.py:44-53).  Batched: [..., T] -> [..., n_mels, F].
        """
        sr = sr or self.target_sr
        audio = jnp.asarray(audio)
        batched = audio.ndim > 1
        mel_power = _mel.melspectrogram(
            audio, sr=sr, n_fft=self.n_fft, hop_length=self.hop_length,
            n_mels=n_mels)
        return _mel.power_to_db(mel_power, ref=None, batched=batched)

    # Alias keeping the reference's (misspelled) method name working.
    get_mel_spectogram = get_mel_spectrogram

    def mel_spectrogram_to_grayscale_image(self, spectrogram,
                                           max_db: float = 80.0) -> np.ndarray:
        """dB -> uint8 grayscale array (ref: audio_processor.py:55-73).

        Returns a numpy uint8 array (callers save via PIL when needed).
        """
        return np.asarray(_quant.db_to_uint8_image(jnp.asarray(spectrogram),
                                                   max_db=max_db))

    mel_spectogram_to_grayscale_image = mel_spectrogram_to_grayscale_image

    def grayscale_mel_spectrogram_image_to_audio(
            self, image, sr: int | None = None, max_db: float = 80.0,
            n_iter: int = 32, length: int | None = None,
            key: jax.Array | None = None,
            init_phase: jax.Array | None = None) -> jax.Array:
        """uint8 image -> dB -> power -> NNLS + Griffin-Lim audio
        (ref: audio_processor.py:81-100), fully on device and batched.
        init_phase: optional complex STFT matched to the image's frames
        whose angles seed Griffin-Lim (phase reuse, see audio/griffinlim).
        """
        sr = sr or self.target_sr
        img = jnp.asarray(image)
        log_mel = _quant.uint8_image_to_db(img, max_db=max_db)
        mel_power = _mel.db_to_power(log_mel)
        return _gl.mel_to_audio(
            mel_power, sr=sr, n_fft=self.n_fft, hop_length=self.hop_length,
            n_iter=n_iter, nnls_iters=self.nnls_iters, length=length,
            key=key, init_phase=init_phase)

    grayscale_mel_spectogram_image_to_audio = (
        grayscale_mel_spectrogram_image_to_audio)

    def get_spectrogram(self, audio) -> jax.Array:
        """Linear-frequency dB spectrogram (ref: audio_processor.py:102-111)."""
        audio = jnp.asarray(audio)
        batched = audio.ndim > 1
        mag = jnp.abs(_stft.stft(audio, n_fft=self.n_fft,
                                 hop_length=self.hop_length))
        return _mel.amplitude_to_db(mag, ref=None, batched=batched)

    get_spectogram = get_spectrogram

    def spectrogram_to_grayscale_image(self, spectrogram,
                                       max_db: float = 80.0) -> np.ndarray:
        """ref: audio_processor.py:113-130."""
        return np.asarray(_quant.db_to_uint8_image(jnp.asarray(spectrogram),
                                                   max_db=max_db))

    spectogram_to_grayscale_image = spectrogram_to_grayscale_image

    def grayscale_spectrogram_image_to_audio(
            self, image, max_db: float = 80.0, n_iter: int = 32,
            hop_length: int | None = None, win_length: int | None = None,
            length: int | None = None,
            key: jax.Array | None = None) -> jax.Array:
        """uint8 linear-spec image -> Griffin-Lim audio
        (ref: audio_processor.py:132-154)."""
        img = jnp.asarray(image)
        log_spec = _quant.uint8_image_to_db(img, max_db=max_db)
        amp = _mel.db_to_amplitude(log_spec)
        return _gl.griffin_lim(
            amp, n_iter=n_iter,
            hop_length=hop_length or self.hop_length,
            win_length=win_length, length=length, key=key)

    grayscale_spectogram_image_to_audio = grayscale_spectrogram_image_to_audio

    # ---------------- fused pipelines (no reference counterpart) ---------

    @functools.partial(jax.jit, static_argnames=("self", "n_mels", "max_db"))
    def waveform_batch_to_unit_images(self, chunks: jax.Array,
                                      n_mels: int = 128,
                                      max_db: float = 80.0) -> jax.Array:
        """[B, T] audio chunks -> [B, n_mels, F] float images in [0, 1].

        One fused device computation covering what the reference does with
        per-chunk librosa + PIL + ToTensor (ref: build_dataset.py:105-117 and
        models/dataset.py:47-55), including the uint8 quantization grid so
        values are bit-identical to PNG round-trips.
        """
        db = self.get_mel_spectrogram(chunks, n_mels=n_mels)
        return _quant.db_to_unit_image(db, max_db=max_db, quantize=True)

    def clip_to_content_image(self, audio, n_mels: int = 128,
                              size: int = 128) -> np.ndarray:
        """First `size`-frame chunk of a clip -> [size, size, 1] float
        image in [0, 1] — the model-input form used by the CLI and the
        serving front end."""
        chunk = int(3 * self.target_sr)
        piece = np.zeros(chunk, np.float32)
        n = min(len(audio), chunk)
        piece[:n] = np.asarray(audio, np.float32)[:chunk]
        img = np.asarray(self.waveform_batch_to_unit_images(
            piece[None], n_mels=n_mels))
        return img[0, :, :size, None].astype(np.float32)

    # ---------------- misc parity helpers ---------------------------------

    def normalize_audio(self, audio, peak: float = 1.0):
        """Peak-normalize (the reference left this as an unimplemented TODO,
        audio_processor.py:40-42)."""
        audio = np.asarray(audio, np.float32)
        m = float(np.max(np.abs(audio))) if audio.size else 0.0
        return audio if m == 0.0 else audio * (peak / m)

    def get_raw_image_bytes(self, image) -> bytes:
        """PNG-encode a uint8 array or PIL image
        (ref: audio_processor.py:75-79)."""
        from io import BytesIO
        from PIL import Image
        if not hasattr(image, "save"):
            image = Image.fromarray(np.asarray(image, np.uint8), mode="L")
        with BytesIO() as out:
            image.save(out, format="PNG")
            return out.getvalue()

    def plot_audio(self, audio, sr=None, out_path=None):
        """Waveform plot (ref: audio_processor.py:156-170); saves to
        out_path when given, else shows. No-op without matplotlib."""
        try:
            import matplotlib
            if out_path:
                matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        sr = sr or self.target_sr
        audio = np.asarray(audio)
        t = np.linspace(0, len(audio) / sr, num=len(audio))
        plt.figure(figsize=(14, 5))
        plt.plot(t, audio)
        plt.title("Audio Waveform")
        plt.xlabel("Time (seconds)")
        plt.ylabel("Amplitude")
        plt.tight_layout()
        if out_path:
            plt.savefig(out_path)
            plt.close()
        else:
            plt.show()

    def plot_mel_spectrogram(self, mel_db, out_path=None):
        """Log-mel heatmap (ref: audio_processor.py:172-182)."""
        try:
            import matplotlib
            if out_path:
                matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        mel_db = np.asarray(mel_db)
        plt.figure(figsize=(14, 5))
        plt.imshow(mel_db, origin="lower", aspect="auto", cmap="magma")
        plt.colorbar(format="%+2.0f dB")
        plt.title("Mel spectrogram")
        plt.xlabel("Frame")
        plt.ylabel("Mel bin")
        plt.tight_layout()
        if out_path:
            plt.savefig(out_path)
            plt.close()
        else:
            plt.show()


def crossfade_stitch(chunks: np.ndarray, hop_samples: int) -> np.ndarray:
    """Stitch overlapping reconstructed chunks into one waveform.

    chunks: [N, L] windows taken at stride hop_samples (<= L); overlapped
    regions are blended with complementary linear ramps (equal-gain
    crossfade), removing the boundary discontinuities of plain
    concatenation — Griffin-Lim phase-recovers each chunk independently,
    so disjoint chunks meet with arbitrary phase at the seam.
    hop_samples == L degrades to exact concatenation.
    """
    chunks = np.asarray(chunks, np.float32)
    n, length = chunks.shape
    hop = int(hop_samples)
    if hop > length and n > 1:
        # Gapped windows (hop > chunk length) can't be stitched: plain
        # concatenation would silently time-misalign everything after the
        # first gap.  Unreachable from the CLI (overlap is clamped to
        # [0, 1)) but the signature permits it (ADVICE r03).
        raise ValueError(
            f"hop_samples ({hop}) > chunk length ({length}): windows do "
            f"not cover the signal, stitching would misalign time")
    if hop >= length or n == 1:
        return chunks.reshape(-1)[: (n - 1) * hop + length]
    total = (n - 1) * hop + length
    out = np.zeros(total, np.float32)
    norm = np.zeros(total, np.float32)
    overlap = length - hop
    ramp_in = np.ones(length, np.float32)
    ramp_in[:overlap] = np.linspace(0.0, 1.0, overlap, endpoint=False)
    ramp_out = np.ones(length, np.float32)
    ramp_out[hop:] = np.linspace(1.0, 0.0, overlap, endpoint=False)
    for j in range(n):
        w = np.ones(length, np.float32)
        if j > 0:
            w = w * ramp_in
        if j < n - 1:
            w = w * ramp_out
        out[j * hop:j * hop + length] += w * chunks[j]
        norm[j * hop:j * hop + length] += w
    return out / np.maximum(norm, 1e-8)
