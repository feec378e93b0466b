"""Batched STFT / ISTFT in pure JAX, matching librosa conventions.

The reference delegates to ``librosa.stft`` / ``librosa.istft`` (via
``librosa.feature.melspectrogram`` and ``librosa.griffinlim``,
ref: data/audio_processor.py:44-53,102-111,132-154).  Conventions matched:

* periodic ("fftbins") Hann window of ``win_length``, zero-padded centered
  inside ``n_fft`` when ``win_length < n_fft``;
* ``center=True``: the signal is padded by ``n_fft // 2`` on both sides with
  zeros (librosa>=0.10 default ``pad_mode='constant'``);
* ISTFT performs windowed overlap-add with squared-window-sum (NOLA)
  normalization and trims the ``n_fft // 2`` center padding.

TPU notes: framing is a gather with a statically precomputed index matrix
(compiles to efficient dynamic-slices); overlap-add uses a fully vectorized
shift-and-sum when ``n_fft % hop == 0`` (the default 2048/512 case) so there
is no scatter in the hot Griffin-Lim loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _hann_np(win_length: int) -> np.ndarray:
    n = np.arange(win_length)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window, identical to scipy.signal.get_window('hann', N)."""
    return jnp.asarray(_hann_np(win_length), dtype=dtype)


def _padded_window_np(win_length: int, n_fft: int) -> np.ndarray:
    """Window centered in an n_fft-long buffer (librosa util.pad_center).

    Pure numpy so it stays a compile-time constant under jit tracing.
    """
    if win_length > n_fft:
        raise ValueError(f"win_length={win_length} > n_fft={n_fft}")
    w = _hann_np(win_length)
    lpad = (n_fft - win_length) // 2
    return np.pad(w, (lpad, n_fft - win_length - lpad))


def _padded_window(win_length: int, n_fft: int, dtype=jnp.float32) -> jax.Array:
    return jnp.asarray(_padded_window_np(win_length, n_fft), dtype=dtype)


def num_frames(n_samples: int, n_fft: int, hop_length: int, center: bool = True) -> int:
    """Number of STFT frames librosa produces for a signal of n_samples."""
    if center:
        n_samples = n_samples + 2 * (n_fft // 2)
    return 1 + (n_samples - n_fft) // hop_length


def frame_signal(y: jax.Array, n_fft: int, hop_length: int,
                 center: bool = True) -> jax.Array:
    """[..., T] -> [..., n_frames, n_fft] frames (with center zero-padding)."""
    if center:
        pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        y = jnp.pad(y, pad)
    n = y.shape[-1]
    nf = 1 + (n - n_fft) // hop_length
    # Static gather indices: [nf, n_fft]
    idx = np.arange(nf)[:, None] * hop_length + np.arange(n_fft)[None, :]
    return y[..., idx]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "center"))
def stft(y: jax.Array, n_fft: int = 2048, hop_length: int = 512,
         win_length: int | None = None, center: bool = True) -> jax.Array:
    """Complex STFT. [..., T] -> [..., 1 + n_fft//2, n_frames] (librosa layout)."""
    if win_length is None:
        win_length = n_fft
    window = _padded_window(win_length, n_fft, jnp.float32)
    frames = frame_signal(y.astype(jnp.float32), n_fft, hop_length, center)
    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
    # [..., n_frames, n_freq] -> [..., n_freq, n_frames]
    return jnp.swapaxes(spec, -1, -2)


def stft_np(y: np.ndarray, n_fft: int = 2048, hop_length: int = 512,
            win_length: int | None = None, center: bool = True
            ) -> np.ndarray:
    """Host-side numpy mirror of ``stft`` (same window, padding, layout).

    Exists because the axon TPU relay cannot transfer complex64 arrays in
    EITHER direction (probed r03: upload and readback both raise
    UNIMPLEMENTED) — host-side phase extraction (e.g. for Griffin-Lim
    content-phase seeding, cli transfer --phase-init) must therefore stay
    in numpy and ship only REAL angles across the device boundary.
    """
    if win_length is None:
        win_length = n_fft
    window = _padded_window_np(win_length, n_fft)
    y = np.asarray(y, np.float32)
    if center:
        pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        y = np.pad(y, pad)
    nf = 1 + (y.shape[-1] - n_fft) // hop_length
    idx = np.arange(nf)[:, None] * hop_length + np.arange(n_fft)[None, :]
    spec = np.fft.rfft(y[..., idx] * window, n=n_fft, axis=-1)
    return np.swapaxes(spec, -1, -2)


def _overlap_add(frames: jax.Array, hop_length: int) -> jax.Array:
    """[..., n_frames, n_fft] -> [..., n_fft + hop*(n_frames-1)] overlap-add.

    Vectorized shift-and-sum: requires n_fft % hop == 0 (default 2048/512).
    Each frame is split into K = n_fft//hop sub-chunks of length hop; chunk k
    of frame t lands at output chunk t + k.  Summing K zero-padded shifted
    copies performs the whole OLA with no scatter.
    """
    n_fft = frames.shape[-1]
    nf = frames.shape[-2]
    if n_fft % hop_length != 0:
        # Generic scatter fallback (still jittable; indices are static).
        out_len = n_fft + hop_length * (nf - 1)
        idx = np.arange(nf)[:, None] * hop_length + np.arange(n_fft)[None, :]
        flat = frames.reshape(frames.shape[:-2] + (-1,))
        out = jnp.zeros(frames.shape[:-2] + (out_len,), frames.dtype)
        return out.at[..., idx.reshape(-1)].add(flat)
    k = n_fft // hop_length
    # [..., nf, k, hop]
    chunks = frames.reshape(frames.shape[:-1] + (k, hop_length))
    out_chunks = nf + k - 1
    out = jnp.zeros(frames.shape[:-2] + (out_chunks, hop_length), frames.dtype)
    for j in range(k):
        out = out.at[..., j:j + nf, :].add(chunks[..., :, j, :])
    return out.reshape(frames.shape[:-2] + (out_chunks * hop_length,))


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "win_length", "center", "length"))
def istft(spec: jax.Array, n_fft: int | None = None, hop_length: int = 512,
          win_length: int | None = None, center: bool = True,
          length: int | None = None) -> jax.Array:
    """Inverse STFT with NOLA window-sum normalization (librosa-compatible).

    spec: [..., n_freq, n_frames] complex -> [..., n_samples] float32.
    """
    n_freq = spec.shape[-2]
    if n_fft is None:
        n_fft = 2 * (n_freq - 1)
    if win_length is None:
        win_length = n_fft
    window = _padded_window(win_length, n_fft, jnp.float32)

    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    y = _overlap_add(frames * window, hop_length)

    # Squared-window-sum normalization (computed statically in numpy).
    nf = spec.shape[-1]
    w2 = _padded_window_np(win_length, n_fft) ** 2
    wsum = np.zeros(n_fft + hop_length * (nf - 1))
    for t in range(nf):
        wsum[t * hop_length:t * hop_length + n_fft] += w2
    wsum = np.where(wsum > 1e-11, wsum, 1.0)  # librosa util.tiny threshold
    y = y / jnp.asarray(wsum, jnp.float32)

    if center:
        half = n_fft // 2
        y = y[..., half:y.shape[-1] - half]
    if length is not None:
        if y.shape[-1] >= length:
            y = y[..., :length]
        else:
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, length - y.shape[-1])])
    return y
