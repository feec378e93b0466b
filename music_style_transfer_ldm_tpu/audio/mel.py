"""Slaney-style mel filterbank and dB conversions, librosa-compatible.

The reference uses ``librosa.feature.melspectrogram`` +
``librosa.power_to_db(ref=np.max)`` (ref: data/audio_processor.py:44-53) and
the inverses ``db_to_power`` / ``db_to_amplitude``
(ref: data/audio_processor.py:98,151).  librosa defaults reproduced here:
Slaney mel scale (htk=False), ``norm='slaney'`` area normalization,
``fmin=0``, ``fmax=sr/2``, ``amin=1e-10``, ``top_db=80``.

The filterbank itself is built once in numpy (static data); the dB math is
JAX and batched, with the data-dependent ``ref=max`` computed per item.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_AMIN = 1e-10  # librosa power_to_db default amin


def hz_to_mel(frequencies, htk: bool = False):
    """Hz -> mel (Slaney by default, matching librosa htk=False)."""
    frequencies = np.asanyarray(frequencies, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + frequencies / 700.0)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (frequencies - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = frequencies >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(frequencies, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def mel_to_hz(mels, htk: bool = False):
    """Mel -> Hz (inverse of hz_to_mel)."""
    mels = np.asanyarray(mels, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(
        log_region, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=16)
def _mel_filterbank_np(sr: int, n_fft: int, n_mels: int, fmin: float,
                       fmax: float, htk: bool, norm: str | None) -> np.ndarray:
    fftfreqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_min, mel_max = hz_to_mel(fmin, htk), hz_to_mel(fmax, htk)
    mel_f = mel_to_hz(np.linspace(mel_min, mel_max, n_mels + 2), htk)

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    if norm == "slaney":
        enorm = 2.0 / (mel_f[2:n_mels + 2] - mel_f[:n_mels])
        weights = weights * enorm[:, None]
    return weights.astype(np.float32)


def mel_filterbank(sr: int = 22050, n_fft: int = 2048, n_mels: int = 128,
                   fmin: float = 0.0, fmax: float | None = None,
                   htk: bool = False, norm: str | None = "slaney") -> jax.Array:
    """[n_mels, 1 + n_fft//2] triangular filterbank (librosa.filters.mel)."""
    if fmax is None:
        fmax = sr / 2.0
    return jnp.asarray(
        _mel_filterbank_np(int(sr), int(n_fft), int(n_mels),
                           float(fmin), float(fmax), bool(htk), norm))


def _per_item_max(S: jax.Array, batched: bool) -> jax.Array:
    """max over all but the leading batch axis (ref=np.max is per-spectrogram).

    The reference processes one chunk at a time, so ``ref=np.max`` is the max
    of that single spectrogram; with batching each item keeps its own ref.
    """
    if batched:
        axes = tuple(range(1, S.ndim))
        return jnp.max(S, axis=axes, keepdims=True)
    return jnp.max(S)


def power_to_db(S: jax.Array, ref: jax.Array | float | None = None,
                amin: float = _AMIN, top_db: float | None = 80.0,
                batched: bool = False) -> jax.Array:
    """librosa.power_to_db. ref=None reproduces the reference's ref=np.max."""
    S = S.astype(jnp.float32)
    if ref is None:
        ref = _per_item_max(S, batched)
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, S))
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(amin, ref))
    if top_db is not None:
        if batched:
            axes = tuple(range(1, S.ndim))
            peak = jnp.max(log_spec, axis=axes, keepdims=True)
        else:
            peak = jnp.max(log_spec)
        log_spec = jnp.maximum(log_spec, peak - top_db)
    return log_spec


def db_to_power(S_db: jax.Array, ref: float = 1.0) -> jax.Array:
    """librosa.db_to_power: dB -> power (inverse of power_to_db)."""
    return ref * jnp.power(10.0, 0.1 * S_db.astype(jnp.float32))


def amplitude_to_db(S: jax.Array, ref: jax.Array | float | None = None,
                    amin: float = 1e-5, top_db: float | None = 80.0,
                    batched: bool = False) -> jax.Array:
    """librosa.amplitude_to_db = power_to_db(S**2) with amin/ref squared."""
    S = jnp.abs(S.astype(jnp.float32))
    if ref is None:
        ref = _per_item_max(S, batched)
    return power_to_db(S ** 2, ref=jnp.asarray(ref) ** 2, amin=amin ** 2,
                       top_db=top_db, batched=batched)


def db_to_amplitude(S_db: jax.Array, ref: float = 1.0) -> jax.Array:
    """librosa.db_to_amplitude (ref: audio_processor.py:151)."""
    return jnp.sqrt(db_to_power(S_db, ref=ref ** 2))


@functools.partial(
    jax.jit,
    static_argnames=("sr", "n_fft", "hop_length", "win_length", "n_mels",
                     "fmin", "fmax", "power", "center"))
def melspectrogram(y: jax.Array, sr: int = 22050, n_fft: int = 2048,
                   hop_length: int = 512, win_length: int | None = None,
                   n_mels: int = 128, fmin: float = 0.0,
                   fmax: float | None = None, power: float = 2.0,
                   center: bool = True) -> jax.Array:
    """librosa.feature.melspectrogram: [..., T] -> [..., n_mels, n_frames].

    The mel projection is a [n_mels, n_freq] x [n_freq, n_frames] matmul —
    MXU-friendly and fused by XLA with the preceding |.|**power.
    """
    from music_style_transfer_ldm_tpu.audio.stft import stft
    spec = stft(y, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
                center=center)
    mag = jnp.abs(spec) ** power
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
    return jnp.einsum("mf,...ft->...mt", fb, mag,
                      preferred_element_type=jnp.float32)
