"""Fast Griffin-Lim phase recovery and mel inversion, fully on device.

The reference reconstructs audio on CPU via ``librosa.feature.inverse
.mel_to_audio`` (internally NNLS + Griffin-Lim; ref: data/audio_processor.py:99)
and ``librosa.griffinlim(n_iter=32)`` for linear spectrograms
(ref: data/audio_processor.py:153).  Here the whole chain is jitted JAX:
the iteration is a ``lax.scan`` whose body is one ISTFT + one STFT (batched
FFTs + vectorized overlap-add), so a batch of clips is phase-recovered in a
single device computation.

Matches librosa's *fast* Griffin-Lim (momentum=0.99) update:

  angles_{k+1} = P(rebuilt_k - m/(1+m) * rebuilt_{k-1}),   P(z) = z/|z|
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from music_style_transfer_ldm_tpu.audio import mel as _mel
from music_style_transfer_ldm_tpu.audio import nnls as _nnls
from music_style_transfer_ldm_tpu.audio import stft as _stft


@functools.partial(
    jax.jit,
    static_argnames=("n_iter", "hop_length", "win_length", "n_fft",
                     "momentum", "init", "length"))
def griffin_lim(S: jax.Array, *, n_iter: int = 32, hop_length: int = 512,
                win_length: int | None = None, n_fft: int | None = None,
                momentum: float = 0.99, init: str = "random",
                length: int | None = None,
                key: jax.Array | None = None,
                init_phase: jax.Array | None = None) -> jax.Array:
    """Phase-recover audio from a magnitude spectrogram.

    S: [..., n_freq, n_frames] non-negative magnitudes.
    Returns [..., n_samples] float32 audio.
    init='random' matches librosa's default (random phases); pass a PRNG key
    for reproducibility, else a fixed key is used. init='zeros' starts from
    zero phase.  init_phase (overrides init): phases of the same
    [..., n_freq, n_frames] shape whose ANGLES seed the iteration — e.g.
    the content clip's own phases in a style transfer, which converges
    far faster than random (the time structure survives the transfer;
    standard phase-reuse trick).  May be a REAL array of angles in
    radians (preferred: the axon TPU relay cannot transfer complex64 at
    all — compute angles host-side with audio.stft.stft_np + np.angle)
    or a complex STFT (CPU-safe only).
    """
    n_freq = S.shape[-2]
    if n_fft is None:
        n_fft = 2 * (n_freq - 1)
    if win_length is None:
        win_length = n_fft
    S = S.astype(jnp.float32)

    if init_phase is not None:
        if jnp.iscomplexobj(init_phase):
            z = init_phase.astype(jnp.complex64)
            angles = z / (jnp.abs(z) + 1e-16)
        else:  # real angles in radians (relay-safe representation)
            angles = jnp.exp(
                1j * init_phase.astype(jnp.float32).astype(jnp.complex64))
    elif init == "random":
        if key is None:
            key = jax.random.PRNGKey(0)
        phase = jax.random.uniform(key, S.shape, jnp.float32, 0.0, 2.0 * jnp.pi)
        angles = jnp.exp(1j * phase.astype(jnp.complex64))
    elif init == "zeros":
        angles = jnp.ones(S.shape, jnp.complex64)
    else:
        raise ValueError(f"unknown init {init!r}")

    eps = 1e-16
    mscale = momentum / (1.0 + momentum)

    def project(z):
        return z / (jnp.abs(z) + eps)

    def body(carry, _):
        angles, rebuilt_prev = carry
        inverse = _stft.istft(S * angles, n_fft=n_fft, hop_length=hop_length,
                              win_length=win_length)
        rebuilt = _stft.stft(inverse, n_fft=n_fft, hop_length=hop_length,
                             win_length=win_length)
        angles = project(rebuilt - mscale * rebuilt_prev)
        return (angles, rebuilt), None

    (angles, _), _ = jax.lax.scan(
        body, (angles, jnp.zeros_like(angles)), None, length=n_iter)

    return _stft.istft(S * angles, n_fft=n_fft, hop_length=hop_length,
                       win_length=win_length, length=length)


@functools.partial(
    jax.jit,
    static_argnames=("sr", "n_fft", "power", "nnls_iters", "n_mels", "fmin",
                     "fmax"))
def mel_to_stft(M: jax.Array, sr: int = 22050, n_fft: int = 2048,
                power: float = 2.0, nnls_iters: int = 64,
                n_mels: int | None = None, fmin: float = 0.0,
                fmax: float | None = None) -> jax.Array:
    """Approximate linear-frequency magnitudes from mel power.

    librosa.feature.inverse.mel_to_stft: NNLS solve then **(1/power).
    M: [..., n_mels, T] -> [..., 1 + n_fft//2, T].
    """
    if n_mels is None:
        n_mels = M.shape[-2]
    if fmax is None:
        fmax = sr / 2.0
    # Fetch the filterbank as host numpy so nnls can derive its static
    # Lipschitz/pinv warm-start even when this function is traced.
    fb = _mel._mel_filterbank_np(int(sr), int(n_fft), int(n_mels),
                                 float(fmin), float(fmax), False, "slaney")
    inv = _nnls.nnls(fb, M, n_iter=nnls_iters)
    return jnp.power(inv, 1.0 / power)


def mel_to_audio(M: jax.Array, sr: int = 22050, n_fft: int = 2048,
                 hop_length: int = 512, win_length: int | None = None,
                 power: float = 2.0, n_iter: int = 32, nnls_iters: int = 64,
                 length: int | None = None,
                 key: jax.Array | None = None,
                 init_phase: jax.Array | None = None) -> jax.Array:
    """librosa.feature.inverse.mel_to_audio equivalent, end-to-end on device.

    M: [..., n_mels, T] mel power spectrogram -> [..., n_samples] audio.
    init_phase: optional [..., 1 + n_fft//2, T] complex STFT whose angles
    seed Griffin-Lim (see griffin_lim).
    """
    S = mel_to_stft(M, sr=sr, n_fft=n_fft, power=power, nnls_iters=nnls_iters)
    return griffin_lim(S, n_iter=n_iter, hop_length=hop_length,
                       win_length=win_length, n_fft=n_fft, length=length,
                       key=key, init_phase=init_phase)
