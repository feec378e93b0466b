"""Tests for NNLS mel inversion and Griffin-Lim phase recovery — the
hardest numerical parity requirement (SURVEY.md section 7 'hard parts';
ref: data/audio_processor.py:81-100,132-154)."""

import numpy as np
import pytest

from music_style_transfer_ldm_tpu.audio import griffinlim as GL
from music_style_transfer_ldm_tpu.audio import mel as M
from music_style_transfer_ldm_tpu.audio import nnls as N
from music_style_transfer_ldm_tpu.audio import stft as S


def _tone_mix(rng, n, sr=22050):
    t = np.arange(n) / sr
    y = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.3 * np.sin(2 * np.pi * 880 * t)
         + 0.1 * np.sin(2 * np.pi * 1760 * t))
    return y.astype(np.float32)


def test_nnls_recovers_nonnegative_solution(rng):
    fb = np.asarray(M.mel_filterbank(22050, 2048, 128))
    X_true = np.abs(rng.randn(1025, 20)).astype(np.float32)
    Mel = fb @ X_true
    X = np.asarray(N.nnls(fb, Mel, n_iter=150))
    assert (X >= 0).all()
    # Residual in mel domain should be tiny (the system is underdetermined,
    # so X itself need not equal X_true, but B X must match M).
    resid = np.linalg.norm(fb @ X - Mel) / np.linalg.norm(Mel)
    assert resid < 5e-3


def test_nnls_batched(rng):
    fb = np.asarray(M.mel_filterbank(22050, 2048, 64))
    Mel = np.abs(rng.randn(3, 64, 10)).astype(np.float32)
    X = np.asarray(N.nnls(fb, Mel, n_iter=60))
    assert X.shape == (3, 1025, 10)
    single = np.asarray(N.nnls(fb, Mel[1], n_iter=60))
    np.testing.assert_allclose(X[1], single, rtol=1e-3, atol=1e-3)


def test_griffin_lim_recovers_tone(rng):
    y = _tone_mix(rng, 22050)
    mag = np.abs(np.asarray(S.stft(y, n_fft=2048, hop_length=512)))
    y2 = np.asarray(GL.griffin_lim(mag, n_iter=32, hop_length=512,
                                   length=len(y)))
    assert y2.shape == y.shape
    # Spectral convergence: |STFT(y2)| must be close to the target magnitude.
    mag2 = np.abs(np.asarray(S.stft(y2, n_fft=2048, hop_length=512)))
    sc = np.linalg.norm(mag2 - mag) / np.linalg.norm(mag)
    assert sc < 0.1


def test_griffin_lim_momentum_beats_vanilla(rng):
    y = _tone_mix(rng, 22050 // 2)
    mag = np.abs(np.asarray(S.stft(y, n_fft=1024, hop_length=256)))

    def sc(n_iter, momentum):
        y2 = np.asarray(GL.griffin_lim(mag, n_iter=n_iter, hop_length=256,
                                       momentum=momentum, length=len(y)))
        mag2 = np.abs(np.asarray(S.stft(y2, n_fft=1024, hop_length=256)))
        return np.linalg.norm(mag2 - mag) / np.linalg.norm(mag)

    # More iterations must not hurt; momentum must help at fixed budget.
    assert sc(32, 0.99) <= sc(8, 0.99) + 1e-3
    assert sc(16, 0.99) <= sc(16, 0.0) + 1e-3


def test_mel_to_audio_roundtrip_fidelity(rng):
    """Port of the reference's tests/audio_reconstruction_test.py with a
    numeric assertion: audio -> mel -> (NNLS + Griffin-Lim) -> audio must
    preserve the mel spectrogram within a small relative distance."""
    sr = 22050
    y = _tone_mix(rng, 3 * sr)
    mel_power = np.asarray(M.melspectrogram(y, sr=sr, n_mels=128))
    y2 = np.asarray(GL.mel_to_audio(mel_power, sr=sr, n_iter=32,
                                    nnls_iters=80, length=len(y)))
    assert y2.shape == y.shape
    mel2 = np.asarray(M.melspectrogram(y2, sr=sr, n_mels=128))
    # Compare in dB space (what the model and the listener see).
    db1 = np.asarray(M.power_to_db(mel_power))
    db2 = np.asarray(M.power_to_db(mel2))
    err = np.abs(db1 - db2).mean()
    assert err < 6.0, f"mean |dB| error {err}"


def test_mel_image_roundtrip_through_uint8(rng):
    """Full reference codec chain: audio -> dB mel -> uint8 image -> audio ->
    dB mel, asserting spectral fidelity (the BASELINE.md fidelity gate)."""
    from music_style_transfer_ldm_tpu.audio.processor import AudioProcessor
    ap = AudioProcessor()
    sr = 22050
    y = _tone_mix(np.random.RandomState(0), 3 * sr)
    db = ap.get_mel_spectrogram(y, n_mels=128)
    img = ap.mel_spectrogram_to_grayscale_image(db)
    assert img.shape == (128, 130) and img.dtype == np.uint8
    y2 = np.asarray(ap.grayscale_mel_spectrogram_image_to_audio(
        img, length=len(y)))
    db2 = np.asarray(ap.get_mel_spectrogram(np.asarray(y2), n_mels=128))
    err = np.abs(np.asarray(db) - db2).mean()
    assert err < 8.0, f"mean |dB| error {err}"


def test_mel_to_audio_batched(rng):
    sr = 22050
    y = np.stack([_tone_mix(rng, sr), rng.randn(sr).astype(np.float32) * 0.1])
    mel_power = np.asarray(M.melspectrogram(y, sr=sr, n_mels=64))
    out = np.asarray(GL.mel_to_audio(mel_power, sr=sr, n_iter=8,
                                     nnls_iters=30, length=sr))
    assert out.shape == (2, sr)
    assert np.isfinite(out).all()


def test_nnls_matches_scipy_golden(rng):
    """Golden check: batched FISTA vs scipy.optimize.nnls (the exact
    active-set solver librosa's mel inversion is built on) on a small
    well-conditioned system."""
    from scipy.optimize import nnls as scipy_nnls
    B = np.abs(rng.randn(12, 8)).astype(np.float32)  # overdetermined
    X_true = np.abs(rng.randn(8, 5)).astype(np.float32)
    X_true[rng.rand(*X_true.shape) < 0.3] = 0.0  # active constraints
    Mmat = B @ X_true
    got = np.asarray(N.nnls(B, Mmat, n_iter=400))
    want = np.stack([scipy_nnls(B, Mmat[:, j])[0]
                     for j in range(Mmat.shape[1])], axis=1)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_griffin_lim_phase_init_converges_faster(rng):
    """Seeding GL with the signal's own phases (phase reuse) must beat
    random init at a tiny iteration budget — the property behind
    `cli transfer --phase-init content`."""
    import jax.numpy as jnp
    sr = 22050
    t = np.arange(sr) / sr
    y = (0.4 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 659 * t)).astype(np.float32)
    spec = S.stft(y, n_fft=1024, hop_length=256)
    mag = jnp.abs(spec)

    def err(audio):
        got = np.abs(np.asarray(S.stft(jnp.asarray(audio), n_fft=1024,
                                       hop_length=256)))
        return float(np.linalg.norm(got - np.asarray(mag))
                     / np.linalg.norm(np.asarray(mag)))

    rand = np.asarray(GL.griffin_lim(mag, n_iter=2, hop_length=256,
                                     n_fft=1024, length=len(y)))
    seeded = np.asarray(GL.griffin_lim(mag, n_iter=2, hop_length=256,
                                       n_fft=1024, length=len(y),
                                       init_phase=spec))
    assert err(seeded) < 0.05, err(seeded)       # true phases: ~exact
    assert err(seeded) < 0.3 * err(rand)         # and far below random


def test_crossfade_stitch_reconstructs_overlapped_signal(rng):
    """Chunks cut from one signal at 50% overlap stitch back to the
    original (interior exactly: complementary linear ramps sum to 1);
    hop == length degrades to plain concatenation."""
    from music_style_transfer_ldm_tpu.audio.processor import crossfade_stitch
    from music_style_transfer_ldm_tpu.data.build_dataset import chunk_audio
    sr = 1000
    y = rng.randn(4 * sr).astype(np.float32)
    chunks = chunk_audio(y, sr, 1.0, None, hop_seconds=0.5)
    out = crossfade_stitch(chunks, sr // 2)
    n = min(len(out), len(y))
    np.testing.assert_allclose(out[:n], y[:n], atol=1e-6)

    disjoint = chunk_audio(y, sr, 1.0, None)
    cat = crossfade_stitch(disjoint, sr)
    np.testing.assert_array_equal(cat, disjoint.reshape(-1))

    # Gapped windows (hop > length) cannot be stitched: the old fast path
    # concatenated them with no gap, silently time-misaligning everything
    # after the first seam (ADVICE r03). Must raise instead.
    with pytest.raises(ValueError, match="hop_samples"):
        crossfade_stitch(disjoint, sr + 1)
    # A single chunk is fine regardless of hop.
    np.testing.assert_array_equal(crossfade_stitch(disjoint[:1], sr + 1),
                                  disjoint[0])


def test_griffin_lim_real_angle_init_equals_complex(rng):
    """init_phase as REAL angles (the relay-safe representation the CLI
    ships) equals the complex-STFT form."""
    import jax.numpy as jnp
    sr = 22050
    t = np.arange(sr // 2) / sr
    y = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    spec = S.stft(y, n_fft=1024, hop_length=256)
    mag = jnp.abs(spec)
    a = np.asarray(GL.griffin_lim(mag, n_iter=3, hop_length=256, n_fft=1024,
                                  length=len(y), init_phase=spec))
    b = np.asarray(GL.griffin_lim(mag, n_iter=3, hop_length=256, n_fft=1024,
                                  length=len(y),
                                  init_phase=jnp.angle(spec)))
    np.testing.assert_allclose(a, b, atol=1e-5)
