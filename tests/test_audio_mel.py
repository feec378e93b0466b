"""Tests for the Slaney mel filterbank, dB conversions and image quantizer
(replacing librosa calls at ref: data/audio_processor.py:44-73,94-100)."""

import numpy as np
import pytest

from music_style_transfer_ldm_tpu.audio import mel as M
from music_style_transfer_ldm_tpu.audio import quantize as Q


def test_hz_mel_roundtrip():
    f = np.array([0.0, 250.0, 999.0, 1000.0, 4000.0, 11025.0])
    np.testing.assert_allclose(M.mel_to_hz(M.hz_to_mel(f)), f, rtol=1e-10)


def test_hz_to_mel_slaney_values():
    # Linear region: mel = hz / (200/3).
    np.testing.assert_allclose(M.hz_to_mel(200.0), 3.0, rtol=1e-12)
    np.testing.assert_allclose(M.hz_to_mel(1000.0), 15.0, rtol=1e-12)
    # Log region: +27 mels per factor 6.4 above 1 kHz.
    np.testing.assert_allclose(M.hz_to_mel(6400.0), 42.0, rtol=1e-12)


def test_mel_filterbank_shape_and_structure():
    fb = np.asarray(M.mel_filterbank(22050, 2048, 128))
    assert fb.shape == (128, 1025)
    assert (fb >= 0).all()
    # Each filter is a single contiguous triangle.
    for i in range(0, 128, 17):
        nz = np.flatnonzero(fb[i])
        assert nz.size > 0
        assert np.array_equal(nz, np.arange(nz[0], nz[-1] + 1))
    # Slaney normalization: each filter integrates to ~2/(hz bandwidth),
    # i.e. peak * halfwidths sum to ~1 in continuous freq — check the
    # discrete approximation: sum(fb[i]) * df ~= 1 for interior filters.
    df = 22050 / 2.0 / 1024
    sums = fb.sum(axis=1) * df
    assert np.all(np.abs(sums[10:-10] - 1.0) < 0.15)


def test_mel_filterbank_energy_conservation_tone(rng):
    # A tone's mel spectrum should place its energy near the right mel bin.
    sr, n_fft = 22050, 2048
    fb = np.asarray(M.mel_filterbank(sr, n_fft, 128))
    freq_hz = 1500.0
    k = int(round(freq_hz * n_fft / sr))
    spec = np.zeros(1 + n_fft // 2, np.float32)
    spec[k] = 1.0
    mel = fb @ spec
    peak_bin = mel.argmax()
    centers = np.asarray(
        M.mel_to_hz(np.linspace(M.hz_to_mel(0.0), M.hz_to_mel(sr / 2), 130)))
    assert abs(centers[peak_bin + 1] - freq_hz) < 200.0


def test_power_to_db_ref_max_range(rng):
    S = rng.rand(128, 130).astype(np.float32) * 10
    db = np.asarray(M.power_to_db(S))
    assert db.max() == pytest.approx(0.0, abs=1e-5)
    assert db.min() >= -80.0 - 1e-5


def test_power_to_db_batched_per_item_ref(rng):
    S = rng.rand(4, 128, 130).astype(np.float32)
    S[2] *= 1000.0  # very different scale for one item
    db = np.asarray(M.power_to_db(S, batched=True))
    for i in range(4):
        assert db[i].max() == pytest.approx(0.0, abs=1e-4)


def test_db_power_roundtrip(rng):
    S = rng.rand(64, 50).astype(np.float32) + 0.1
    db = np.asarray(M.power_to_db(S, ref=1.0, top_db=None))
    back = np.asarray(M.db_to_power(db))
    np.testing.assert_allclose(back, S, rtol=1e-4)


def test_amplitude_db_roundtrip(rng):
    A = rng.rand(64, 50).astype(np.float32) + 0.1
    db = np.asarray(M.amplitude_to_db(A, ref=1.0, top_db=None))
    back = np.asarray(M.db_to_amplitude(db))
    np.testing.assert_allclose(back, A, rtol=1e-3)


def test_quantize_uint8_exact_grid():
    # Quantize->dequantize->quantize must be idempotent (stable grid).
    db = np.linspace(-80, 0, 256, dtype=np.float32).reshape(16, 16)
    u8 = np.asarray(Q.db_to_uint8_image(db))
    assert u8.dtype == np.uint8
    db2 = np.asarray(Q.uint8_image_to_db(u8))
    u8_2 = np.asarray(Q.db_to_uint8_image(db2))
    np.testing.assert_array_equal(u8, u8_2)
    # Max quantization error is half a step: 80/255/2 dB.
    assert np.abs(db2 - db).max() <= 80.0 / 255.0 / 2 + 1e-4


def test_quantize_matches_reference_formula(rng):
    # Bit-exact vs the reference numpy formula (audio_processor.py:62-69).
    db = (rng.rand(128, 130).astype(np.float32) * -80.0)
    ref = db + 80.0
    ref = ref * (255.0 / 80.0)
    ref = np.clip(ref, 0, 255)
    ref = (ref + 0.5).astype(np.uint8)
    got = np.asarray(Q.db_to_uint8_image(db))
    np.testing.assert_array_equal(got, ref)


def test_unit_image_matches_png_roundtrip(rng):
    db = rng.rand(128, 130).astype(np.float32) * -80.0
    u8 = np.asarray(Q.db_to_uint8_image(db))
    unit = np.asarray(Q.db_to_unit_image(db))
    np.testing.assert_allclose(unit, u8.astype(np.float32) / 255.0, atol=1e-7)


def test_melspectrogram_shapes(rng):
    y = rng.randn(2, 3 * 22050).astype(np.float32)
    mel = np.asarray(M.melspectrogram(y, n_mels=128))
    assert mel.shape == (2, 128, 130)
    assert (mel >= 0).all()


def test_melspectrogram_fmax_band_limit(rng):
    """fmax below Nyquist: filters above fmax are zero; a tone above fmax
    contributes (almost) nothing."""
    sr = 22050
    t = np.arange(sr) / sr
    hi_tone = (0.5 * np.sin(2 * np.pi * 9000 * t)).astype(np.float32)
    full = np.asarray(M.melspectrogram(hi_tone, sr=sr, n_mels=64))
    limited = np.asarray(M.melspectrogram(hi_tone, sr=sr, n_mels=64,
                                          fmax=4000.0))
    assert full.sum() > 100 * limited.sum()
