"""Golden tests for the JAX STFT/ISTFT against an independent naive
numpy implementation of librosa's conventions, plus perfect-reconstruction
and shape checks (replaces the reference's untested librosa delegation,
ref: data/audio_processor.py:44-53,102-111)."""

import numpy as np
import pytest

from music_style_transfer_ldm_tpu.audio import stft as S


def naive_stft(y, n_fft, hop, win_length=None):
    """Independent reference: explicit frame loop + np.fft.rfft."""
    if win_length is None:
        win_length = n_fft
    n = np.arange(win_length)
    w = 0.5 - 0.5 * np.cos(2 * np.pi * n / win_length)
    lpad = (n_fft - win_length) // 2
    w = np.pad(w, (lpad, n_fft - win_length - lpad))
    yp = np.pad(y, (n_fft // 2, n_fft // 2))
    nf = 1 + (len(yp) - n_fft) // hop
    out = np.empty((1 + n_fft // 2, nf), np.complex128)
    for t in range(nf):
        out[:, t] = np.fft.rfft(yp[t * hop:t * hop + n_fft] * w)
    return out


@pytest.mark.parametrize("n_fft,hop", [(2048, 512), (1024, 256), (512, 128)])
def test_stft_matches_naive(rng, n_fft, hop):
    y = rng.randn(3 * 22050 // 4).astype(np.float32)
    got = np.asarray(S.stft(y, n_fft=n_fft, hop_length=hop))
    want = naive_stft(y, n_fft, hop)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_stft_num_frames_3s_chunk():
    # 3 s @ 22050 Hz must give 130 frames: the reference's 128x130 image
    # geometry (ref: report/data.tex:305-314, models/dataset.py:51).
    assert S.num_frames(3 * 22050, 2048, 512) == 130


def test_stft_batched_equals_loop(rng):
    y = rng.randn(3, 8192).astype(np.float32)
    batch = np.asarray(S.stft(y, n_fft=1024, hop_length=256))
    for i in range(3):
        single = np.asarray(S.stft(y[i], n_fft=1024, hop_length=256))
        np.testing.assert_allclose(batch[i], single, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n_fft,hop", [(2048, 512), (1024, 512)])
def test_istft_perfect_reconstruction(rng, n_fft, hop):
    y = rng.randn(22050).astype(np.float32)
    spec = S.stft(y, n_fft=n_fft, hop_length=hop)
    y2 = np.asarray(S.istft(spec, n_fft=n_fft, hop_length=hop,
                            length=len(y)))
    # Interior must reconstruct to float tolerance (NOLA); edges are tapered.
    m = n_fft
    np.testing.assert_allclose(y2[m:-m], y[m:-m], rtol=1e-4, atol=1e-5)


def test_istft_batched(rng):
    y = rng.randn(2, 16384).astype(np.float32)
    spec = S.stft(y, n_fft=1024, hop_length=256)
    y2 = np.asarray(S.istft(spec, n_fft=1024, hop_length=256,
                            length=y.shape[-1]))
    assert y2.shape == y.shape
    np.testing.assert_allclose(y2[:, 1024:-1024], y[:, 1024:-1024],
                               rtol=1e-4, atol=1e-5)


def test_hann_window_periodic():
    w = np.asarray(S.hann_window(8))
    expect = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(8) / 8)
    np.testing.assert_allclose(w, expect, atol=1e-7)
    assert w[0] == 0.0  # periodic (fftbins) convention


def test_overlap_add_scatter_fallback(rng):
    # n_fft % hop != 0 exercises the scatter path.
    y = rng.randn(5000).astype(np.float32)
    spec = S.stft(y, n_fft=1000, hop_length=300)
    y2 = np.asarray(S.istft(spec, n_fft=1000, hop_length=300, length=len(y)))
    np.testing.assert_allclose(y2[1000:-1000], y[1000:-1000],
                               rtol=1e-3, atol=1e-4)


def test_stft_custom_win_length(rng):
    """win_length < n_fft: window zero-padded centered (librosa pad_center)."""
    y = rng.randn(8192).astype(np.float32)
    got = np.asarray(S.stft(y, n_fft=1024, hop_length=256, win_length=512))
    want = naive_stft(y, 1024, 256, win_length=512)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_istft_length_longer_pads(rng):
    y = rng.randn(4096).astype(np.float32)
    spec = S.stft(y, n_fft=1024, hop_length=256)
    out = np.asarray(S.istft(spec, n_fft=1024, hop_length=256, length=5000))
    assert out.shape == (5000,)
    assert np.abs(out[4500:]).max() == 0.0  # zero-padded tail


def test_stft_np_matches_device_stft(rng):
    """The host-side numpy mirror (relay-safe phase extraction) equals the
    jitted STFT, batched and single."""
    y = rng.randn(2, 8192).astype(np.float32)
    got = S.stft_np(y, n_fft=1024, hop_length=256)
    want = np.asarray(S.stft(y, n_fft=1024, hop_length=256))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    got1 = S.stft_np(y[0], n_fft=1024, hop_length=256)
    np.testing.assert_allclose(got1, want[0], rtol=1e-4, atol=1e-4)
