"""The examples/ melody library and the committed demo assets, plus
`cli transfer` driven on a real (public-domain) melody — the
non-random-noise product-path artifact (VERDICT r02 #8)."""

from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def melodies():
    import sys
    sys.path.insert(0, str(REPO))
    from examples import melodies as m
    return m


def test_note_hz(melodies):
    assert melodies.note_hz("A4") == pytest.approx(440.0)
    assert melodies.note_hz("C4") == pytest.approx(261.6256, abs=1e-3)
    assert melodies.note_hz("F#4") == pytest.approx(369.9944, abs=1e-3)
    assert melodies.note_hz("Bb3") == pytest.approx(233.0819, abs=1e-3)


def test_render_melody_deterministic_and_tonal(melodies):
    y1 = melodies.render_melody("ode_to_joy", "piano", min_seconds=3.0)
    y2 = melodies.render_melody("ode_to_joy", "piano", min_seconds=3.0)
    np.testing.assert_array_equal(y1, y2)
    assert np.abs(y1).max() == pytest.approx(0.5, abs=1e-6)
    # first note is E4: the dominant FFT bin of the first half-second
    # must sit at its fundamental
    sr = melodies.SR
    seg = y1[: sr // 2] * np.hanning(sr // 2)
    freqs = np.fft.rfftfreq(len(seg), 1 / sr)
    peak = freqs[np.argmax(np.abs(np.fft.rfft(seg)))]
    assert abs(peak - melodies.note_hz("E4")) < 6.0, peak


def test_committed_demo_assets_exist_and_valid():
    out = REPO / "examples" / "demo_output"
    import jax

    from music_style_transfer_ldm_tpu.audio.io import load_audio
    for name in ("ode_to_joy_as_piano.wav", "ode_to_joy_violin_input.wav"):
        y, sr = load_audio(out / name)
        assert sr == 22050 and len(y) > sr and np.isfinite(y).all(), name
    assert (out / "ode_to_joy_as_piano.png").stat().st_size > 10_000


def test_cli_transfer_on_real_melody(tmp_path, monkeypatch, melodies):
    """cli transfer end-to-end on a melodic WAV (not noise): violin Ode to
    Joy -> piano-voice style image, fused sampler + --match-level."""
    import jax
    import jax.numpy as jnp

    from music_style_transfer_ldm_tpu.audio.io import load_audio, write_wav
    from music_style_transfer_ldm_tpu.cli import main
    from music_style_transfer_ldm_tpu.config import default_config
    from music_style_transfer_ldm_tpu.models.ldm import LDM
    from music_style_transfer_ldm_tpu.training import checkpoint as ckpt_lib

    monkeypatch.chdir(tmp_path)
    cfg = default_config()
    model = LDM(latent_dim=cfg.model.latent_dim,
                num_timesteps=cfg.diffusion.num_timesteps,
                dtype=jnp.bfloat16)
    x = jnp.zeros((1, 128, 128, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "diffusion": jax.random.PRNGKey(1)}, x, x,
        jnp.zeros((1,), jnp.int32))
    ckpt_lib.save_pytree(tmp_path / "ckpt",
                         {"params": variables["params"],
                          "batch_stats": variables.get("batch_stats", {})})

    # twinkle at 120 bpm is one 7 s pass: 3 chunks after padding
    write_wav(tmp_path / "content.wav",
              melodies.render_melody("twinkle", "violin",
                                     min_seconds=4.0), 22050)
    write_wav(tmp_path / "style.wav",
              melodies.render_melody("greensleeves", "piano",
                                     min_seconds=3.0), 22050)
    assert main(["transfer", "--checkpoint", str(tmp_path / "ckpt"),
                 "--content", str(tmp_path / "content.wav"),
                 "--style", str(tmp_path / "style.wav"),
                 "--sampler", "fused", "--steps", "8", "--match-level",
                 "--output", str(tmp_path / "out")]) == 0
    y, sr = load_audio(tmp_path / "out.wav")
    assert sr == 22050 and np.isfinite(y).all()
    # whole 3 s chunks out, at least two of them
    assert len(y) % (3 * sr) == 0 and len(y) >= 2 * 3 * sr
