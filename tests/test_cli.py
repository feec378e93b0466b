"""CLI surface tests (replaces the reference's bare argparse,
ref: models/train.py:318-329)."""

import numpy as np
import pytest

from music_style_transfer_ldm_tpu.cli import build_parser, main
from music_style_transfer_ldm_tpu.audio.io import write_wav


def test_parser_subcommands():
    p = build_parser()
    args = p.parse_args(["train", "--model", "autoencoder"])
    assert args.model == "autoencoder"
    args = p.parse_args(["transfer", "--checkpoint", "c", "--content", "a",
                         "--style", "b"])
    assert args.steps == 100 and args.eta == 0.0
    args = p.parse_args(["distill", "--checkpoint", "c",
                         "--stages", "8,4"])
    assert args.stages == "8,4" and args.t_max == 100
    with pytest.raises(SystemExit):
        p.parse_args(["train"])  # --model required
    with pytest.raises(SystemExit):
        p.parse_args(["train", "--model", "nope"])


def test_download_requires_source(capsys):
    assert main(["download"]) == 2
    assert "--csv/--file/--url" in capsys.readouterr().err


def test_build_dataset_and_pairings(tmp_path, monkeypatch, rng):
    monkeypatch.chdir(tmp_path)
    sr = 22050
    for label in ["piano", "guitar"]:
        d = tmp_path / "downloads" / label
        d.mkdir(parents=True)
        t = np.arange(4 * sr) / sr
        y = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.01 * rng.randn(len(t))
        write_wav(d / "song.wav", y.astype(np.float32), sr)

    assert main(["build-dataset"]) == 0
    pngs = list((tmp_path / "processed_images").rglob("*.png"))
    # 4 s -> 2 chunks per file (second zero-padded), 2 files.
    assert len(pngs) == 4
    from PIL import Image
    img = Image.open(pngs[0])
    assert img.size == (130, 128)  # (W, H): 130 frames x 128 mels

    assert main(["generate-pairings", "--num-pairs", "6"]) == 0
    lines = (tmp_path /
             "spectrogram_pair_dataset_pairings.csv").read_text().splitlines()
    assert len(lines) == 6


def test_transfer_fused_sampler_end_to_end(tmp_path, monkeypatch):
    """cli transfer --sampler fused: WAV in -> WAV + PNG out via the fused
    Pallas trajectory kernel (interpret mode on CPU)."""
    import jax
    import jax.numpy as jnp
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
    ckpt_lib.save_pytree(tmp_path / "ldm_ckpt",
                         {"params": variables["params"],
                          "batch_stats": variables.get("batch_stats", {})})

    sr = 22050
    t = np.arange(3 * sr) / sr
    write_wav(tmp_path / "content.wav",
              (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), sr)
    write_wav(tmp_path / "style.wav",
              (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), sr)

    assert main(["transfer", "--checkpoint", str(tmp_path / "ldm_ckpt"),
                 "--content", str(tmp_path / "content.wav"),
                 "--style", str(tmp_path / "style.wav"),
                 "--sampler", "fused", "--steps", "8",
                 "--output", str(tmp_path / "out")]) == 0
    assert (tmp_path / "out.wav").exists()


def test_build_dataset_parquet(tmp_path, monkeypatch, rng):
    monkeypatch.chdir(tmp_path)
    sr = 22050
    d = tmp_path / "downloads" / "violin"
    d.mkdir(parents=True)
    y = (0.3 * np.sin(2 * np.pi * 330 * np.arange(3 * sr) / sr)
         ).astype(np.float32)
    write_wav(d / "v.wav", y, sr)
    assert main(["build-dataset", "--parquet", "ds.parquet"]) == 0
    import pandas as pd
    df = pd.read_parquet(tmp_path / "ds.parquet")
    assert list(df.columns) == ["spectogram", "instrument", "title",
                                "chunk_id"]
    assert df.iloc[0]["instrument"] == "violin"
    assert isinstance(df.iloc[0]["spectogram"], bytes)


def test_warn_distill_mismatch(tmp_path, capsys):
    """Sampling a distilled student off its training grid warns; the
    matching grid (--steps t_max --sample-steps N+1, as the post-distill
    hint now prints) stays silent (ADVICE r03)."""
    import argparse

    from music_style_transfer_ldm_tpu.cli import _warn_distill_mismatch
    from music_style_transfer_ldm_tpu.training import checkpoint as ckpt_lib

    ckpt = tmp_path / "student"
    ckpt_lib.save_pytree(ckpt, {
        "params": {"w": np.zeros(2, np.float32)},
        "batch_stats": {},
        "format_version": np.asarray(ckpt_lib.FORMAT_VERSION),
        "distill": {"steps": 6, "t_max": 50, "stages": [48, 24, 12, 6],
                    "guidance": 1.0}})

    def ns(steps, sample_steps):
        return argparse.Namespace(checkpoint=str(ckpt), steps=steps,
                                  sample_steps=sample_steps)

    # The transfer defaults (--steps 100, full grid) are off-grid for a
    # t_max=50 student: must warn.
    _warn_distill_mismatch(ns(100, 7))
    assert "WARNING" in capsys.readouterr().err
    _warn_distill_mismatch(ns(50, 8))
    assert "WARNING" in capsys.readouterr().err
    # The hinted command is silent.
    _warn_distill_mismatch(ns(50, 7))
    assert capsys.readouterr().err == ""

    # Stock (non-distilled) checkpoints never warn.
    stock = tmp_path / "stock"
    ckpt_lib.save_pytree(stock, {
        "params": {"w": np.zeros(2, np.float32)}, "batch_stats": {},
        "format_version": np.asarray(ckpt_lib.FORMAT_VERSION)})
    _warn_distill_mismatch(argparse.Namespace(checkpoint=str(stock),
                                              steps=100, sample_steps=None))
    assert capsys.readouterr().err == ""


def test_serve_adopts_distilled_grid(tmp_path, capsys):
    """`serve` over a distilled checkpoint adopts the student's trained
    grid per model (steps=t_max, sample_steps=N+1) when --sample-steps is
    unset; a pinned off-grid choice warns; stock checkpoints and matching
    pins pass the config through untouched."""
    import argparse

    from music_style_transfer_ldm_tpu.cli import _serve_engine_config
    from music_style_transfer_ldm_tpu.serving import EngineConfig
    from music_style_transfer_ldm_tpu.training import checkpoint as ckpt_lib

    student = tmp_path / "student"
    ckpt_lib.save_pytree(student, {
        "params": {"w": np.zeros(2, np.float32)},
        "batch_stats": {},
        "format_version": np.asarray(ckpt_lib.FORMAT_VERSION),
        "distill": {"steps": 6, "t_max": 50, "stages": [48, 24, 12, 6],
                    "guidance": 1.0}})
    stock = tmp_path / "stock"
    ckpt_lib.save_pytree(stock, {
        "params": {"w": np.zeros(2, np.float32)}, "batch_stats": {},
        "format_version": np.asarray(ckpt_lib.FORMAT_VERSION)})

    ecfg = EngineConfig(steps=100, sample_steps=None)

    def ns(steps, sample_steps):
        return argparse.Namespace(steps=steps, sample_steps=sample_steps)

    # Unpinned: the student's grid is adopted, with a note.
    got = _serve_engine_config(ecfg, ns(100, None), str(student), "m")
    assert (got.steps, got.sample_steps) == (50, 7)
    assert "trained grid" in capsys.readouterr().out

    # Pinned off-grid: config unchanged but the user is warned.
    got = _serve_engine_config(ecfg, ns(100, 13), str(student), "m")
    assert got is ecfg
    assert "WARNING" in capsys.readouterr().err

    # Pinned on-grid: silent pass-through.
    got = _serve_engine_config(EngineConfig(steps=50, sample_steps=7),
                               ns(50, 7), str(student), "m")
    capture = capsys.readouterr()
    assert capture.err == "" and (got.steps, got.sample_steps) == (50, 7)

    # Stock checkpoint: untouched, silent.
    got = _serve_engine_config(ecfg, ns(100, None), str(stock), "m")
    assert got is ecfg and capsys.readouterr().err == ""


def test_transfer_dim_output_hint(tmp_path, monkeypatch, capsys):
    """cli transfer warns toward --match-level when the raw decoder
    output's global level sits far below the style reference's (the
    level-compression artifact documented at models/ldm.py:match_moments
    — a dim mel inverts to near-silent audio), and stays silent when
    --match-level is passed."""
    import jax
    import jax.numpy as jnp
    from music_style_transfer_ldm_tpu import cli as cli_mod
    from music_style_transfer_ldm_tpu.config import default_config
    from music_style_transfer_ldm_tpu.models import ldm as ldm_mod
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
    ckpt_lib.save_pytree(tmp_path / "ldm_ckpt",
                         {"params": variables["params"],
                          "batch_stats": variables.get("batch_stats", {})})

    sr = 22050
    t = np.arange(3 * sr) / sr
    write_wav(tmp_path / "content.wav",
              (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), sr)
    write_wav(tmp_path / "style.wav",
              (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), sr)

    def dim_transfer(model, variables, rng, content, style, **kw):
        # 4x-level-compressed output relative to any real style image.
        return np.full(content.shape, 0.02, np.float32), None, None

    monkeypatch.setattr(ldm_mod, "content_style_transfer", dim_transfer)

    base = ["transfer", "--checkpoint", str(tmp_path / "ldm_ckpt"),
            "--content", str(tmp_path / "content.wav"),
            "--style", str(tmp_path / "style.wav"), "--steps", "8"]
    assert cli_mod.main(base + ["--output", str(tmp_path / "dim")]) == 0
    assert "--match-level" in capsys.readouterr().err

    assert cli_mod.main(base + ["--match-level",
                                "--output", str(tmp_path / "ml")]) == 0
    assert "--match-level" not in capsys.readouterr().err


def test_warn_generate_distill_mismatch(tmp_path, capsys):
    """Generation-side grid advisory: a transfer-distilled student
    (t_max < T) warns for ANY --steps; a generation-distilled student
    (t_max == T) warns off its trained step count and is silent on it."""
    import argparse

    from music_style_transfer_ldm_tpu.cli import (
        _warn_generate_distill_mismatch,
    )
    from music_style_transfer_ldm_tpu.training import checkpoint as ckpt_lib

    transfer_student = tmp_path / "tstudent"
    ckpt_lib.save_pytree(transfer_student, {
        "params": {"w": np.zeros(2, np.float32)}, "batch_stats": {},
        "format_version": np.asarray(ckpt_lib.FORMAT_VERSION),
        "distill": {"steps": 6, "t_max": 50, "stages": [48, 24, 12, 6],
                    "guidance": 1.0}})
    gen_student = tmp_path / "gstudent"
    ckpt_lib.save_pytree(gen_student, {
        "params": {"w": np.zeros(2, np.float32)}, "batch_stats": {},
        "format_version": np.asarray(ckpt_lib.FORMAT_VERSION),
        "distill": {"steps": 6, "t_max": 200, "stages": [96, 48, 24, 12],
                    "guidance": 16.0}})

    def ns(ckpt, steps):
        return argparse.Namespace(checkpoint=str(ckpt), steps=steps)

    _warn_generate_distill_mismatch(ns(transfer_student, 7), 200)
    assert "TRANSFER over t_max=50" in capsys.readouterr().err
    _warn_generate_distill_mismatch(ns(gen_student, 100), 200)
    assert "expects --steps 7" in capsys.readouterr().err
    _warn_generate_distill_mismatch(ns(gen_student, 7), 200)
    assert capsys.readouterr().err == ""


def test_generation_cascade_grids_nest():
    """The full-schedule (t_max=200) cascade the guided-generation
    distillation uses (96->48->24->12) has nesting grids at every stage;
    the final student's 7-point grid equals the generation grid
    linspace(199, 0, 7) that `generate --steps 7` walks."""
    from music_style_transfer_ldm_tpu.diffusion.ddim import (
        generation_time_grid,
    )
    from music_style_transfer_ldm_tpu.training.distill import (
        distill_stage_grids,
    )

    prev_student = None
    for n_teacher in (96, 48, 24, 12):
        teacher, student = distill_stage_grids(200, n_teacher)
        np.testing.assert_array_equal(teacher[::2], student)
        if prev_student is not None:
            np.testing.assert_array_equal(prev_student, teacher)
        prev_student = student
    np.testing.assert_array_equal(prev_student,
                                  generation_time_grid(200, 7))
