"""Real-melody demo: the full product path on actual (public-domain)
music instead of random note soup.

    python examples/real_melody_demo.py [--workdir DIR] [--epochs N]

Renders Ode to Joy / Twinkle Twinkle / Greensleeves in four instrument
voices (examples/melodies.py), then drives ONLY the CLI surface:
build-dataset -> generate-pairings -> train autoencoder -> train ldm ->
transfer (Ode to Joy on violin -> piano style, with --match-level) ->
diagnose.  The transferred WAV + spectrogram PNG land in
examples/demo_output/ (the committed copies were produced by this script
on a TPU v5e; re-running reproduces them).

Replaces the reference's eyeball-only artifact flow
(ref: models/tests.py:1043-1132 saves PNGs from test functions) with one
reproducible script over the public CLI.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from examples.melodies import MELODIES, VOICES, render_melody  # noqa: E402


def synthesize_corpus(workdir: Path, min_seconds: float) -> None:
    from music_style_transfer_ldm_tpu.audio.io import write_wav
    for voice in VOICES:
        d = workdir / "downloads" / voice
        d.mkdir(parents=True, exist_ok=True)
        for melody in MELODIES:
            y = render_melody(melody, voice, min_seconds=min_seconds)
            write_wav(d / f"{melody}.wav", y, 22050)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="melody_demo_run")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--seconds", type=float, default=60.0,
                   help="min audio per melody rendition")
    p.add_argument("--out", default=str(REPO / "examples" / "demo_output"))
    args = p.parse_args()

    from music_style_transfer_ldm_tpu.utils.cache import (
        enable_compilation_cache,
    )
    enable_compilation_cache()

    workdir = Path(args.workdir).resolve()
    workdir.mkdir(parents=True, exist_ok=True)
    os.chdir(workdir)
    synthesize_corpus(Path("."), args.seconds)

    from music_style_transfer_ldm_tpu.cli import main as cli
    cli(["build-dataset"])
    cli(["generate-pairings", "--num-pairs", "512"])
    cli(["train", "--model", "autoencoder", "--epochs", str(args.epochs),
         "--out-dir", "runs/ae"])
    cli(["train", "--model", "ldm", "--epochs", str(args.epochs),
         "--pretrained-ae", "runs/ae/pretrained", "--out-dir", "runs/ldm"])
    # The product artifact: a recognizable melody in a different timbre,
    # with the full quality stack — dynamic-range matching, content-phase
    # Griffin-Lim seeding, and crossfaded overlapping chunks.
    cli(["transfer", "--checkpoint", "runs/ldm/ldm_final",
         "--content", "downloads/violin/ode_to_joy.wav",
         "--style", "processed_images/piano/greensleeves_chunk0.png",
         "--steps", str(args.steps), "--match-level",
         "--phase-init", "content", "--overlap", "0.5",
         "--output", "out/ode_to_joy_as_piano"])
    cli(["diagnose", "--checkpoint", "runs/ldm/ldm_final"])

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    for f in Path("out").glob("ode_to_joy_as_piano.*"):
        shutil.copy2(f, out / f.name)
    from music_style_transfer_ldm_tpu.audio.io import write_wav
    write_wav(out / "ode_to_joy_violin_input.wav",
              render_melody("ode_to_joy", "violin", min_seconds=9.0), 22050)
    print("\ndemo artifacts ->", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
