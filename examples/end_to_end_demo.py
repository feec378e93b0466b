"""End-to-end demo: synthesize a tiny dataset, train both phases, run a
style transfer, write audio — the whole framework in one script.

    python examples/end_to_end_demo.py [--workdir DIR] [--epochs N]

Runs on whatever accelerator jax selects (TPU if available, else CPU).
Replaces the reference's test.ipynb exploration notebook with a runnable,
deterministic script.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def synthesize_dataset(workdir: Path, seconds: float = 30.0) -> None:
    from music_style_transfer_ldm_tpu.audio.io import write_wav
    sr = 22050
    rng = np.random.RandomState(0)
    t = np.arange(int(seconds * sr)) / sr
    voices = {
        "piano": np.exp(-((t % 0.5) * 6)) * sum(
            a * np.sin(2 * np.pi * 262 * (k + 1) * t)
            for k, a in enumerate([0.5, 0.25, 0.12])),
        "violin": sum(a * np.sin(2 * np.pi * 440 * (k + 1)
                                 * t * (1 + 0.01 * np.sin(2 * np.pi * 5 * t)))
                      for k, a in enumerate([0.4, 0.3, 0.2])),
        "flute": 0.5 * np.sin(2 * np.pi * 523 * t) + 0.05 * rng.randn(len(t)),
    }
    for name, y in voices.items():
        d = workdir / "downloads" / name
        d.mkdir(parents=True, exist_ok=True)
        y = 0.5 * y / np.max(np.abs(y))
        write_wav(d / "clip.wav", y.astype(np.float32), sr)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="demo_run")
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args()

    from music_style_transfer_ldm_tpu.utils.cache import (
        enable_compilation_cache,
    )
    enable_compilation_cache()

    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    os.chdir(workdir)

    synthesize_dataset(Path("."))

    from music_style_transfer_ldm_tpu.cli import main as cli
    cli(["build-dataset"])
    cli(["generate-pairings", "--num-pairs", "64"])
    cli(["train", "--model", "autoencoder", "--epochs", str(args.epochs),
         "--out-dir", "runs/ae"])
    cli(["train", "--model", "ldm", "--epochs", str(args.epochs),
         "--pretrained-ae", "runs/ae/pretrained", "--out-dir", "runs/ldm"])
    cli(["transfer", "--checkpoint", "runs/ldm/ldm_final",
         "--content", "downloads/flute/clip.wav",
         "--style", "processed_images/piano/clip_chunk0.png",
         "--steps", str(args.steps), "--output", "out/transferred"])
    cli(["diagnose", "--checkpoint", "runs/ldm/ldm_final"])
    print("\ndemo complete — see", Path.cwd() / "out")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
