"""Public-domain melodies rendered by additive synthesis (no network,
no ffmpeg — the WAVs are synthesized from note tables, so the committed
demo assets are licence-clean by construction).

The tunes are centuries-old public-domain works (Beethoven's Ode to Joy
theme, 1824; the French folk tune behind Twinkle Twinkle, 1761;
Greensleeves, 16th century) transcribed here as (note, beats) tables.
Voices reuse the instrument harmonic profiles of the fullscale recipe
(tools/fullscale_run.py) so the demo timbres match the trained corpus.
"""

from __future__ import annotations

import numpy as np

SR = 22050

# name -> (harmonic amplitudes, envelope decay /s, vibrato Hz)
VOICES = {
    "piano": ([1.0, 0.45, 0.22, 0.1, 0.05], 3.0, 0.0),
    "guitar": ([1.0, 0.6, 0.25, 0.12, 0.08, 0.05], 5.0, 0.0),
    "violin": ([1.0, 0.35, 0.3, 0.15, 0.1], 0.3, 5.5),
    "harp": ([1.0, 0.3, 0.12, 0.04], 7.0, 0.0),
}

_SEMITONE = {"C": 0, "D": 2, "E": 4, "F": 5, "G": 7, "A": 9, "B": 11}


def note_hz(name: str) -> float:
    """'A4' -> 440.0; supports sharps ('F#4') and flats ('Bb3')."""
    letter, rest = name[0], name[1:]
    semi = _SEMITONE[letter.upper()]
    if rest.startswith("#"):
        semi, rest = semi + 1, rest[1:]
    elif rest.startswith("b"):
        semi, rest = semi - 1, rest[1:]
    octave = int(rest)
    midi = 12 * (octave + 1) + semi
    return 440.0 * 2.0 ** ((midi - 69) / 12.0)


# (note, beats); None = rest.
MELODIES = {
    # Beethoven, Symphony No. 9 — Ode to Joy theme (public domain).
    "ode_to_joy": [
        ("E4", 1), ("E4", 1), ("F4", 1), ("G4", 1),
        ("G4", 1), ("F4", 1), ("E4", 1), ("D4", 1),
        ("C4", 1), ("C4", 1), ("D4", 1), ("E4", 1),
        ("E4", 1.5), ("D4", 0.5), ("D4", 2),
        ("E4", 1), ("E4", 1), ("F4", 1), ("G4", 1),
        ("G4", 1), ("F4", 1), ("E4", 1), ("D4", 1),
        ("C4", 1), ("C4", 1), ("D4", 1), ("E4", 1),
        ("D4", 1.5), ("C4", 0.5), ("C4", 2),
    ],
    # "Ah! vous dirai-je, maman" (1761) — Twinkle Twinkle (public domain).
    "twinkle": [
        ("C4", 1), ("C4", 1), ("G4", 1), ("G4", 1),
        ("A4", 1), ("A4", 1), ("G4", 2),
        ("F4", 1), ("F4", 1), ("E4", 1), ("E4", 1),
        ("D4", 1), ("D4", 1), ("C4", 2),
    ],
    # Greensleeves (16th c., public domain) — opening phrase.
    "greensleeves": [
        ("A3", 1), ("C4", 2), ("D4", 1), ("E4", 1.5), ("F4", 0.5),
        ("E4", 1), ("D4", 2), ("B3", 1), ("G3", 1.5), ("A3", 0.5),
        ("B3", 1), ("C4", 2), ("A3", 1), ("A3", 1.5), ("G#3", 0.5),
        ("A3", 1), ("B3", 2), ("G#3", 1), ("E3", 2),
    ],
}


def render_melody(melody: str, voice: str = "piano", bpm: float = 120.0,
                  min_seconds: float = 0.0, gain: float = 0.5,
                  sr: int = SR) -> np.ndarray:
    """Render a named melody with an instrument voice; loops the tune if
    needed to reach min_seconds.  Deterministic (no randomness)."""
    harmonics, decay, vibrato = VOICES[voice]
    notes = MELODIES[melody]
    spb = 60.0 / bpm  # seconds per beat
    total = sum(b for _, b in notes) * spb
    reps = max(1, int(np.ceil(min_seconds / total)))
    segments = []
    for _ in range(reps):
        for note, beats in notes:
            n = int(round(beats * spb * sr))
            t = np.arange(n) / sr
            if note is None:
                segments.append(np.zeros(n, np.float32))
                continue
            f0 = note_hz(note)
            if vibrato:
                f0 = f0 * (1 + 0.01 * np.sin(2 * np.pi * vibrato * t))
            env = np.exp(-decay * t) * np.minimum(1.0, t * 200.0)
            wave = sum(a * np.sin(2 * np.pi * f0 * (k + 1) * t)
                       for k, a in enumerate(harmonics))
            segments.append((env * wave).astype(np.float32))
    y = np.concatenate(segments)
    return (gain * y / max(1e-6, np.abs(y).max())).astype(np.float32)
