"""Minimal .env loader (ref: utils/env_utils.py:9-25, minus the python-dotenv
dependency): parses KEY=VALUE lines from .env.local / .env into os.environ."""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional


def load_env_file(path: str | Path = ".env.local",
                  override: bool = False) -> dict:
    """Load KEY=VALUE pairs; returns what was parsed. Missing file -> {}."""
    path = Path(path)
    parsed: dict = {}
    if not path.exists():
        return parsed
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        key, _, value = line.partition("=")
        key, value = key.strip(), value.strip().strip("'\"")
        parsed[key] = value
        if override or key not in os.environ:
            os.environ[key] = value
    return parsed


def get_env(key: str, default: Optional[str] = None,
            env_file: str | Path = ".env.local") -> Optional[str]:
    """Env var lookup, falling back to the .env file (ref hf token flow,
    data/hf_utils.py:14-16)."""
    if key in os.environ:
        return os.environ[key]
    parsed = load_env_file(env_file)
    return parsed.get(key, default)
