"""Utilities."""

from music_style_transfer_ldm_tpu.utils.env import load_env_file, get_env  # noqa: F401
