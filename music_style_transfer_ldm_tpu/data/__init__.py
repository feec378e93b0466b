"""Acquisition + offline ETL (ref: data/ in the reference)."""

from music_style_transfer_ldm_tpu.data.downloader import AudioDownloader  # noqa: F401
from music_style_transfer_ldm_tpu.data.build_dataset import (  # noqa: F401
    build_dataset_folder_structure, build_dataset_df, chunk_audio,
)
