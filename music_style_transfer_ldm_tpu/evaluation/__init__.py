"""Evaluation & diagnostics (ref: models/tests.py's runnable checks,
re-done as a library)."""

from music_style_transfer_ldm_tpu.evaluation.diagnostics import (  # noqa: F401
    parameter_table, style_embedding_stats, detect_dead_style_encoder,
    reconstruction_grid, forward_visualization, ldm_forward_panel,
    spectral_convergence, mel_db_distance,
)
from music_style_transfer_ldm_tpu.evaluation.metrics import (  # noqa: F401
    band_statistics, batch_spectral_convergence, fad_metrics,
    frechet_distance, independent_transfer_metrics, log_mel_stats_distance,
    style_distance_reductions_multiseed, trunk_embeddings,
)
