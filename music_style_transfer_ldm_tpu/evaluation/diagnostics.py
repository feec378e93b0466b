"""Model diagnostics and evaluation metrics.

Library-form replacements for the reference's script-style checks
(ref: models/tests.py): parameter-count table (:878 test_model_parameters),
dead-style-encoder detection via embedding std (:918), autoencoder
reconstruction grids (:323), LDM forward visualization (:1135), plus
numeric audio-fidelity metrics the reference only eyeballed.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def parameter_table(params: Dict) -> Dict[str, int]:
    """Per-component + total parameter counts
    (ref: tests.py:878-916 prints the same table)."""
    table = {}
    for name, sub in params.items():
        table[name] = int(sum(np.prod(x.shape)
                              for x in jax.tree_util.tree_leaves(sub)))
    table["total"] = sum(table.values())
    return table


def style_embedding_stats(embeddings: Dict[str, jax.Array]
                          ) -> Dict[str, Dict[str, float]]:
    """Mean/std/zero-fraction per pyramid level."""
    out = {}
    for k, v in embeddings.items():
        v = np.asarray(v, np.float32)
        out[k] = {"mean": float(v.mean()), "std": float(v.std()),
                  "zero_fraction": float((v == 0).mean())}
    return out


def detect_dead_style_encoder(embeddings: Dict[str, jax.Array],
                              std_threshold: float = 1e-4) -> Dict[str, bool]:
    """True per level if the embedding has (near-)zero variance across a
    batch of distinct styles — the reference's dead-encoder probe
    (ref: tests.py:918-1026)."""
    stats = style_embedding_stats(embeddings)
    return {k: s["std"] < std_threshold for k, s in stats.items()}


def reconstruction_grid(originals: np.ndarray, reconstructions: np.ndarray,
                        out_path: Optional[str] = None,
                        max_items: int = 8) -> Optional[np.ndarray]:
    """Side-by-side original/reconstruction image grid
    (ref: tests.py:323-376).  Returns the grid array; writes a PNG when
    out_path is given."""
    n = min(max_items, originals.shape[0])
    o = np.asarray(originals)[:n, :, :, 0]
    r = np.asarray(reconstructions)[:n, :, :, 0]
    rows = [np.concatenate([o[i], r[i]], axis=1) for i in range(n)]
    grid = np.concatenate(rows, axis=0)
    from music_style_transfer_ldm_tpu.audio.quantize import (
        unit_image_to_uint8,
    )
    grid_u8 = np.asarray(unit_image_to_uint8(grid))
    if out_path:
        from PIL import Image
        Image.fromarray(grid_u8, mode="L").save(out_path)
    return grid_u8


def forward_visualization(outputs: Dict[str, jax.Array],
                          out_path: Optional[str] = None) -> Dict[str, float]:
    """Summarize an LDM forward pass (ref: tests.py:1135-1287): per-tensor
    ranges plus an optional panel image of z_t / reconstruction."""
    summary = {}
    for k in ("z_t", "noise", "noise_pred", "z_0", "reconstructed"):
        v = np.asarray(outputs[k], np.float32)
        summary[f"{k}_min"] = float(v.min())
        summary[f"{k}_max"] = float(v.max())
        summary[f"{k}_std"] = float(v.std())
    if out_path:
        rec = np.asarray(outputs["reconstructed"])[0, :, :, 0]
        from PIL import Image
        from music_style_transfer_ldm_tpu.audio.quantize import (
            unit_image_to_uint8,
        )
        Image.fromarray(np.asarray(unit_image_to_uint8(rec)),
                        mode="L").save(out_path)
    return summary


# ---------------- numeric fidelity metrics ---------------------------------


def spectral_convergence(target_mag: jax.Array, got_mag: jax.Array) -> float:
    """||got - target||_F / ||target||_F over magnitude spectrograms."""
    t = jnp.asarray(target_mag, jnp.float32)
    g = jnp.asarray(got_mag, jnp.float32)
    return float(jnp.linalg.norm(g - t) / (jnp.linalg.norm(t) + 1e-12))


def mel_db_distance(audio_a: jax.Array, audio_b: jax.Array,
                    sr: int = 22050, n_mels: int = 128) -> float:
    """Mean |dB| distance between two clips' log-mel spectrograms — the
    numeric form of the reference's listen-and-look evaluation
    (ref: tests/audio_reconstruction_test.py)."""
    from music_style_transfer_ldm_tpu.audio.mel import (
        melspectrogram, power_to_db,
    )
    a = power_to_db(melspectrogram(jnp.asarray(audio_a), sr=sr,
                                   n_mels=n_mels))
    b = power_to_db(melspectrogram(jnp.asarray(audio_b), sr=sr,
                                   n_mels=n_mels))
    return float(jnp.abs(a - b).mean())


def ldm_forward_panel(outputs: Dict[str, jax.Array], content: jax.Array,
                      style: jax.Array, out_path: str,
                      item: int = 0) -> None:
    """Multi-panel PNG of one LDM forward pass: content | style | z_t
    channel | predicted reconstruction — the artifact the reference's
    test_ldm_forward_function saves for visual inspection
    (ref: models/tests.py:1135-1287, incl. the noise-content variant :1211).
    """
    from PIL import Image
    from music_style_transfer_ldm_tpu.audio.quantize import (
        unit_image_to_uint8,
    )

    def norm01(x):
        x = np.asarray(x, np.float32)
        lo, hi = x.min(), x.max()
        return (x - lo) / (hi - lo + 1e-8)

    h = content.shape[1]
    panels = [
        np.asarray(content)[item, :, :, 0],
        np.asarray(style)[item, :, :, 0],
        _resize_nearest(norm01(np.asarray(outputs["z_t"])[item, :, :, 0]), h),
        np.asarray(outputs["reconstructed"])[item, :, :, 0],
    ]
    strip = np.concatenate([np.clip(p, 0, 1) for p in panels], axis=1)
    Image.fromarray(np.asarray(unit_image_to_uint8(strip)),
                    mode="L").save(out_path)


def _resize_nearest(x: np.ndarray, size: int) -> np.ndarray:
    """Nearest-neighbor upsample of a small 2-D map to size x size."""
    ry = np.linspace(0, x.shape[0] - 1, size).round().astype(int)
    rx = np.linspace(0, x.shape[1] - 1, size).round().astype(int)
    return x[np.ix_(ry, rx)]
