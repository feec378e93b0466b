"""Diagnostics/evaluation tests (ref: models/tests.py:878,918 behaviors)."""

import jax
import jax.numpy as jnp
import numpy as np

from music_style_transfer_ldm_tpu.evaluation import (
    detect_dead_style_encoder, forward_visualization, mel_db_distance,
    parameter_table, reconstruction_grid, spectral_convergence,
    style_embedding_stats,
)
from music_style_transfer_ldm_tpu.models import LDM, StyleEncoder


def test_parameter_table_matches_reference_counts():
    ldm = LDM(latent_dim=32)
    x = jnp.zeros((1, 128, 128, 1))
    variables = ldm.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        x, x, jnp.zeros((1,), jnp.int32))
    table = parameter_table(variables["params"])
    assert table["encoder"] == 111840       # report/results.tex:98
    assert table["decoder"] == 198209       # report/results.tex:99
    assert table["style_encoder"] == 2729984  # report/results.tex:100
    assert table["total"] == sum(v for k, v in table.items() if k != "total")


def test_dead_style_encoder_detection(rng):
    se = StyleEncoder()
    styles = jnp.asarray(rng.rand(8, 128, 128, 1).astype(np.float32))
    variables = se.init(jax.random.PRNGKey(0), styles)
    embs = se.apply(variables, styles)
    dead = detect_dead_style_encoder(embs)
    assert not any(dead.values())  # healthy random init is not dead
    # A constant embedding must be flagged.
    embs_dead = {k: jnp.zeros_like(v) for k, v in embs.items()}
    assert all(detect_dead_style_encoder(embs_dead).values())
    stats = style_embedding_stats(embs)
    assert set(stats) == {"s1", "s2", "s3", "s4", "s5", "s6"}


def test_reconstruction_grid(tmp_path, rng):
    o = rng.rand(4, 128, 128, 1).astype(np.float32)
    r = rng.rand(4, 128, 128, 1).astype(np.float32)
    grid = reconstruction_grid(o, r, out_path=str(tmp_path / "grid.png"))
    assert grid.shape == (4 * 128, 2 * 128)
    assert (tmp_path / "grid.png").exists()


def test_forward_visualization_summary(rng):
    outputs = {k: jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))
               for k in ("z_t", "noise", "noise_pred", "z_0")}
    outputs["reconstructed"] = jnp.asarray(
        rng.rand(2, 128, 128, 1).astype(np.float32))
    s = forward_visualization(outputs)
    assert "z_t_std" in s and "reconstructed_max" in s


def test_spectral_convergence_zero_for_identical(rng):
    m = rng.rand(128, 50).astype(np.float32)
    assert spectral_convergence(m, m) == 0.0
    assert spectral_convergence(m, m * 2) > 0.5


def test_mel_db_distance(rng):
    a = rng.randn(22050).astype(np.float32) * 0.1
    assert mel_db_distance(a, a) == 0.0
    b = rng.randn(22050).astype(np.float32) * 0.1
    assert mel_db_distance(a, b) > 1.0


def test_ldm_forward_panel(tmp_path, rng):
    from music_style_transfer_ldm_tpu.evaluation import ldm_forward_panel
    outputs = {
        "z_t": jnp.asarray(rng.randn(1, 16, 16, 32).astype(np.float32)),
        "reconstructed": jnp.asarray(
            rng.rand(1, 128, 128, 1).astype(np.float32)),
    }
    content = rng.rand(1, 128, 128, 1).astype(np.float32)
    style = rng.rand(1, 128, 128, 1).astype(np.float32)
    out = tmp_path / "panel.png"
    ldm_forward_panel(outputs, content, style, str(out))
    from PIL import Image
    img = Image.open(out)
    assert img.size == (4 * 128, 128)


def test_eval_generate_tool(tmp_path, rng):
    """tools/eval_generate.py end-to-end on a tiny pack + fresh
    checkpoint: JSON written with FAD + floors/ceiling + spread keys."""
    import json
    import sys

    import jax
    import jax.numpy as jnp

    import tools.eval_generate as eg
    from music_style_transfer_ldm_tpu.config import default_config
    from music_style_transfer_ldm_tpu.datasets.packed import write_pack
    from music_style_transfer_ldm_tpu.models.ldm import LDM
    from music_style_transfer_ldm_tpu.training import checkpoint as ckpt_lib

    images = rng.randint(0, 256, (16, 128, 130), np.uint8)
    labels = (np.arange(16, dtype=np.uint16) % 2)
    write_pack(tmp_path / "d.spk", images, labels, ["a", "b"])

    cfg = default_config()
    model = LDM(latent_dim=cfg.model.latent_dim,
                num_timesteps=cfg.diffusion.num_timesteps,
                dtype=jnp.bfloat16)
    x = jnp.zeros((1, 128, 128, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        x, x, jnp.zeros((1,), jnp.int32))
    ckpt_lib.save_pytree(tmp_path / "ckpt",
                         {"params": variables["params"],
                          "batch_stats": variables.get("batch_stats", {})})

    old = sys.argv
    sys.argv = ["eval_generate", "--checkpoint", str(tmp_path / "ckpt"),
                "--pack", str(tmp_path / "d.spk"), "--style-class", "0",
                "--n", "2", "--steps", "2",
                "--out", str(tmp_path / "gen.json")]
    try:
        assert eg.main() == 0
    finally:
        sys.argv = old
    r = json.loads((tmp_path / "gen.json").read_text())
    for k in ("fad_generated_vs_style_corpus", "fad_real_vs_real_floor",
              "fad_other_class_ceiling", "pairwise_spread_generated",
              "pairwise_spread_real"):
        assert np.isfinite(r[k]), k
    assert r["class_name"] == "a" and r["n"] == 2


def test_summarize_evals_tool(tmp_path, capsys):
    """tools/summarize_evals.py renders one markdown row per eval JSON,
    tolerating both plain and distilled (sample_steps) artifacts."""
    import json as _json
    import sys

    import tools.summarize_evals as se

    (tmp_path / "transfer_eval_a.json").write_text(_json.dumps({
        "steps": 50, "guidance": 1.5,
        "style_distance_reduction_pct": 91.0,
        "vggish_multiseed_style_reduction_pct": {"11": 92.7, "29": 91.5},
        "level_matched": {"logmel_shape_reduction_pct": 78.7},
        "spectral_convergence_transfer_vs_style": 0.75,
        "pixel_mse_transfer_vs_content": 0.064}))
    (tmp_path / "transfer_eval_b.json").write_text(_json.dumps({
        "steps": 50, "sample_steps": 7,
        "style_distance_reduction_pct": 90.7}))

    old = sys.argv
    sys.argv = ["summarize_evals", str(tmp_path)]
    try:
        assert se.main() == 0
    finally:
        sys.argv = old
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].startswith("| run |") and len(out) == 4
    assert ("| a | 50 | 1.5 | 91.0 | 92.7/91.5 | 78.7 | 0.75 | 0.064 | - |"
            in out)
    # sample_steps wins over steps; missing metrics render as "-"
    assert "| b | 7 | 1 | 90.7 | - | - | - | - | - |" in out
