"""Training-independent evaluation metrics (evaluation/metrics.py)."""

import numpy as np
import pytest

from music_style_transfer_ldm_tpu.evaluation import (
    band_statistics, batch_spectral_convergence,
    independent_transfer_metrics, log_mel_stats_distance,
)


@pytest.fixture()
def sets(rng):
    a = rng.rand(4, 128, 130, 1).astype(np.float32)
    # distinct spectral envelope: energy concentrated in low bands
    prof = np.linspace(1.0, 0.1, 128)[None, :, None, None]
    b = (rng.rand(4, 128, 130, 1) * prof).astype(np.float32)
    return a, b


def test_log_mel_stats_distance_axioms(sets):
    a, b = sets
    assert log_mel_stats_distance(a, a) == 0.0
    d = log_mel_stats_distance(a, b)
    assert d > 0
    assert abs(d - log_mel_stats_distance(b, a)) < 1e-12  # symmetric
    # same distribution, fresh draws -> near zero relative to distinct sets
    a2 = np.random.RandomState(99).rand(4, 128, 130, 1).astype(np.float32)
    assert log_mel_stats_distance(a, a2) < 0.05 * d


def test_band_statistics_shapes(sets):
    a, _ = sets
    st = band_statistics(a)
    assert st["mean"].shape == (128,) and st["std"].shape == (128,)
    # uniform [0,1] rows: mean ~0.5, std ~sqrt(1/12)
    np.testing.assert_allclose(st["mean"].mean(), 0.5, atol=0.02)
    np.testing.assert_allclose(st["std"].mean(), 12 ** -0.5, atol=0.02)


def test_spectral_convergence_axioms(sets):
    a, b = sets
    assert batch_spectral_convergence(a, a) == 0.0
    assert batch_spectral_convergence(b, a) > 0.1
    # scaling the estimate changes SC (it is a relative energy measure)
    assert batch_spectral_convergence(0.5 * a, a) == pytest.approx(0.5,
                                                                   abs=1e-6)


def test_independent_metrics_move_toward_style(sets):
    """An output interpolated toward the style must score a positive
    reduction on every independent axis."""
    content, style = sets
    transfer = 0.25 * content + 0.75 * style
    m = independent_transfer_metrics(content, style, transfer, seeds=(11,))
    assert m["logmel_stats_reduction_pct"] > 50
    assert (m["spectral_convergence_transfer_vs_style"]
            < m["spectral_convergence_content_vs_style_baseline"])
    assert m["vggish_multiseed_style_reduction_pct"][11] > 20
    # identity "transfer" scores ~0 reduction
    m0 = independent_transfer_metrics(content, style, content, seeds=(11,))
    assert abs(m0["logmel_stats_reduction_pct"]) < 1e-6
    assert m0["vggish_multiseed_style_reduction_pct"][11] == 0.0


def test_shape_metric_invariant_to_level_and_contrast(sets):
    """The envelope-SHAPE distance must ignore a global affine transform
    of the whole set (the raw distance must not)."""
    from music_style_transfer_ldm_tpu.evaluation.metrics import _zscore_set
    a, b = sets
    a_dim = 0.3 * a + 0.05  # globally darker + compressed
    raw_same = log_mel_stats_distance(a, a)
    raw_dim = log_mel_stats_distance(a_dim, a)
    assert raw_same == 0.0 and raw_dim > 0.1
    shape_dim = log_mel_stats_distance(_zscore_set(a_dim), _zscore_set(a))
    assert shape_dim < 1e-12

    m = independent_transfer_metrics(b, a, a_dim, seeds=(11,))
    # a_dim has a's envelope shape exactly -> near-100% shape reduction
    assert m["logmel_shape_reduction_pct"] > 99
    lvl_t, lvl_c = m["global_level_transfer_vs_corpus"]
    assert lvl_t < lvl_c  # and the level fields expose the dimming


def test_match_moments(sets):
    """Per-item moment matching: output mean/std equal the reference's,
    structure (z-scored image) unchanged, range clipped."""
    import jax.numpy as jnp

    from music_style_transfer_ldm_tpu.models.ldm import match_moments
    a, b = sets
    ref = (0.35 * a + 0.1).astype(np.float32)  # mid-range reference
    dim = np.clip(0.25 * b + 0.02, 0, 1)  # compressed-range "output"
    out = np.asarray(match_moments(jnp.asarray(dim), jnp.asarray(ref)))
    for i in range(len(out)):
        assert abs(out[i].mean() - ref[i].mean()) < 0.02
        assert abs(out[i].std() - ref[i].std()) < 0.02
    assert out.min() >= 0.0 and out.max() <= 1.0
    # structure preserved: correlation with the pre-match image stays ~1
    v1 = (dim[0] - dim[0].mean()).ravel()
    v2 = (out[0] - out[0].mean()).ravel()
    corr = float(v1 @ v2 / (np.linalg.norm(v1) * np.linalg.norm(v2)))
    assert corr > 0.999


def test_frechet_distance_closed_form(rng):
    """For Gaussian samples, the estimate approaches the analytic
    Frechet distance; axioms: 0 on identical sets, > 0 on shifted."""
    from music_style_transfer_ldm_tpu.evaluation import frechet_distance
    a = rng.randn(4000, 3)
    assert frechet_distance(a, a) < 1e-9
    shift = np.array([2.0, 0.0, 0.0])
    b = rng.randn(4000, 3) * 2.0 + shift
    # analytic: ||mu||^2 + tr(I + 4I - 2*sqrt(4I)* ... ) with Ca=I, Cb=4I:
    # tr(Ca+Cb-2(CaCb)^1/2) = 3*(1+4-2*2) = 3
    d = frechet_distance(a, b)
    assert abs(d - (4.0 + 3.0)) < 0.5
    # symmetric
    assert abs(d - frechet_distance(b, a)) < 1e-6


def test_fad_metrics_move_toward_style(sets):
    """FAD over trunk embeddings: interpolating toward the style corpus
    must reduce the Frechet distance to it."""
    from music_style_transfer_ldm_tpu.evaluation import (
        fad_metrics, trunk_embeddings,
    )
    content, style = sets
    emb = trunk_embeddings(content, seed=11)
    assert emb.shape == (4, 512) and np.all(np.isfinite(emb))
    transfer = 0.25 * content + 0.75 * style
    m = fad_metrics(content, transfer, style, seed=11)
    assert m["fad_transfer_vs_style_corpus"] < m["fad_content_vs_style_corpus"]
    assert m["fad_reduction_pct"] > 30
    same = fad_metrics(content, content, style, seed=11)
    assert same["fad_reduction_pct"] == 0.0


def test_summarize_sweep_pareto_marking(tmp_path, capsys):
    """tools/summarize_sweep: rows dominated on (style up, content-MSE
    down) are unmarked; the front is marked; ties don't dominate."""
    import json
    import sys
    sys.path.insert(0, "tools")
    import summarize_sweep as ss

    def art(depth, grid, style, mse, ssteps=None):
        (tmp_path / f"transfer_eval_t{depth}_{grid}.json").write_text(
            json.dumps({
                "vggish_multiseed_style_reduction_pct":
                    {"11": style, "29": style},
                "level_matched": {"logmel_shape_reduction_pct": 80.0},
                "spectral_convergence_transfer_vs_style": 0.9,
                "pixel_mse_transfer_vs_content": mse,
                "sample_steps": ssteps, "eval_backend": "cpu"}))

    art(30, "full", 70.0, 0.010)          # pareto (cheapest content cost)
    art(50, "full", 90.0, 0.020)          # pareto
    art(50, "half", 85.0, 0.025, 26)      # dominated by t50_full
    art(120, "full", 95.0, 0.040)         # pareto (max style)
    rows = ss.load_rows(tmp_path)
    ss.mark_pareto(rows)
    # Artifacts carrying the recon-referenced drift use it over the raw
    # content MSE (which is floored at the AE recon error).
    import json as _json
    p = tmp_path / "transfer_eval_t30_full.json"
    rich = _json.loads(p.read_text())
    rich["pixel_mse_transfer_vs_content_recon"] = 0.003
    p.write_text(_json.dumps(rich))
    assert ss.load_rows(tmp_path)[0]["mse_content"] == 0.003
    p.write_text(_json.dumps({**rich,
                              "pixel_mse_transfer_vs_content_recon": 0.010}))
    got = {(r["depth"], r["grid"]): r["pareto"] for r in rows}
    assert got[(30, "full")] and got[(50, "full")] and got[(120, "full")]
    assert not got[(50, "half")]

    sys.argv = ["summarize_sweep", str(tmp_path)]
    assert ss.main() == 0
    out = capsys.readouterr().out
    assert "half (26)" in out and "**yes**" in out
