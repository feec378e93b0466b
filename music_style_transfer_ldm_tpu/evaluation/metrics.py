"""Training-independent transfer-quality metrics (round 3, VERDICT r02 #3).

The flagship style-transfer claim was measured with the same random-VGGish
metric family used as the training style loss — informative, but partially
self-referential.  These metrics share NOTHING with the training
objective:

* log-mel band statistics distance — the images ARE log-mel spectrograms,
  so instrument timbre lives in the marginal distribution of energy over
  mel bands; a diagonal 2-moment Frechet distance between per-band
  (mean, std) profiles measures how much the transfer output's spectral
  envelope moved toward the style corpus;
* (batch) spectral convergence — the standard magnitude-spectrogram fidelity
  ratio ||A - B||_F / ||B||_F, used here both for content preservation
  (transfer vs content) and style approach (transfer vs style);
* differently-seeded perceptual trunks — the same VGGish topology but
  from independent random inits: random-feature metrics are meaningful
  (random projections preserve distances), and agreement across
  independent seeds rules out the training trunk's specific projection
  being the only axis that moved.

All functions take images in [0, 1] ([N, H, W] or [N, H, W, 1]) exactly
as the dataset/serving layers produce them (128 mel bands x time).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def _squeeze(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float64)
    if x.ndim == 4:
        x = x[..., 0]
    if x.ndim == 2:
        x = x[None]
    return x


def band_statistics(imgs: np.ndarray) -> Dict[str, np.ndarray]:
    """Per-mel-band energy statistics over (samples, time).

    imgs: [N, n_mels, T] in [0, 1] (unit-scaled dB).  Returns mean and std
    vectors of length n_mels — the spectral envelope profile of the set.
    """
    x = _squeeze(imgs)
    return {"mean": x.mean(axis=(0, 2)), "std": x.std(axis=(0, 2))}


def log_mel_stats_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Diagonal 2-moment Frechet distance between the band-statistics
    profiles of two image sets: ||mu_a - mu_b||^2 + ||sd_a - sd_b||^2.

    0 when the sets share their per-band energy distribution; grows as the
    spectral envelopes diverge.  Training-independent (no learned or
    random projection involved).
    """
    sa, sb = band_statistics(a), band_statistics(b)
    return float(((sa["mean"] - sb["mean"]) ** 2).sum()
                 + ((sa["std"] - sb["std"]) ** 2).sum())


def batch_spectral_convergence(est: np.ndarray, ref: np.ndarray) -> float:
    """||EST - REF||_F / ||REF||_F averaged over the batch.

    The standard spectral-convergence measure (est and ref are magnitude
    spectrograms; here unit-scaled log-mel images, a monotone reparam of
    magnitude).  0 = identical; ~1 = unrelated energy layouts.
    """
    e, r = _squeeze(est), _squeeze(ref)
    num = np.linalg.norm((e - r).reshape(len(e), -1), axis=1)
    den = np.linalg.norm(r.reshape(len(r), -1), axis=1)
    return float(np.mean(num / np.maximum(den, 1e-12)))


def style_distance_reductions_multiseed(
        content: np.ndarray, style: np.ndarray, transfer: np.ndarray,
        seeds: Sequence[int] = (11, 29), input_shape=None,
) -> Dict[int, float]:
    """Style-distance reduction (%) under INDEPENDENTLY seeded VGGish
    trunks: 100 * (1 - d(transfer, style) / d(content, style)).

    The training style loss uses the seed-0 trunk family; passing other
    seeds gives perceptual metrics whose random projections are
    independent of anything the model optimized.
    """
    import jax.numpy as jnp

    from music_style_transfer_ldm_tpu.losses.feature import (
        build_feature_metric,
    )

    if input_shape is None:
        c = np.asarray(content)
        input_shape = (1,) + tuple(c.shape[1:])
    out = {}
    for seed in seeds:
        m = build_feature_metric("vggish", dtype=jnp.float32)
        m.init(seed=seed, input_shape=input_shape)
        base = float(m.distance(m.params, jnp.asarray(content),
                                jnp.asarray(style)))
        got = float(m.distance(m.params, jnp.asarray(transfer),
                               jnp.asarray(style)))
        out[seed] = round(100.0 * (1.0 - got / base), 1)
    return out


def trunk_embeddings(imgs: np.ndarray, seed: int = 11,
                     dtype=None) -> np.ndarray:
    """One embedding per image: the spatially pooled FINAL feature map of
    an independently seeded VGGish trunk ([N, C], C = 512).

    This is the embedding a Frechet Audio Distance uses (Kilgour et al.
    2019), with the pretrained trunk replaced by a fixed random one (the
    environment blocks pretrained weights; random projections preserve
    distances, and the seed is independent of the training loss's)."""
    import jax
    import jax.numpy as jnp

    from music_style_transfer_ldm_tpu.losses.vggish import VGGishFeatures

    x = _squeeze(imgs).astype(np.float32)[..., None]
    module = VGGishFeatures(dtype=dtype or jnp.float32)
    params = module.init(jax.random.PRNGKey(seed),
                         jnp.zeros((1,) + x.shape[1:], jnp.float32))
    feats = jax.jit(module.apply)(params, jnp.asarray(x))
    return np.asarray(feats[-1].mean(axis=(1, 2)), np.float64)


def frechet_distance(a_emb: np.ndarray, b_emb: np.ndarray,
                     eps: float = 1e-6) -> float:
    """Frechet distance between Gaussians fit to two embedding sets:
    ||mu_a - mu_b||^2 + tr(Ca + Cb - 2 (Ca Cb)^1/2).

    Full-covariance (unlike log_mel_stats_distance's diagonal 2-moment
    form).  tr((Ca Cb)^1/2) is computed as sum(sqrt(eig(S Cb S))) with
    S = Ca^1/2 — symmetric PSD, so the eigenvalues are real and the
    clipping only removes numerical negatives.  With N < C samples the
    covariances are rank-deficient; the distance stays well-defined, but
    treat small-N values as comparative (same N both sides), not
    absolute."""
    a = np.asarray(a_emb, np.float64)
    b = np.asarray(b_emb, np.float64)
    mu_a, mu_b = a.mean(0), b.mean(0)
    ca = np.cov(a, rowvar=False) + eps * np.eye(a.shape[1])
    cb = np.cov(b, rowvar=False) + eps * np.eye(b.shape[1])
    wa, va = np.linalg.eigh(ca)
    s = (va * np.sqrt(np.clip(wa, 0.0, None))) @ va.T
    wm = np.linalg.eigvalsh(s @ cb @ s)
    tr_sqrt = np.sum(np.sqrt(np.clip(wm, 0.0, None)))
    d2 = (np.sum((mu_a - mu_b) ** 2) + np.trace(ca) + np.trace(cb)
          - 2.0 * tr_sqrt)
    return float(max(d2, 0.0))


def fad_metrics(content: np.ndarray, transfer: np.ndarray,
                style_corpus: np.ndarray, seed: int = 11
                ) -> Dict[str, float]:
    """FAD(transfer, style corpus) before/after: how much the output
    distribution moved toward the style class, under an embedding family
    independent of the training objective."""
    e_c = trunk_embeddings(content, seed=seed)
    e_t = trunk_embeddings(transfer, seed=seed)
    e_s = trunk_embeddings(style_corpus, seed=seed)
    base = frechet_distance(e_c, e_s)
    got = frechet_distance(e_t, e_s)
    return {
        "fad_transfer_vs_style_corpus": round(got, 4),
        "fad_content_vs_style_corpus": round(base, 4),
        "fad_reduction_pct": round(100.0 * (1.0 - got / max(base, 1e-12)),
                                   1),
    }


def _zscore_set(x: np.ndarray) -> np.ndarray:
    """Remove a set's GLOBAL level and contrast (one affine per set, not
    per image): isolates envelope SHAPE from overall brightness."""
    g = _squeeze(x)
    return (g - g.mean()) / (g.std() + 1e-12)


def independent_transfer_metrics(content: np.ndarray, style: np.ndarray,
                                 transfer: np.ndarray,
                                 style_corpus: np.ndarray | None = None,
                                 seeds: Sequence[int] = (11, 29)
                                 ) -> Dict[str, object]:
    """The full training-independent metric block for eval reports.

    style_corpus defaults to the paired style batch; pass a larger sample
    of the style class when available (the corpus-level envelope is the
    statistic of interest, not one clip's).

    The raw band-stats distance is reported alongside a level/contrast-
    normalized (envelope SHAPE) variant and the explicit global level and
    contrast values — diffusion decoders commonly compress the output
    dynamic range, and the raw distance conflates that global effect with
    envelope-shape mismatch (the r03 fullscale eval caught exactly this:
    2.6x compressed output contrast that the std-normalized perceptual
    metrics were structurally blind to).
    """
    corpus = style if style_corpus is None else style_corpus
    lm_base = log_mel_stats_distance(content, corpus)
    lm_got = log_mel_stats_distance(transfer, corpus)
    lm_shape_base = log_mel_stats_distance(_zscore_set(content),
                                           _zscore_set(corpus))
    lm_shape_got = log_mel_stats_distance(_zscore_set(transfer),
                                          _zscore_set(corpus))
    t, c = _squeeze(transfer), _squeeze(corpus)
    return {
        "logmel_stats_distance_transfer_vs_style_corpus": round(lm_got, 6),
        "logmel_stats_distance_content_vs_style_corpus": round(lm_base, 6),
        "logmel_stats_reduction_pct": round(
            100.0 * (1.0 - lm_got / max(lm_base, 1e-12)), 1),
        "logmel_shape_distance_transfer_vs_style_corpus": round(
            lm_shape_got, 6),
        "logmel_shape_distance_content_vs_style_corpus": round(
            lm_shape_base, 6),
        "logmel_shape_reduction_pct": round(
            100.0 * (1.0 - lm_shape_got / max(lm_shape_base, 1e-12)), 1),
        "global_level_transfer_vs_corpus": [round(float(t.mean()), 4),
                                            round(float(c.mean()), 4)],
        "global_contrast_transfer_vs_corpus": [round(float(t.std()), 4),
                                               round(float(c.std()), 4)],
        "spectral_convergence_transfer_vs_content": round(
            batch_spectral_convergence(transfer, content), 4),
        "spectral_convergence_transfer_vs_style": round(
            batch_spectral_convergence(transfer, style), 4),
        "spectral_convergence_content_vs_style_baseline": round(
            batch_spectral_convergence(content, style), 4),
        "vggish_multiseed_style_reduction_pct":
            style_distance_reductions_multiseed(content, style, transfer,
                                                seeds=seeds),
        **fad_metrics(content, transfer, corpus, seed=seeds[0]),
    }
