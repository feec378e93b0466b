"""Quantitative eval of style-conditioned GENERATION (noise -> mel image).

The reference's generation path (ref: models/model.py:382-465
style_ddim_sample) ships with only qualitative panels; this tool scores
the generated corpus with the same training-independent metrics the
transfer eval uses (evaluation/metrics.py):

* FAD(generated, style corpus) — full-covariance Frechet distance over
  independently seeded trunk embeddings — with TWO calibration floors:
  FAD between two disjoint halves of the real style corpus (the
  "real-vs-real" floor: a perfect generator can't beat it) and the FAD
  from a mismatched OTHER class (the ceiling a style-ignoring generator
  would sit at);
* log-mel band-statistics distance to the style corpus (raw + shape);
* diversity: mean pairwise pixel distance of the generated set next to
  the real corpus's own spread (mode-collapse probe: generated spread
  collapsing far below the real spread is a red flag even when FAD is
  good).

    python tools/eval_generate.py --checkpoint runs/.../ldm_final \
        --pack runs/fullscale/train.spk --style-class 0 --n 16 \
        [--steps 100] [--sampler ddim|dpm++] [--guidance g] \
        [--out docs/results/fullscale/generate_eval_c0.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def pairwise_spread(imgs: np.ndarray) -> float:
    """Mean pairwise L2 distance between flattened images."""
    x = np.asarray(imgs, np.float64).reshape(len(imgs), -1)
    d = np.sqrt(np.maximum(
        (x * x).sum(1)[:, None] + (x * x).sum(1)[None, :] - 2 * x @ x.T,
        0.0))
    n = len(x)
    return float(d.sum() / max(n * (n - 1), 1))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--pack", required=True)
    p.add_argument("--style-class", type=int, default=0,
                   help="pack class index to condition on")
    p.add_argument("--n", type=int, default=16,
                   help="generated samples (= per-corpus sample size)")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--sampler", choices=["ddim", "dpm++"], default="ddim")
    p.add_argument("--guidance", type=float, default=1.0)
    p.add_argument("--latent-stats", choices=["none", "corpus"],
                   default="none",
                   help="'corpus': draw z_T from the schedule's true "
                        "marginal q(z_T) under per-channel latent moments "
                        "of the style class (models.ldm.corpus_latent_stats"
                        ") instead of N(0, I)")
    p.add_argument("--raw-weights", action="store_true",
                   help="sample from the raw trained weights instead of "
                        "the checkpoint's EMA (measures EMA's effect)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from music_style_transfer_ldm_tpu.utils.cache import (
        enable_compilation_cache,
    )
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from music_style_transfer_ldm_tpu.config import default_config
    from music_style_transfer_ldm_tpu.datasets.packed import (
        PackedSpectrogramDataset,
    )
    from music_style_transfer_ldm_tpu.evaluation import (
        frechet_distance, log_mel_stats_distance, trunk_embeddings,
    )
    from music_style_transfer_ldm_tpu.models.ldm import (
        load_ldm, style_ddim_sample,
    )

    cfg = default_config()
    model, variables = load_ldm(cfg, full_checkpoint=args.checkpoint,
                                use_ema=not args.raw_weights)

    ds = PackedSpectrogramDataset(args.pack)
    labels = ds.gather(np.arange(ds.n), dtype="uint8")[1]
    cls = int(args.style_class)
    cls_idx = np.flatnonzero(labels == cls)
    other_idx = np.flatnonzero(labels != cls)
    if len(cls_idx) < 3 * args.n:
        raise SystemExit(f"class {cls} has only {len(cls_idx)} items; "
                         f"need >= {3 * args.n}")
    rng = np.random.RandomState(args.seed)
    pick = rng.permutation(cls_idx)
    cond_idx, real_a, real_b = (pick[:args.n],
                                pick[args.n:2 * args.n],
                                pick[2 * args.n:3 * args.n])
    other = rng.permutation(other_idx)[:args.n]

    styles = ds.gather(cond_idx)[0]
    corpus_a = ds.gather(real_a)[0]       # disjoint real halves
    corpus_b = ds.gather(real_b)[0]
    mismatch = ds.gather(other)[0]
    name = (ds.classes[cls] if cls < len(ds.classes) else str(cls))
    print(f"class {cls} ({name}): {args.n} generated, sampler="
          f"{args.sampler}, steps={args.steps}, guidance={args.guidance}",
          flush=True)

    z_hw = cfg.model.image_size // 8  # 3 stride-2 encoder stages (cli.py)
    latent_stats = None
    if args.latent_stats == "corpus":
        from music_style_transfer_ldm_tpu.models.ldm import (
            corpus_latent_stats,
        )
        # Moments from the class corpus EXCLUDING the eval halves: the
        # conditioning styles only (two [latent_dim] vectors).
        latent_stats = corpus_latent_stats(model, variables, styles)
    generated, _ = style_ddim_sample(
        model, variables, jax.random.PRNGKey(args.seed),
        (args.n, z_hw, z_hw, cfg.model.latent_dim), jnp.asarray(styles),
        timesteps=args.steps, sampler=args.sampler,
        guidance=args.guidance, latent_stats=latent_stats)
    generated = np.asarray(generated)

    e_gen = trunk_embeddings(generated, seed=11)
    e_a = trunk_embeddings(corpus_a, seed=11)
    e_b = trunk_embeddings(corpus_b, seed=11)
    e_o = trunk_embeddings(mismatch, seed=11)
    results = {
        "checkpoint": str(args.checkpoint),
        "style_class": cls, "class_name": name, "n": args.n,
        "steps": args.steps, "sampler": args.sampler,
        "guidance": args.guidance,
        "latent_stats": args.latent_stats,
        "weights": "raw" if args.raw_weights else "ema-preferred",
        "fad_generated_vs_style_corpus": round(
            frechet_distance(e_gen, e_a), 4),
        "fad_real_vs_real_floor": round(frechet_distance(e_b, e_a), 4),
        "fad_other_class_ceiling": round(frechet_distance(e_o, e_a), 4),
        "logmel_stats_distance_generated_vs_corpus": round(
            log_mel_stats_distance(generated, corpus_a), 6),
        "logmel_stats_distance_real_vs_real": round(
            log_mel_stats_distance(corpus_b, corpus_a), 6),
        "pairwise_spread_generated": round(pairwise_spread(generated), 4),
        "pairwise_spread_real": round(pairwise_spread(corpus_a), 4),
        "eval_backend": jax.default_backend(),
    }
    print(json.dumps(results, indent=2), flush=True)
    if args.out:
        out = Path(args.out)
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps(results, indent=2))
        print(f"wrote {out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
