"""Teacher-output fidelity of few-step transfer: what distillation buys.

Style-corpus metrics (tools/eval_transfer.py) saturate on this model —
even a raw coarse DDIM grid scores similar style-distance reduction —
so the discriminating measure for a distilled student is how closely its
N-step output reproduces the converged teacher's full 50-step transfer
OUTPUT on held-out pairs (the ODE-solution fidelity the Salimans-Ho
objective optimizes).  Reports per-variant pixel MSE / PSNR against the
teacher-50 reference output, for the UNDISTILLED teacher on the coarse
grid vs the DISTILLED student on the same grid.

    python tools/eval_distill_fidelity.py \
        --teacher runs/fullscale/runs/ldm/ldm_final \
        --student runs/distill/distilled_6 --sample-steps 7 \
        --pack runs/fullscale/train.spk \
        --pairings runs/fullscale/pairings.csv \
        --out docs/results/distill/distill_fidelity_6.json
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--teacher", required=True)
    p.add_argument("--student", required=True)
    p.add_argument("--sample-steps", type=int, required=True,
                   help="coarse grid points (distilled steps + 1)")
    p.add_argument("--pack", required=True)
    p.add_argument("--pairings", required=True)
    p.add_argument("--n-pairs", type=int, default=16)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from music_style_transfer_ldm_tpu.utils.cache import (
        enable_compilation_cache,
    )
    enable_compilation_cache()

    from music_style_transfer_ldm_tpu.config import default_config
    from music_style_transfer_ldm_tpu.datasets import (
        PackedPairDataset, train_test_split,
    )
    from music_style_transfer_ldm_tpu.models.ldm import (
        content_style_transfer, load_ldm,
    )

    cfg = default_config()
    model, tvars = load_ldm(cfg, full_checkpoint=args.teacher)
    _, svars = load_ldm(cfg, full_checkpoint=args.student)

    # Same held-out selection as tools/eval_transfer.py.
    ds = PackedPairDataset(args.pack, args.pairings)
    _, held = train_test_split(len(ds), cfg.train.train_split,
                               seed=cfg.train.seed)
    idx = held[:args.n_pairs]
    batches = [ds[i] for i in idx]
    content = jnp.stack([np.asarray(b[0][0], np.float32) for b in batches])
    style = jnp.stack([np.asarray(b[1][0], np.float32) for b in batches])
    key = jax.random.PRNGKey(0)

    def run(variables, sample_steps):
        dec, _, _ = content_style_transfer(
            model, variables, key, content, style,
            num_timesteps=args.steps, sampler="ddim", steps=sample_steps)
        return np.asarray(dec)

    ref = run(tvars, None)                       # teacher, full grid
    coarse_teacher = run(tvars, args.sample_steps)
    coarse_student = run(svars, args.sample_steps)

    def fid(x):
        mse = float(np.mean((x - ref) ** 2))
        return {"mse_vs_teacher50": round(mse, 6),
                "psnr_db": round(float(10 * np.log10(1.0 / max(mse, 1e-12))),
                                 2)}

    results = {
        "n_pairs": len(idx), "steps": args.steps,
        "sample_steps": args.sample_steps,
        "teacher_coarse": fid(coarse_teacher),
        "student_distilled": fid(coarse_student),
        "teacher": args.teacher, "student": args.student,
        "eval_backend": jax.default_backend(),
    }
    results["mse_reduction_pct"] = round(
        100.0 * (1.0 - results["student_distilled"]["mse_vs_teacher50"]
                 / max(results["teacher_coarse"]["mse_vs_teacher50"], 1e-12)),
        1)
    print(json.dumps(results, indent=2), flush=True)
    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(results, indent=2) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
