"""Aggregate transfer-eval JSONs into one markdown table.

Reads every ``transfer_eval*.json`` under the given directories (the
artifacts `tools/eval_transfer.py` writes) and prints a compact markdown
table of the headline metrics so result READMEs (docs/results/*/README.md)
can be assembled without hand-copying numbers:

    python tools/summarize_evals.py docs/results/distill docs/results/guidance

Columns: style-distance reduction (training-trunk seed-3 + the two
independent seeds), level-matched log-mel shape reduction, spectral
convergence vs style, and pixel MSE vs content (content preservation).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def row(path: Path) -> dict:
    d = json.loads(path.read_text())
    multi = d.get("vggish_multiseed_style_reduction_pct", {})
    lm = d.get("level_matched", {})
    return {
        "name": path.stem.replace("transfer_eval_", ""),
        "steps": d.get("sample_steps") or d.get("steps"),
        "guidance": d.get("guidance", 1.0),
        "style_red": d.get("style_distance_reduction_pct"),
        "multiseed": "/".join(f"{v:g}" for v in multi.values()) or "-",
        "shape_red_lm": lm.get("logmel_shape_reduction_pct"),
        "spec_conv_style": d.get("spectral_convergence_transfer_vs_style"),
        "mse_content": d.get("pixel_mse_transfer_vs_content"),
        # Recon-referenced content drift (vs the AE reconstruction of the
        # content input) — the raw-input column is floored by the AE's own
        # ~0.063 reconstruction error and barely moves (docs/EVALUATION.md,
        # "recon-referenced content axis"); older artifacts lack the field.
        "mse_recon": d.get("pixel_mse_transfer_vs_content_recon"),
    }


def main() -> int:
    dirs = [Path(a) for a in sys.argv[1:]] or [Path("docs/results")]
    files = sorted({p for d in dirs for p in d.rglob("transfer_eval*.json")})
    if not files:
        print("no transfer_eval*.json found", file=sys.stderr)
        return 1
    rows = [row(p) for p in files]
    hdr = ("| run | steps | guidance | style red % (seed3) | "
           "multiseed % | shape red % (lvl-matched) | spec-conv vs style | "
           "pixel MSE vs content | content drift (vs AE recon) |")
    print(hdr)
    print("|" + "---|" * 9)
    for r in rows:
        cell = lambda v: "-" if v is None else v
        print(f"| {r['name']} | {r['steps']} | {r['guidance']:g} "
              f"| {cell(r['style_red'])} | {r['multiseed']} "
              f"| {cell(r['shape_red_lm'])} | {cell(r['spec_conv_style'])} "
              f"| {cell(r['mse_content'])} | {cell(r['mse_recon'])} |")
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:  # e.g. `... | head`
        raise SystemExit(0)
