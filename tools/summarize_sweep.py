"""Summarize the SDEdit operating-point sweep into a pareto table.

Reads the ``transfer_eval_t{depth}_{grid}.json`` artifacts written by the
``pareto`` stage (tools/tpu_round4_batch.py) and prints a markdown table
ordered by noising depth, marking the pareto-optimal operating points of
the content-preservation vs style-movement trade-off:

    python tools/summarize_sweep.py docs/results/sweep

A row is pareto-optimal when no other row has BOTH more style movement
(mean of the two independent-seed trunk reductions) and better content
preservation (lower pixel MSE vs content). The transfer default should
sit on this front (VERDICT r03 #6).
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path


def load_rows(d: Path) -> list[dict]:
    rows = []
    for p in sorted(d.glob("transfer_eval_t*_*.json")):
        m = re.match(r"transfer_eval_t(\d+)_(\w+)", p.stem)
        if not m:
            continue
        j = json.loads(p.read_text())
        multi = j.get("vggish_multiseed_style_reduction_pct", {})
        style = (sum(multi.values()) / len(multi)) if multi else None
        rows.append({
            "depth": int(m.group(1)),
            "grid": m.group(2),
            "sample_steps": j.get("sample_steps"),
            "style_red": style,
            "shape_red_lm": (j.get("level_matched", {})
                             .get("logmel_shape_reduction_pct")),
            "spec_conv_style": j.get(
                "spectral_convergence_transfer_vs_style"),
            # Prefer the recon-referenced drift when the artifact has it:
            # MSE vs the raw content input is floored at the AE recon
            # error (~0.063) and barely moves with depth.  An artifact
            # predating that metric falls back to the raw-input MSE and
            # is flagged so the column is never silently mislabeled.
            "mse_content": j.get(
                "pixel_mse_transfer_vs_content_recon",
                j.get("pixel_mse_transfer_vs_content")),
            "mse_is_recon": "pixel_mse_transfer_vs_content_recon" in j,
            "backend": j.get("eval_backend", "?"),
        })
    rows.sort(key=lambda r: (r["depth"], r["grid"]))
    return rows


def mark_pareto(rows: list[dict]) -> None:
    """Pareto-optimal = not dominated on (style_red up, mse_content down)."""
    for r in rows:
        r["pareto"] = (
            r["style_red"] is not None and r["mse_content"] is not None
            and not any(
                o is not r
                and o["style_red"] is not None
                and o["mse_content"] is not None
                and o["style_red"] >= r["style_red"]
                and o["mse_content"] <= r["mse_content"]
                and (o["style_red"] > r["style_red"]
                     or o["mse_content"] < r["mse_content"])
                for o in rows))


def main() -> int:
    d = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(
        "docs/results/sweep")
    rows = load_rows(d)
    if not rows:
        print(f"no transfer_eval_t*_*.json under {d}", file=sys.stderr)
        return 1
    mark_pareto(rows)
    print("| depth | grid | style red % (indep mean) | shape red % "
          "(lvl-matched) | spec-conv vs style | content drift (pixel MSE "
          "vs AE recon) | pareto |")
    print("|" + "---|" * 7)
    for r in rows:
        grid = (f"{r['grid']} ({r['sample_steps']})" if r["sample_steps"]
                else r["grid"])
        star = "**yes**" if r["pareto"] else ""
        sr = f"{r['style_red']:.1f}" if r["style_red"] is not None else "-"
        mse = (f"{r['mse_content']}" if r["mse_is_recon"]
               else f"{r['mse_content']} (vs raw input!)")
        print(f"| {r['depth']} | {grid} | {sr} | {r['shape_red_lm']} "
              f"| {r['spec_conv_style']} | {mse} | {star} |")
    if not all(r["mse_is_recon"] for r in rows):
        print("\nNOTE: rows marked '(vs raw input!)' predate the "
              "recon-referenced drift metric; their MSE is floored at the "
              "AE reconstruction error and not comparable to recon rows.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
