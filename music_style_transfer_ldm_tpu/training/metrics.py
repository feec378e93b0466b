"""Metric logging: CSV + loss-curve plots.

Replaces the reference's print() + matplotlib pairs
(ref: models/train.py:118-134,258-293) with a structured CSV log that also
renders the same linear/log loss plots.
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import Sequence


class MetricLogger:
    def __init__(self, csv_path: str | Path):
        self.csv_path = Path(csv_path)
        self.csv_path.parent.mkdir(parents=True, exist_ok=True)
        self.rows: list[dict] = []
        self._fieldnames: list[str] | None = None

    def log(self, **metrics) -> None:
        self.rows.append(metrics)
        if self._fieldnames is None:
            self._fieldnames = list(metrics.keys())
            with open(self.csv_path, "w", newline="") as f:
                writer = csv.DictWriter(f, fieldnames=self._fieldnames)
                writer.writeheader()
                writer.writerow(metrics)
        else:
            with open(self.csv_path, "a", newline="") as f:
                csv.DictWriter(f, fieldnames=self._fieldnames).writerow(
                    metrics)
        parts = [f"{k}={v:.6f}" if isinstance(v, float) else f"{k}={v}"
                 for k, v in metrics.items()]
        print("[metrics] " + " ".join(parts), flush=True)

    def plot(self, out_path: str | Path, keys: Sequence[str],
             logscale: bool = False) -> None:
        """Loss curves (ref: train.py:123-134,274-293). No-op without
        matplotlib."""
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        out_path = Path(out_path)
        out_path.parent.mkdir(parents=True, exist_ok=True)
        plt.figure(figsize=(10, 5))
        for k in keys:
            ys = [r[k] for r in self.rows if k in r]
            plt.plot(ys, label=k)
        if logscale:
            plt.yscale("log")
        plt.xlabel("Epoch")
        plt.ylabel("Loss")
        plt.grid(True)
        plt.legend()
        plt.savefig(out_path)
        plt.close()
