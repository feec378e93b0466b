"""Tracing / profiling / debug subsystems.

The reference has none of these (SURVEY.md section 5: only tqdm bars).
Here:

* ``trace(log_dir)`` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable device trace of whatever runs inside it;
* ``StepTimer`` — lightweight per-step wall-clock stats (p50/p95/mean);
* ``debug_mode()`` — turns on jax NaN/Inf checking (jit-compatible
  ``jax_debug_nans``) for race-free numerical fault detection on device.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Iterator, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str | Path = "runs/profile") -> Iterator[None]:
    """Capture a device profile: view with TensorBoard's profile plugin."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_mode(nans: bool = True, infs: bool = True) -> Iterator[None]:
    """Raise on NaN/Inf produced inside jitted computations."""
    old_nans = jax.config.jax_debug_nans
    old_infs = jax.config.jax_debug_infs
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_debug_infs", infs)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old_nans)
        jax.config.update("jax_debug_infs", old_infs)


class StepTimer:
    """Wall-clock step timing with percentile summary."""

    def __init__(self):
        self.samples: list[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.samples.append(time.perf_counter() - self._t0)
        return False

    def summary(self) -> dict:
        if not self.samples:
            return {}
        a = np.asarray(self.samples)
        return {"steps": len(a), "mean_s": float(a.mean()),
                "p50_s": float(np.percentile(a, 50)),
                "p95_s": float(np.percentile(a, 95)),
                "total_s": float(a.sum())}


class StallWatchdog:
    """Warn when a step takes implausibly long (e.g. a relay/tunnel stall).

    The axon relay has been observed to park device waits indefinitely
    (threads idle on futex, zero CPU). A blocked jax call can't be safely
    interrupted in-process, so the watchdog's job is to make the stall
    VISIBLE with recovery instructions instead of hanging silently.

    Usage:
        wd = StallWatchdog(timeout_s=300, context="LDM epoch 12")
        with wd:
            ... device work ...
    """

    def __init__(self, timeout_s: float = 300.0, context: str = "",
                 on_stall=None):
        import threading
        self.timeout_s = timeout_s
        self.context = context
        self.on_stall = on_stall
        self._timer: Optional[object] = None
        self._threading = threading
        self.fired = False

    def _fire(self):
        self.fired = True
        msg = (f"WATCHDOG: no progress for {self.timeout_s:.0f}s"
               + (f" in {self.context}" if self.context else "")
               + " — likely a device/relay stall. Safe recovery: kill this "
               "process and resume from the latest checkpoint "
               "(train --resume-from <ckpt>).")
        print(msg, flush=True)
        if self.on_stall is not None:
            self.on_stall()

    def __enter__(self):
        self.fired = False
        self._timer = self._threading.Timer(self.timeout_s, self._fire)
        self._timer.daemon = True
        self._timer.start()
        return self

    def __exit__(self, *exc):
        self._timer.cancel()
        return False
