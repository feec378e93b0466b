"""Headline benchmark (library form). Prints progressive JSON lines.

Primary metric: DDIM denoise step DEVICE time on the flagship LDM (bf16,
batch 1, 49-step style-conditioned transfer as one fused Pallas
trajectory kernel), measured on whatever accelerator jax selects (the
real TPU chip under the driver). Baseline: the driver's north-star target
of 50 ms/step (BASELINE.md; the reference publishes no numbers of its own
— vs_baseline > 1 means faster than the target).

Capture contract (round 3): the driver parses the LAST JSON line on
stdout and may kill the process at an unknown wall deadline, so this
module is built to always leave a parseable headline behind:

* the cheapest meaningful headline (sync floor + fused trajectory chain)
  is measured FIRST and its JSON line printed immediately;
* every later section re-prints the enriched JSON line when it succeeds
  (last line wins), and is individually guarded by try/except AND a wall
  budget checked BEFORE its compiles, not after;
* SIGTERM/SIGINT (the `timeout` kill signal) triggers a handler that
  prints the best-so-far JSON before exiting — a mid-compile kill still
  leaves the most recent number.

Round-2 post-mortem baked into the design: the axon relay's CLIENT INIT
(first device_put) was measured at 75–495 s on this machine — an
unpredictable tax paid before any benchmark work can start — and round
2's bench died without printing anything because all four headline
compiles ran before the first JSON and outside the budget guard.  Init
is now timed and logged, the default budget is 360 s (was 1500), and the
model/param init is jitted so it is one cached compile instead of
hundreds of 27 ms eager relay dispatches.

Methodology note (round 2, still true): the relay's synchronous round
trip is ~27 ms — more than the device time of an entire 49-step
trajectory. Single-call sync timing (round 1's 0.576 ms/step) measures
the RELAY, not the chip. Device time is measured by chaining N full
trajectories inside one jitted program (each trajectory consumes the
previous one's output, so nothing can be elided) and amortizing:
(t_chain - t_sync_floor) / N.

Secondary numbers (stderr + enriched JSON): the lax.scan sampler's device
step time, single-call client latency, full 10 s clip end-to-end transfer
(mel -> VAE encode -> 50-step DDIM -> decode -> NNLS + Griffin-Lim audio,
target < 5 s), DPM++ half-grid latency, batched fused-kernel throughput,
batch-64 scan throughput + MFU, batch-128 train step + MFU.

Round-5 scheduling (VERDICT r04 #1): secondary sections no longer run in
a fixed order.  The banked record carries per-field ``field_measured_at``
stamps; each run sorts its sections stalest-field-first
(``order_sections_stalest_first``), so under a sick relay consecutive
budget-limited runs refresh DIFFERENT sections and converge to an
all-fresh record (``fields_from_last_good: []``) instead of starving the
same late fields every run (r04: 16 fields carried).
"""

from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _last_good_path() -> Path:
    """Where the most recent successful real-accelerator headline lives.

    Committed to the repo (docs/results/) so a fresh clone has a fallback
    even before its first successful run on this machine."""
    env = os.environ.get("MSTLDM_BENCH_LAST_GOOD")
    if env:
        return Path(env)
    return (Path(__file__).resolve().parents[1]
            / "docs" / "results" / "bench_last_good.json")


def _sync(out) -> None:
    """Force real completion: fetch one element to host.

    Through the axon relay, block_until_ready can return before the device
    work drains; a host readback cannot lie.
    """
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def _peak_flops_per_sec(device) -> float | None:
    """Peak dense bf16 FLOP/s for the chip, or None if unknown (e.g. CPU).

    Table lives in utils/chips.py (shared with serving's bucket-routing
    derivation)."""
    from music_style_transfer_ldm_tpu.utils.chips import peak_flops_per_sec
    return peak_flops_per_sec(getattr(device, "device_kind", ""))


def _flops(jitted, *args) -> float | None:
    """Total FLOPs of one call, from XLA's compiled cost analysis.

    Falls back to HLO-level (pre-compile) analysis if the backend's
    executable doesn't expose cost_analysis (remote-compile tunnel)."""
    try:
        lowered = jitted.lower(*args)
        try:
            ca = lowered.compile().cost_analysis()
        except Exception:
            ca = lowered.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def _mfu(flops: float | None, seconds: float, peak: float | None
         ) -> float | None:
    if flops is None or peak is None or seconds <= 0:
        return None
    return flops / seconds / peak


def timed(fn, *args, repeats: int = 8, warmup: int = 25):
    out = fn(*args)
    _sync(out)  # compile
    for _ in range(warmup):  # relay warm-up: first ~20 calls are slow
        out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


_BASELINE_MS = 50.0  # BASELINE.md north-star: < 50 ms/DDIM step


class Emitter:
    """Progressive headline JSON: re-printed after every section that
    lands a number (the driver takes the last parseable line), and once
    more from the SIGTERM/SIGINT handler if the process is killed.

    Round-4 hardening (BENCH_r02 rc=124 / BENCH_r03 rc=1 post-mortems):
    the relay backend can FAST-FAIL (UNAVAILABLE raise, r03) or HANG
    indefinitely in a C call (observed 9-25 min, during which CPython
    never runs the Python SIGTERM handler because the main thread never
    re-enters the interpreter).  Defense in depth:

    * ``bank_fallback()`` — the very first stdout line of a run is the
      last successful real-accelerator headline (docs/results/
      bench_last_good.json), re-printed with ``"stale": true`` +
      ``stale_reason``.  Even SIGKILL mid-hang now leaves a parseable,
      honestly-labeled line; any real measurement printed later
      supersedes it (the driver takes the LAST line).
    * every successful ``emit()`` on a non-CPU backend refreshes the
      last-good file, so the fallback is always the newest real run.
    * a watchdog THREAD (threads keep running while the main thread is
      hung in C) exits the process cleanly if no real measurement lands
      within a deadline — see ``install_hang_watchdog``."""

    def __init__(self) -> None:
        self.fields: dict = {}
        # Per-field freshness stamps for metric fields measured THIS run;
        # persisted into the banked record so the next run can schedule
        # its sections stalest-field-first (VERDICT r04 #1).
        self.field_measured_at: dict = {}
        self._printed_any = False
        self._measured_any = False
        try:
            fb = json.loads(_last_good_path().read_text())
            self.fallback = fb if isinstance(fb, dict) and "value" in fb \
                else None
        except Exception:  # noqa: BLE001
            self.fallback = None

    @staticmethod
    def _now() -> str:
        return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())

    def ready(self) -> bool:
        return "value" in self.fields

    def set(self, **kv) -> None:
        now = self._now()
        for k, v in kv.items():
            if v is None:
                continue
            self.fields[k] = v
            if k in self._SECONDARY_KEYS:
                self.field_measured_at[k] = now

    def set_headline(self, step_ms: float, source: str) -> None:
        self.fields["metric"] = "ddim_step_ms"
        self.fields["value"] = round(step_ms, 4)
        self.fields["unit"] = "ms"
        self.fields["vs_baseline"] = round(_BASELINE_MS / step_ms, 2)
        self.fields["sampler"] = source
        self.field_measured_at["value"] = self._now()

    def bank_fallback(self, reason: str) -> bool:
        """Print the last-good line with a stale marker (or the current
        real fields if a measurement already landed). Returns True if a
        parseable line went to stdout."""
        if self.ready():
            self.emit()
            return True
        if self.fallback is None:
            log(f"no last-good fallback available at {_last_good_path()} "
                f"({reason})")
            return False
        out = dict(self.fallback)
        out["stale"] = True
        out["stale_reason"] = reason
        print(json.dumps(out), flush=True)
        self._printed_any = True
        return True

    def emit(self) -> None:
        if not self.ready():
            return
        # Stable key order: headline keys first, extras after.
        head = ("metric", "value", "unit", "vs_baseline")
        ordered = {k: self.fields[k] for k in head if k in self.fields}
        ordered.update(
            {k: v for k, v in self.fields.items() if k not in head})
        print(json.dumps(ordered), flush=True)
        self._printed_any = True
        self._measured_any = True
        self._save_last_good(ordered)

    def _save_last_good(self, ordered: dict) -> None:
        """Persist real-accelerator headlines as the future fallback.

        Saves happen on EVERY progressive emit, so a budget-skipped or
        killed-early run would otherwise overwrite a complete banked
        record with a partial one and lose fields forever (observed: a
        timeout-600 release_check run erased train_b128_*).  Merge the
        previous same-chip record's secondary fields into each save,
        with the same explicit provenance marking the driver line gets."""
        try:
            if jax.default_backend() == "cpu":
                return
            rec = dict(ordered)
            prev = self.fallback
            inherited: list = []
            if prev and prev.get("chip") == rec.get("chip"):
                inherited = [k for k in self._SECONDARY_KEYS
                             if k not in rec and k in prev]
                if inherited:
                    for k in inherited:
                        rec[k] = prev[k]
                    rec["last_good_measured_at"] = prev.get("measured_at")
            stale = set(rec.get("fields_from_last_good", [])) | set(inherited)
            rec["fields_from_last_good"] = sorted(stale)
            # Per-field freshness: fields measured this run get their own
            # stamp; anything merged/carried keeps the previous record's
            # stamp so staleness accumulates honestly across partial runs.
            prev_fma = (prev or {}).get("field_measured_at") or {}
            prev_ts = (prev or {}).get("measured_at")
            fma = {}
            for k in self._SECONDARY_KEYS + ("value",):
                if k not in rec and k != "value":
                    continue
                if k in self.field_measured_at:
                    fma[k] = self.field_measured_at[k]
                else:
                    ts = prev_fma.get(k, prev_ts)
                    if ts:
                        fma[k] = ts
            rec["field_measured_at"] = fma
            rec["measured_at"] = self._now()
            rec["provenance"] = ("auto-saved by benchmarks.Emitter on a "
                                 "successful real-accelerator run")
            p = _last_good_path()
            p.parent.mkdir(parents=True, exist_ok=True)
            tmp = p.with_suffix(".json.tmp")
            tmp.write_text(json.dumps(rec, indent=1) + "\n")
            tmp.replace(p)
        except Exception as e:  # noqa: BLE001
            log(f"last-good save failed (non-fatal): {e!r}")

    # Secondary metric fields a full run emits; the driver's record should
    # never lose one of these to a budget-forced section skip.
    _SECONDARY_KEYS = (
        "scan_step_ms", "fused_dpm_halfgrid_transfer_ms",
        "fused_b4_trajectory_ms", "fused_distill6_transfer_ms",
        "client_latency_50step_ms",
        "transfer_dpm_halfgrid_ms", "e2e_10s_clip_s", "transfer_b64_ms",
        "transfer_b64_gflop", "mfu_transfer_b64",
        "transfer_b64_dpm25_clips_per_s", "transfer_b64_distill6_clips_per_s",
        "transfer_b64_distill1_clips_per_s", "serving_saturated_clips_per_s",
        "train_b128_step_ms", "train_b128_gflop", "mfu_train_b128")

    def carry_forward_missing(self) -> None:
        """Fill secondary fields a budget-skipped run didn't measure from
        the last-good record, EXPLICITLY marked in ``fields_from_last_good``
        (VERDICT r03 #7: captured fields must never regress round-over-
        round just because the wall budget skipped late sections).  Only
        meaningful when a real headline exists and the fallback is a
        same-chip record; never silently mixes stale numbers in."""
        if not self.ready() or not self._measured_any:
            return
        carried: list = []
        if (self.fallback
                and self.fallback.get("chip") == self.fields.get("chip")):
            carried = [k for k in self._SECONDARY_KEYS
                       if k not in self.fields and k in self.fallback]
            for k in carried:
                self.fields[k] = self.fallback[k]
            if carried:
                self.fields["last_good_measured_at"] = self.fallback.get(
                    "measured_at")
                log(f"carried forward {len(carried)} unmeasured secondary "
                    f"fields from the last-good record: {carried}")
        # Always present in the final line — an explicit [] is the signal
        # that EVERY field was measured fresh this run (VERDICT r04 #1).
        self.fields["fields_from_last_good"] = carried

    def install_kill_handler(self) -> None:
        def handler(signum, frame):  # noqa: ARG001
            log(f"signal {signum}: flushing best-so-far JSON and exiting")
            ok = self.bank_fallback(
                f"killed by signal {signum} before first measurement")
            # Exit nonzero only if no parseable line ever reached stdout
            # (so the driver's rc mirrors whether a number exists).
            sys.stdout.flush()
            os._exit(0 if ok or self._printed_any else 1)

        signal.signal(signal.SIGTERM, handler)
        signal.signal(signal.SIGINT, handler)

    def install_hang_watchdog(self, deadline_s: float) -> threading.Timer:
        """Exit cleanly if no REAL measurement lands within deadline_s.

        Runs on a timer thread: a main thread hung inside the relay's C
        client never re-enters the interpreter, so neither the SIGTERM
        handler nor any Python code on the main thread can save the run
        — but a daemon thread still executes and os._exit() works."""
        def fire() -> None:
            if self._measured_any:
                return  # real numbers exist; let the run finish naturally
            log(f"watchdog: no real measurement after {deadline_s:.0f}s "
                f"(backend hang?); exiting with banked fallback")
            ok = self.bank_fallback(
                f"backend hang: no measurement within {deadline_s:.0f}s")
            sys.stdout.flush()
            os._exit(0 if ok or self._printed_any else 1)

        t = threading.Timer(deadline_s, fire)
        t.daemon = True
        t.start()
        return t


def order_sections_stalest_first(sections: list, fallback: dict | None,
                                 chip: str | None) -> list:
    """Order bench sections by the age of their stalest field.

    A section's key is the MIN over its fields of the banked record's
    per-field ``field_measured_at`` stamp; fields the record never measured
    sort as the stalest of all.  With a different-chip (or absent) banked
    record the declared order is returned unchanged — carry-over never
    crosses chips, so staleness is meaningless there.  Stable sort: ties
    keep declared order.  This is what lets consecutive budget-limited
    runs converge to an all-fresh record (VERDICT r04 #1)."""
    fb = fallback or {}
    if not fb or fb.get("chip") != chip:
        return sections
    fma = fb.get("field_measured_at") or {}
    rec_ts = fb.get("measured_at") or ""

    def staleness(fields: tuple) -> str:
        # ISO-8601 UTC stamps compare lexicographically; "" = never.
        return min(fma.get(f) or (rec_ts if f in fb else "")
                   for f in fields)

    return sorted(sections, key=lambda s: staleness(s[1]))


def _devices_with_retry(retry_window_s: float) -> list:
    """First backend touch with retries.

    The relay's UNAVAILABLE raise is not cached by jax (xla_bridge's
    _backends stays empty on failure), so a later call genuinely
    re-attempts the connection; BENCH_r03 died on the first raise when
    the relay recovered within the hour."""
    t0 = time.time()
    attempt = 0
    while True:
        attempt += 1
        t_a = time.time()
        try:
            devs = jax.devices()
            log(f"devices: {devs} (attempt {attempt}, "
                f"init {time.time() - t_a:.0f}s)")
            return devs
        except Exception as e:  # noqa: BLE001
            waited = time.time() - t0
            log(f"device init attempt {attempt} failed after "
                f"{time.time() - t_a:.0f}s: {e!r} "
                f"({waited:.0f}s into {retry_window_s:.0f}s retry window)")
            if waited >= retry_window_s:
                raise
            time.sleep(30.0)


def main() -> None:
    from music_style_transfer_ldm_tpu.utils.cache import (
        enable_compilation_cache,
    )
    cache_dir = enable_compilation_cache()
    # A cold persistent cache means every section's compile goes through
    # the remote-compile tunnel (minutes for the train grad graph) — the
    # budget reserves below scale accordingly.  291 entries on a fully
    # warmed cache; 20 distinguishes "never benched here" reliably.
    try:
        cold_cache = sum(1 for _ in Path(cache_dir).iterdir()) < 20
    except OSError:
        cold_cache = True
    from music_style_transfer_ldm_tpu.config import default_config
    from music_style_transfer_ldm_tpu.models.ldm import (
        LDM, content_style_transfer,
    )

    emitter = Emitter()
    emitter.install_kill_handler()
    # Bank the last-good line as the FIRST stdout line: if this run dies
    # in any way (raise, hang, SIGKILL), the driver still parses an
    # honestly-labeled stale headline; every real emit below supersedes
    # it (last line wins).
    emitter.bank_fallback(
        "banked at startup; superseded by a fresh measurement below "
        "unless this run died before measuring")
    # A hung relay C-call blocks Python signal handling on the main
    # thread; the watchdog thread is the only way out. Default 540 s sits
    # under tools/release_check.sh's `timeout 600` rehearsal.
    emitter.install_hang_watchdog(float(os.environ.get(
        "MSTLDM_BENCH_HANG_EXIT_S", "540")))

    t_bench_start = time.time()
    # Wall budget: on a cold compile cache every graph goes through the
    # remote-compile tunnel; once the budget is spent, remaining sections
    # are skipped so the run finishes inside the driver's (unknown) kill
    # deadline.  Checked BEFORE each section's compiles.  Round-2 died
    # with 1500 s; the relay client init alone has been observed to take
    # 75-495 s, so keep the default tight.
    budget_s = float(os.environ.get("MSTLDM_BENCH_BUDGET_S", "360"))
    # The post-init extension below can push the budget past the driver's
    # kill deadline when the relay client init is slow (the r04 rehearsal:
    # budget grew to init+300 and the cold train-step compile then overran
    # timeout 600 → rc=124 with the record only saved by the SIGTERM
    # flush).  Hard-cap the extension; an explicit MSTLDM_BENCH_BUDGET_S
    # above the cap is honored (the cap defaults to at least it).
    budget_cap_s = float(os.environ.get("MSTLDM_BENCH_BUDGET_CAP_S",
                                        str(max(500.0, budget_s))))
    log(f"compile cache {'COLD' if cold_cache else 'warm'} ({cache_dir})")

    def over_budget(section: str, reserve_s: float = 0.0) -> bool:
        """True when the section shouldn't start: elapsed plus the
        section's reserved (estimated) cost would exceed the budget.
        A started section can't be preempted mid-compile, so expensive
        sections must reserve their cost up front."""
        spent = time.time() - t_bench_start
        if spent + reserve_s > budget_s:
            log(f"skipping {section}: {spent:.0f}s elapsed + "
                f"{reserve_s:.0f}s reserved > {budget_s:.0f}s budget "
                f"(kill-deadline protection)")
            return True
        return False

    def reserve(warm_s: float, cold_s: float) -> float:
        return cold_s if cold_cache else warm_s

    # Everything up to the first real emit is guarded: a pre-headline
    # failure (BENCH_r03's rc=1) must exit 0 with the banked stale line
    # as the record, never crash with nothing parseable on stdout.
    try:
        _devices_with_retry(float(os.environ.get(
            "MSTLDM_BENCH_INIT_RETRY_S", "300")))
        cfg = default_config()
        model = LDM(latent_dim=cfg.model.latent_dim,
                    num_timesteps=cfg.diffusion.num_timesteps,
                    dtype=jnp.bfloat16)

        S = cfg.model.image_size
        content = jnp.asarray(np.random.RandomState(0).rand(1, S, S, 1),
                              jnp.float32)
        style = jnp.asarray(np.random.RandomState(1).rand(1, S, S, 1),
                            jnp.float32)
        # One compile instead of hundreds of eager relay dispatches; also
        # the first device touch, so time it to make relay-init stalls
        # visible in the driver tail.
        t0 = time.time()
        variables = jax.jit(model.init)(
            {"params": jax.random.PRNGKey(0),
             "diffusion": jax.random.PRNGKey(1)},
            content, style, jnp.zeros((1,), jnp.int32))
        _sync(variables)
        log(f"device init + param init: {time.time() - t0:.1f}s")
    except Exception as e:  # noqa: BLE001
        log(f"backend/param init failed terminally: {e!r}")
        ok = emitter.bank_fallback(f"backend/param init failed: {e!r}")
        sys.exit(0 if ok or emitter._printed_any else 1)
    # The relay client init alone has eaten 500 s on occasion; without
    # this, a slow init would starve every section and the run would end
    # with only the headline.  Guarantee a post-init measuring window
    # (the SIGTERM flush still protects against a tight driver deadline).
    post_init_s = float(os.environ.get("MSTLDM_BENCH_POST_INIT_S", "300"))
    budget_s = min(max(budget_s, (time.time() - t_bench_start)
                       + post_init_s), budget_cap_s)
    log(f"wall budget: {budget_s:.0f}s (cap {budget_cap_s:.0f}s)")

    steps = 50
    n_steps = steps - 1
    on_cpu = jax.default_backend() == "cpu"
    # Chain lengths: long enough that device compute dominates the ~2 ms
    # relay RTT jitter (the floor subtraction is min-of-noisy-samples, so
    # short chains can apparently exceed peak FLOP/s). Scaled to the
    # running chip's peak (utils/chips.py) — 128 was tuned on the v5e.
    from music_style_transfer_ldm_tpu.utils.chips import bench_chain_len
    n_chain = 2 if on_cpu else bench_chain_len(
        getattr(jax.devices()[0], "device_kind", ""))

    peak = _peak_flops_per_sec(jax.devices()[0])
    emitter.set(chip=str(getattr(jax.devices()[0], "device_kind",
                                 "unknown")),
                chip_peak_tflops=(round(peak / 1e12) if peak else None),
                methodology=("device time, N chained trajectories in one "
                             "dispatch minus sync floor; round-1 value "
                             "(0.576) was bound by the ~27 ms relay round "
                             "trip"))

    # ---- relay sync floor: a no-op readback (cheapest compile first) -----
    try:
        floor_s, _ = timed(jax.jit(lambda a: a.sum()), content, repeats=10,
                           warmup=25)
        log(f"sync floor (jit(sum) + readback): {floor_s*1000:.2f} ms")
        emitter.set(sync_floor_ms=round(floor_s * 1000, 2))
    except Exception as e:  # noqa: BLE001
        log(f"sync-floor measurement failed terminally: {e!r}")
        ok = emitter.bank_fallback(f"sync-floor measurement failed: {e!r}")
        sys.exit(0 if ok or emitter._printed_any else 1)

    # ---- HEADLINE: device-amortized step time, chained fused trajectories
    # Runs unconditionally (budget or not): without it there is no number.
    from music_style_transfer_ldm_tpu.diffusion.ddim import (
        ddim_sample, transfer_time_grid,
    )
    from music_style_transfer_ldm_tpu.models.ldm import _denoise_fn
    from music_style_transfer_ldm_tpu.ops.pallas.fused_sampler import (
        fused_ddim_sample, pack_operands,
    )
    sched = model.schedule
    emb = model.apply(variables, style, method=LDM.style_embed)
    times = transfer_time_grid(steps)
    z0 = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 32),
                           jnp.float32)

    @jax.jit
    def chain_fused(z):
        ops, names = pack_operands(variables["params"]["unet"], emb, sched,
                                   times, 0.0, dtype=jnp.bfloat16)
        return jax.lax.fori_loop(
            0, n_chain,
            lambda i, z: fused_ddim_sample(ops, names, z, n_steps,
                                           dtype=jnp.bfloat16,
                                           interpret=on_cpu), z)

    step_ms = None
    try:
        fused_s, _ = timed(chain_fused, z0, warmup=25)
        step_ms = max(fused_s - floor_s, 1e-9) / n_chain / n_steps * 1000.0
        log(f"fused Pallas trajectory kernel x{n_chain} chained: "
            f"{fused_s*1000:.1f} ms -> {step_ms:.4f} ms/step device time")
        emitter.set_headline(
            step_ms, "fused pallas trajectory kernel (ops/pallas)")
        emitter.emit()  # first parseable line: headline is now banked
    except Exception as e:  # noqa: BLE001
        log(f"fused chain failed: {e!r}")

    # ---- scan sampler step time (also the fallback headline) -------------
    def sec_scan():
        nonlocal step_ms

        @jax.jit
        def chain_scan(z):
            fn = _denoise_fn(model, variables, emb)
            return jax.lax.fori_loop(
                0, n_chain,
                lambda i, z: ddim_sample(fn, sched, z, jnp.asarray(times),
                                         eta=0.0)[0], z)

        scan_s, _ = timed(chain_scan, z0, warmup=25)
        scan_step_ms = (max(scan_s - floor_s, 1e-9) / n_chain / n_steps
                        * 1000.0)
        log(f"lax.scan sampler x{n_chain} chained: {scan_s*1000:.1f} ms -> "
            f"{scan_step_ms:.4f} ms/step device time"
            + (f" (fused speedup {scan_step_ms/step_ms:.2f}x)"
               if step_ms else ""))
        emitter.set(scan_step_ms=round(scan_step_ms, 4))
        if step_ms is None:  # fused path failed: scan becomes the headline
            step_ms = scan_step_ms
            emitter.set_headline(step_ms, "lax.scan sampler (fallback)")

    # ---- fused kernel on the dpm++ half grid (fastest full transfer) -----
    def sec_fused_dpm():
        dpm_grid = transfer_time_grid(steps, steps // 2)

        @jax.jit
        def chain_fused_dpm(z):
            ops, names = pack_operands(variables["params"]["unet"], emb,
                                       sched, dpm_grid, 0.0,
                                       dtype=jnp.bfloat16, sampler="dpm++")
            return jax.lax.fori_loop(
                0, n_chain,
                lambda i, z: fused_ddim_sample(ops, names, z,
                                               len(dpm_grid) - 1,
                                               dtype=jnp.bfloat16,
                                               interpret=on_cpu), z)

        fd_s, _ = timed(chain_fused_dpm, z0, warmup=25)
        fused_dpm_traj_ms = max(fd_s - floor_s, 1e-9) / n_chain * 1000.0
        log(f"fused dpm++ {steps // 2}-step trajectory x{n_chain} chained: "
            f"{fused_dpm_traj_ms:.3f} ms per FULL transfer (device)")
        emitter.set(
            fused_dpm_halfgrid_transfer_ms=round(fused_dpm_traj_ms, 3))

    # ---- batched fused trajectory kernel (round-3: serving buckets) ------
    def sec_fused_b4():
        bsz = 4  # the largest bucket where the kernel beats the scan
        zb = jax.random.normal(jax.random.PRNGKey(5), (bsz, 16, 16, 32),
                               jnp.float32)

        @jax.jit
        def chain_fused_batch(z):
            ops, names = pack_operands(variables["params"]["unet"], emb,
                                       sched, times, 0.0,
                                       dtype=jnp.bfloat16, batch=bsz)
            return jax.lax.fori_loop(
                0, n_chain,
                lambda i, z: fused_ddim_sample(ops, names, z, n_steps,
                                               dtype=jnp.bfloat16,
                                               interpret=on_cpu), z)

        fb_s, _ = timed(chain_fused_batch, zb, warmup=25)
        per_traj_ms = max(fb_s - floor_s, 1e-9) / n_chain * 1000.0
        log(f"fused batch-{bsz} trajectory x{n_chain} chained: "
            f"{per_traj_ms:.3f} ms per batch trajectory "
            f"({bsz * n_steps * 1000.0 / per_traj_ms:.0f} steps/s, "
            f"{bsz * 1000.0 / per_traj_ms:.0f} clips/s)")
        emitter.set(fused_b4_trajectory_ms=round(per_traj_ms, 3))

    # ---- fused kernel on a distilled 6-step grid (fastest single clip) ----
    # The progressive-distillation student (training/distill.py) samples on
    # transfer_time_grid(50, 7) — 6 denoiser evaluations per transfer.  Run
    # that grid through the whole-trajectory Pallas kernel: the lowest
    # single-clip latency the framework offers (distillation x fusion
    # compose; CLI: `transfer --sampler fused --sample-steps 7`).  Timing
    # only — kernel cost is weight-independent, so random params are fine.
    def sec_fused_d6():
        d6_grid = transfer_time_grid(steps, 7)
        # ~6/49 of the full trajectory's work: chain 8x more so device
        # compute still dominates the ~2 ms relay RTT jitter.
        n_chain_d6 = n_chain * 8

        @jax.jit
        def chain_fused_d6(z):
            ops, names = pack_operands(variables["params"]["unet"], emb,
                                       sched, d6_grid, 0.0,
                                       dtype=jnp.bfloat16)
            return jax.lax.fori_loop(
                0, n_chain_d6,
                lambda i, z: fused_ddim_sample(ops, names, z,
                                               len(d6_grid) - 1,
                                               dtype=jnp.bfloat16,
                                               interpret=on_cpu), z)

        f6_s, _ = timed(chain_fused_d6, z0, warmup=25)
        fused_d6_ms = max(f6_s - floor_s, 1e-9) / n_chain_d6 * 1000.0
        log(f"fused distilled 6-step trajectory x{n_chain_d6} chained: "
            f"{fused_d6_ms:.4f} ms per FULL transfer (device, "
            f"{1000.0 / fused_d6_ms:.0f} clips/s at batch 1)")
        emitter.set(fused_distill6_transfer_ms=round(fused_d6_ms, 4))

    # ---- single-call client latency (relay-bound; context number) --------
    def transfer(content, style):
        decoded, _, _ = content_style_transfer(
            model, variables, jax.random.PRNGKey(2), content, style,
            num_timesteps=steps, eta=0.0)
        return decoded

    transfer_jit = jax.jit(transfer)

    def sec_client_latency():
        total_s, _ = timed(transfer_jit, content, style)
        log(f"50-step transfer, single-call client latency (includes one "
            f"relay round trip): {total_s*1000:.1f} ms")
        emitter.set(client_latency_50step_ms=round(total_s * 1000, 2))

    # ---- DPM-Solver++(2M) scan on a half-coarse grid ---------------------
    def sec_dpm_scan():
        def transfer_dpm(content, style):
            decoded, _, _ = content_style_transfer(
                model, variables, jax.random.PRNGKey(2), content, style,
                num_timesteps=steps, eta=0.0, sampler="dpm++",
                steps=steps // 2)
            return decoded

        dpm_s, _ = timed(jax.jit(transfer_dpm), content, style)
        log(f"dpm++ {steps // 2}-step transfer (equal-accuracy coarse "
            f"grid): {dpm_s*1000:.1f} ms client latency")
        emitter.set(transfer_dpm_halfgrid_ms=round(dpm_s * 1000, 2))

    # ---- 10 s clip end-to-end (4 x 3 s chunks as one batch) --------------
    def sec_e2e():
        from music_style_transfer_ldm_tpu.audio import melspectrogram
        from music_style_transfer_ldm_tpu.audio.mel import (
            db_to_power, power_to_db,
        )
        from music_style_transfer_ldm_tpu.audio.quantize import (
            db_to_unit_image, unit_image_to_db,
        )
        from music_style_transfer_ldm_tpu.audio.griffinlim import (
            mel_to_audio,
        )
        sr = cfg.audio.sample_rate
        clip = (np.random.RandomState(2).randn(4, 3 * sr)
                .astype(np.float32) * 0.1)
        style4 = jnp.tile(style, (4, 1, 1, 1))

        def end_to_end(chunks, style_img):
            mel_power = melspectrogram(chunks, sr=sr, n_mels=128)
            db = power_to_db(mel_power, batched=True)
            imgs = db_to_unit_image(db)[:, :, :128, None]
            decoded, _, _ = content_style_transfer(
                model, variables, jax.random.PRNGKey(3), imgs, style_img,
                num_timesteps=steps, eta=0.0)
            out_db = unit_image_to_db(decoded[:, :, :, 0])
            # pad back to 130 frames with silence columns for inversion
            out_db = jnp.pad(out_db, ((0, 0), (0, 0), (0, 2)),
                             constant_values=-80.0)
            audio = mel_to_audio(db_to_power(out_db), sr=sr, n_iter=32,
                                 nnls_iters=64, length=3 * sr)
            return audio

        e2e_jit = jax.jit(end_to_end)
        e2e_s, audio = timed(e2e_jit, jnp.asarray(clip), style4, repeats=3)
        log(f"10s clip end-to-end (mel->encode->50-step DDIM->decode->GL): "
            f"{e2e_s:.3f} s (target < 5 s); audio {audio.shape}")
        emitter.set(e2e_10s_clip_s=round(e2e_s, 3))

    # ---- batched serving throughput + MFU --------------------------------
    content64 = jnp.tile(content, (64, 1, 1, 1))
    style64 = jnp.tile(style, (64, 1, 1, 1))
    n_b64 = 1 if on_cpu else 16

    def sec_b64():
        @jax.jit
        def chain_b64(c):
            # Each iteration's decoded [0,1] output is the next content,
            # and the style batch is rotated per iteration — without that,
            # XLA hoists the loop-invariant style-encoder forward out of
            # the chain and the amortized time flatters the real per-batch
            # cost.
            def body(i, c):
                return transfer(c, jnp.roll(style64, i, axis=0))
            return jax.lax.fori_loop(0, n_b64, body, c)

        b64_s, _ = timed(chain_b64, content64, repeats=3, warmup=25)
        thr_s = max(b64_s - floor_s, 1e-9) / n_b64
        transfer_flops = _flops(transfer_jit, content64, style64)
        transfer_mfu = _mfu(transfer_flops, thr_s, peak)
        log(f"batch-64 transfer throughput (x{n_b64} chained, device "
            f"time): {64 / thr_s:.0f} clips/s ({thr_s * 1000:.1f} "
            f"ms/batch), {(transfer_flops or 0) / 1e9:.1f} GFLOP"
            + (f", MFU {transfer_mfu:.1%}" if transfer_mfu is not None
               else ""))
        emitter.set(
            transfer_b64_ms=round(thr_s * 1000, 2),
            transfer_b64_gflop=(round(transfer_flops / 1e9, 2)
                                if transfer_flops else None),
            mfu_transfer_b64=(round(transfer_mfu, 4)
                              if transfer_mfu is not None else None))

    # ---- batch-64 throughput on the equal-accuracy dpm++ half grid ------
    def sec_b64_dpm():
        def transfer_dpm64(c, s):
            decoded, _, _ = content_style_transfer(
                model, variables, jax.random.PRNGKey(2), c, s,
                num_timesteps=steps, eta=0.0, sampler="dpm++",
                steps=steps // 2)
            return decoded

        @jax.jit
        def chain_b64_dpm(c):
            def body(i, c):
                return transfer_dpm64(c, jnp.roll(style64, i, axis=0))
            return jax.lax.fori_loop(0, n_b64, body, c)

        bd_s, _ = timed(chain_b64_dpm, content64, repeats=3, warmup=25)
        thr_dpm = max(bd_s - floor_s, 1e-9) / n_b64
        log(f"batch-64 dpm++ {steps // 2}-step transfer (equal measured "
            f"accuracy, 91.1% vs 91.2% eval): {64 / thr_dpm:.0f} clips/s "
            f"({thr_dpm * 1000:.1f} ms/batch)")
        emitter.set(transfer_b64_dpm25_clips_per_s=round(64 / thr_dpm))

    # ---- batch-64 throughput on the 6-step distilled grid ----------------
    # The grid a progressively-distilled student walks (training/distill.py,
    # stages 48->24->12->6 over the steps=50 transfer range): 6 denoiser
    # evals per clip.  Device time only depends on the grid, not the
    # weights; the matching quality numbers live in
    # docs/results/distill/transfer_eval_distill*.json.
    def sec_b64_d6():
        def transfer_d6(c, s):
            decoded, _, _ = content_style_transfer(
                model, variables, jax.random.PRNGKey(2), c, s,
                num_timesteps=steps, eta=0.0, sampler="ddim", steps=7)
            return decoded

        @jax.jit
        def chain_b64_d6(c):
            def body(i, c):
                return transfer_d6(c, jnp.roll(style64, i, axis=0))
            return jax.lax.fori_loop(0, n_b64, body, c)

        d6_s, _ = timed(chain_b64_d6, content64, repeats=3, warmup=25)
        thr_d6 = max(d6_s - floor_s, 1e-9) / n_b64
        log(f"batch-64 distilled-grid 6-step transfer: {64 / thr_d6:.0f} "
            f"clips/s ({thr_d6 * 1000:.2f} ms/batch)")
        emitter.set(transfer_b64_distill6_clips_per_s=round(64 / thr_d6))

    # ---- batch-64 throughput on the 1-step distilled grid -----------------
    # The factor-3 final distillation stage (training/distill.py,
    # stages 48->24->12->6->3 -> ONE step) collapses a transfer to a single
    # denoiser eval: encode + 1 UNet call + decode per clip.  Quality:
    # docs/results/distill/ (transfer_eval_distill1 / distill_fidelity_1).
    def sec_b64_d1():
        def transfer_d1(c, s):
            decoded, _, _ = content_style_transfer(
                model, variables, jax.random.PRNGKey(2), c, s,
                num_timesteps=steps, eta=0.0, sampler="ddim", steps=2)
            return decoded

        @jax.jit
        def chain_b64_d1(c):
            def body(i, c):
                return transfer_d1(c, jnp.roll(style64, i, axis=0))
            return jax.lax.fori_loop(0, n_b64, body, c)

        d1_s, _ = timed(chain_b64_d1, content64, repeats=3, warmup=25)
        thr_d1 = max(d1_s - floor_s, 1e-9) / n_b64
        log(f"batch-64 distilled-grid 1-step transfer: {64 / thr_d1:.0f} "
            f"clips/s ({thr_d1 * 1000:.2f} ms/batch)")
        emitter.set(transfer_b64_distill1_clips_per_s=round(64 / thr_d1))

    # ---- serving engine saturation throughput -----------------------------
    # The async microbatcher under a saturating closed burst: 256 requests
    # enqueued at once, measured to last completion.  Exercises the real
    # queue -> bucket-dispatch -> device path (mel-image serving; the
    # full latency/throughput-vs-offered-load curves incl. audio inversion
    # live in docs/results/serving_load_curve.json via
    # tools/serving_load_curve.py).
    def sec_serving():
        from music_style_transfer_ldm_tpu.serving.engine import (
            EngineConfig, InferenceEngine,
        )
        ecfg = EngineConfig(sampler="dpm++", sample_steps=steps // 2 + 1,
                            invert_audio=False)
        engine = InferenceEngine(model, variables, ecfg)
        engine.warmup()
        engine.start()
        try:
            rng_s = np.random.RandomState(3)
            reqs = [(rng_s.rand(S, S, 1).astype(np.float32),
                     rng_s.rand(S, S, 1).astype(np.float32))
                    for _ in range(16)]
            # Prime one request through the full path before timing.
            engine.submit(*reqs[0], seed=0).get()
            n_req = 256
            t0 = time.perf_counter()
            waiters = [engine.submit(*reqs[i % 16], seed=i)
                       for i in range(n_req)]
            for w in waiters:
                out = w.get(timeout=120)
                if isinstance(out, Exception):
                    raise out
            dt = time.perf_counter() - t0
        finally:
            engine.stop()
        log(f"serving saturation: {n_req} queued requests in {dt:.2f}s "
            f"-> {n_req / dt:.0f} clips/s (dpm++ {steps // 2 + 1}-step, "
            f"bucket ladder {ecfg.batch_buckets})")
        emitter.set(serving_saturated_clips_per_s=round(n_req / dt, 1))

    # ---- batch-128 LDM train step (reference recipe) + MFU ---------------
    def sec_train():
        from music_style_transfer_ldm_tpu.training import LDMTrainer
        # Full recipe: lpips compression + vggish style.  The flagship run
        # uses the TRAINABLE style term (style_loss_stop_gradient=False —
        # the mode that actually converges, docs/results/fullscale/): with
        # gradients flowing through it the style branch stays live in the
        # chained loop below even though the per-step metrics are
        # discarded.  (With the reference's no_grad quirk the style
        # forward is metric-only, XLA dead-code-eliminates it when metrics
        # are dropped, and the measured "step" silently loses ~2/3 of its
        # FLOPs.)
        import dataclasses as _dc
        bench_cfg = _dc.replace(cfg)
        bench_cfg.train = _dc.replace(cfg.train,
                                      style_loss_stop_gradient=False)
        trainer = LDMTrainer(bench_cfg)
        state = trainer.init_state(0)
        fparams = trainer._feature_params()
        c128 = jnp.tile(content, (128, 1, 1, 1))
        s128 = jnp.tile(style, (128, 1, 1, 1))
        key = jax.random.PRNGKey(9)
        train_flops = _flops(trainer._train_step, state, c128, s128, key,
                             fparams)
        n_train = 1 if on_cpu else 16

        @jax.jit
        def chain_train(st):
            # Dependent chain: each step consumes the previous step's
            # state.  Rotate the batches per iteration — with a constant
            # batch XLA hoists the loop-invariant perceptual-feature
            # branches out of the loop and the amortized step time comes
            # out impossibly fast (>100% MFU was observed).
            def body(i, st):
                return trainer._step(st, jnp.roll(c128, i, axis=0),
                                     jnp.roll(s128, i, axis=0),
                                     jax.random.fold_in(key, i), fparams)[0]
            return jax.lax.fori_loop(0, n_train, body, st)

        tr_s, state = timed(chain_train, state, repeats=4, warmup=25)
        train_s = max(tr_s - floor_s, 1e-9) / n_train
        train_mfu = _mfu(train_flops, train_s, peak)
        log(f"batch-128 train step (x{n_train} chained, device time): "
            f"{train_s * 1000:.1f} ms, "
            f"{(train_flops or 0) / 1e9:.1f} GFLOP"
            + (f", MFU {train_mfu:.1%}" if train_mfu is not None else "")
            + f" ({128 / train_s:.0f} samples/s)")
        emitter.set(
            train_b128_step_ms=round(train_s * 1000, 2),
            train_b128_gflop=(round(train_flops / 1e9, 2)
                              if train_flops else None),
            mfu_train_b128=(round(train_mfu, 4)
                            if train_mfu is not None else None))

    # ---- section scheduler: stalest fields first (VERDICT r04 #1) --------
    # Each section declares the metric fields it refreshes plus a
    # (warm, cold) compile-cost reserve; ordering follows the banked
    # record's per-field measured_at stamps (oldest first, never-measured
    # first of all), so consecutive budget-limited runs measure DIFFERENT
    # sections and converge to an all-fresh record instead of starving the
    # same late fields every time (the r04 failure mode: 16 stale fields).
    sections = [
        ("scan chain", ("scan_step_ms",), (0, 60), sec_scan),
        ("fused dpm++ chain", ("fused_dpm_halfgrid_transfer_ms",),
         (0, 60), sec_fused_dpm),
        ("batched fused chain", ("fused_b4_trajectory_ms",),
         (0, 60), sec_fused_b4),
        ("fused distilled-grid chain", ("fused_distill6_transfer_ms",),
         (0, 60), sec_fused_d6),
        ("client-latency section", ("client_latency_50step_ms",),
         (0, 30), sec_client_latency),
        ("dpm++ section", ("transfer_dpm_halfgrid_ms",),
         (0, 30), sec_dpm_scan),
        ("end-to-end section", ("e2e_10s_clip_s",), (10, 60), sec_e2e),
        ("batch-64 section",
         ("transfer_b64_ms", "transfer_b64_gflop", "mfu_transfer_b64"),
         (15, 45), sec_b64),
        ("batch-64 dpm++ section", ("transfer_b64_dpm25_clips_per_s",),
         (15, 45), sec_b64_dpm),
        ("batch-64 distilled section", ("transfer_b64_distill6_clips_per_s",),
         (15, 45), sec_b64_d6),
        ("batch-64 distill-1 section", ("transfer_b64_distill1_clips_per_s",),
         (15, 45), sec_b64_d1),
        ("serving section", ("serving_saturated_clips_per_s",),
         (30, 120), sec_serving),
        ("train-step section",
         ("train_b128_step_ms", "train_b128_gflop", "mfu_train_b128"),
         (100, 300), sec_train),
    ]
    ordered = order_sections_stalest_first(
        sections, emitter.fallback, emitter.fields.get("chip"))
    if ordered is not sections:
        sections = ordered
        log("section order (stalest first): "
            + ", ".join(s[0] for s in sections))
    if step_ms is None:
        # Fused headline failed: the scan section doubles as the fallback
        # headline and must run first, budget or not.
        sections.sort(key=lambda s: s[0] != "scan chain")

    for name, fields, (warm_res, cold_res), fn in sections:
        headline_required = step_ms is None and name == "scan chain"
        try:
            if (not headline_required
                    and over_budget(name, reserve(warm_res, cold_res))):
                raise TimeoutError("budget")
            fn()
            emitter.emit()
        except Exception as e:  # noqa: BLE001
            log(f"{name} failed: {e!r}")

    if not emitter.ready():
        # Last resort so the driver still records something parseable:
        # relay-bound single call / steps (what round 1 measured).
        try:
            total_s, _ = timed(transfer_jit, content, style, repeats=3,
                               warmup=5)
            emitter.set_headline(
                total_s / n_steps * 1000.0,
                "single-call client latency / steps (relay-bound)")
        except Exception as e:  # noqa: BLE001
            log(f"last-resort measurement failed: {e!r}")
    emitter.carry_forward_missing()
    emitter.emit()
    log(f"bench done in {time.time() - t_bench_start:.0f}s")


if __name__ == "__main__":
    main()
