"""Bench capture-contract hardening (round 4).

BENCH_r02 (rc=124, timeout kill) and BENCH_r03 (rc=1, backend
UNAVAILABLE raise) both produced parsed=null: the driver got no JSON
line. The Emitter now (a) banks the last successful real-accelerator
headline as the FIRST stdout line with a ``stale`` marker so any death
mode still leaves a parseable record, (b) refreshes that last-good file
on every successful non-CPU emit, (c) carries a thread watchdog for the
observed hang-in-C failure mode where Python signal handlers never run.

These tests exercise the capture machinery hermetically (no backend
beyond the conftest CPU mesh).
"""

import json
import os
import subprocess
import sys

import pytest

from music_style_transfer_ldm_tpu import benchmarks as B


@pytest.fixture()
def last_good(tmp_path, monkeypatch):
    p = tmp_path / "last_good.json"
    rec = {"metric": "ddim_step_ms", "value": 0.0096, "unit": "ms",
           "vs_baseline": 5194.37, "sampler": "fused"}
    p.write_text(json.dumps(rec))
    monkeypatch.setenv("MSTLDM_BENCH_LAST_GOOD", str(p))
    return p, rec


def test_fallback_loaded_from_env_path(last_good):
    p, rec = last_good
    e = B.Emitter()
    assert e.fallback == rec


def test_bank_fallback_prints_stale_line(last_good, capsys):
    e = B.Emitter()
    assert e.bank_fallback("unit-test reason")
    line = capsys.readouterr().out.strip()
    d = json.loads(line)
    assert d["stale"] is True
    assert d["stale_reason"] == "unit-test reason"
    assert d["value"] == 0.0096
    # A banked stale line counts as printed (driver rc=0) but NOT as a
    # real measurement (watchdog must still be allowed to fire).
    assert e._printed_any and not e._measured_any


def test_bank_fallback_prefers_real_measurement(last_good, capsys):
    e = B.Emitter()
    e.set_headline(0.5, "unit")
    assert e.bank_fallback("should be ignored")
    d = json.loads(capsys.readouterr().out.strip())
    assert "stale" not in d
    assert d["value"] == 0.5


def test_bank_fallback_without_file(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("MSTLDM_BENCH_LAST_GOOD",
                       str(tmp_path / "missing.json"))
    e = B.Emitter()
    assert e.fallback is None
    assert not e.bank_fallback("no file")
    assert capsys.readouterr().out == ""


def test_emit_does_not_save_last_good_on_cpu(last_good, capsys):
    p, rec = last_good
    e = B.Emitter()
    e.set_headline(0.123, "unit")
    e.emit()
    json.loads(capsys.readouterr().out.strip())
    # conftest forces the CPU backend: the last-good file must keep the
    # seeded (real-TPU) record, not be overwritten by a CPU number.
    assert json.loads(p.read_text()) == rec
    assert e._measured_any


def test_devices_with_retry_gives_up_after_window(monkeypatch):
    calls = []

    def boom():
        calls.append(1)
        raise RuntimeError("UNAVAILABLE: TPU backend setup/compile error")

    monkeypatch.setattr(B.jax, "devices", boom)
    monkeypatch.setattr(B.time, "sleep", lambda s: None)
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        B._devices_with_retry(0.0)  # window already spent: one attempt
    assert len(calls) == 1


def test_devices_with_retry_recovers(monkeypatch):
    state = {"n": 0}

    def flaky():
        state["n"] += 1
        if state["n"] < 3:
            raise RuntimeError("UNAVAILABLE")
        return ["fake-device"]

    monkeypatch.setattr(B.jax, "devices", flaky)
    monkeypatch.setattr(B.time, "sleep", lambda s: None)
    assert B._devices_with_retry(3600.0) == ["fake-device"]
    assert state["n"] == 3


def test_repo_last_good_file_is_committed_and_parseable():
    p = B._last_good_path()
    assert p.exists(), "docs/results/bench_last_good.json must be committed"
    d = json.loads(p.read_text())
    assert d["metric"] == "ddim_step_ms" and d["value"] > 0
    assert "provenance" in d and "measured_at" in d


def test_main_emits_stale_line_when_backend_unavailable(last_good, tmp_path):
    """End-to-end dead-relay drill: run bench main() in a subprocess with
    jax.devices patched to raise the exact r03 error, and assert rc=0
    with a parseable stale line on stdout (the r03 failure, now
    survived). The backend is forced to CPU so the drill never touches
    the real relay (whose plugin discovery can hang when the tunnel is
    sick — the very failure mode being simulated)."""
    env = dict(os.environ)
    env["MSTLDM_BENCH_LAST_GOOD"] = str(last_good[0])
    env["MSTLDM_BENCH_INIT_RETRY_S"] = "0"
    env["JAX_PLATFORMS"] = "cpu"
    env["MSTLDM_COMPILE_CACHE"] = str(tmp_path / "cache")
    drill = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import music_style_transfer_ldm_tpu.benchmarks as B\n"
        "def boom(*a, **k):\n"
        "    raise RuntimeError('UNAVAILABLE: TPU backend setup/compile "
        "error (simulated)')\n"
        "B.jax.devices = boom\n"
        "B.main()\n")
    r = subprocess.run(
        [sys.executable, "-c", drill],
        capture_output=True, text=True, timeout=120, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert lines, r.stderr[-2000:]
    d = json.loads(lines[-1])
    assert d["stale"] is True and d["value"] == 0.0096
    assert "init failed" in d["stale_reason"]


def test_carry_forward_missing_secondary_fields(tmp_path, monkeypatch,
                                                capsys):
    """A budget-skipped run keeps the driver record complete: secondary
    fields missing from the fresh line are filled from the last-good
    record with explicit provenance marking; a different chip or a run
    with no real measurement carries nothing (VERDICT r03 #7)."""
    p = tmp_path / "last_good.json"
    p.write_text(json.dumps({
        "metric": "ddim_step_ms", "value": 0.0096, "unit": "ms",
        "vs_baseline": 5208.33, "chip": "TPU v5 lite",
        "mfu_train_b128": 0.4161, "scan_step_ms": 0.0213,
        "measured_at": "2026-08-17T18:58:00Z"}))
    monkeypatch.setenv("MSTLDM_BENCH_LAST_GOOD", str(p))

    e = B.Emitter()
    e.set(chip="TPU v5 lite", scan_step_ms=0.03)
    e.set_headline(0.0101, "fused")
    # No real emit yet: nothing carried.
    e.carry_forward_missing()
    assert "mfu_train_b128" not in e.fields
    e.emit()
    capsys.readouterr()
    e.carry_forward_missing()
    e.emit()
    d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d["value"] == 0.0101                      # fresh headline kept
    assert d["scan_step_ms"] == 0.03                 # fresh field kept
    assert d["mfu_train_b128"] == 0.4161             # carried
    assert d["fields_from_last_good"] == ["mfu_train_b128"]
    assert d["last_good_measured_at"] == "2026-08-17T18:58:00Z"

    # Different chip: never mix.
    e2 = B.Emitter()
    e2.set(chip="TPU v6e")
    e2.set_headline(0.004, "fused")
    e2.emit()
    capsys.readouterr()
    e2.carry_forward_missing()
    assert "mfu_train_b128" not in e2.fields


def test_save_last_good_merges_previous_record(tmp_path, monkeypatch,
                                               capsys):
    """A partial (budget-skipped / killed-early) emit must not erase
    fields a previous same-chip record measured: _save_last_good merges
    them in with explicit fields_from_last_good provenance (observed
    regression: a timeout-600 release_check run overwrote the banked
    record and dropped train_b128_*)."""
    p = tmp_path / "last_good.json"
    p.write_text(json.dumps({
        "metric": "ddim_step_ms", "value": 0.0096, "unit": "ms",
        "vs_baseline": 5208.33, "chip": "TPU v5 lite",
        "train_b128_step_ms": 24.4, "mfu_train_b128": 0.4176,
        "scan_step_ms": 0.0212, "measured_at": "2026-08-18T22:54:44Z"}))
    monkeypatch.setenv("MSTLDM_BENCH_LAST_GOOD", str(p))
    monkeypatch.setattr(B.jax, "default_backend", lambda: "tpu")

    e = B.Emitter()
    e.set(chip="TPU v5 lite", scan_step_ms=0.03)   # fresh partial run
    e.set_headline(0.0101, "fused")
    e.emit()
    capsys.readouterr()

    saved = json.loads(p.read_text())
    assert saved["value"] == 0.0101                 # fresh headline kept
    assert saved["scan_step_ms"] == 0.03            # fresh field kept
    assert saved["train_b128_step_ms"] == 24.4      # inherited, not lost
    assert saved["mfu_train_b128"] == 0.4176
    assert set(saved["fields_from_last_good"]) == {
        "train_b128_step_ms", "mfu_train_b128"}
    assert saved["last_good_measured_at"] == "2026-08-18T22:54:44Z"

    # Different chip: never mix — the partial record replaces wholesale.
    p.write_text(json.dumps({
        "metric": "ddim_step_ms", "value": 0.004, "chip": "TPU v6e",
        "train_b128_step_ms": 11.0, "measured_at": "x"}))
    e2 = B.Emitter()
    e2.set(chip="TPU v5 lite")
    e2.set_headline(0.0101, "fused")
    e2.emit()
    capsys.readouterr()
    saved = json.loads(p.read_text())
    assert "train_b128_step_ms" not in saved
    # Cross-chip: nothing inherited; the explicit [] marks all-fresh.
    assert saved["fields_from_last_good"] == []


def test_field_measured_at_persisted_and_inherited(tmp_path, monkeypatch,
                                                   capsys):
    """The banked record carries per-field freshness stamps: fields
    measured this run get a new stamp, merged-in fields keep the previous
    record's stamp (falling back to its measured_at), so staleness
    accumulates honestly across partial runs (VERDICT r04 #1)."""
    p = tmp_path / "last_good.json"
    p.write_text(json.dumps({
        "metric": "ddim_step_ms", "value": 0.0096, "unit": "ms",
        "vs_baseline": 5208.33, "chip": "TPU v5 lite",
        "train_b128_step_ms": 24.4, "scan_step_ms": 0.0212,
        "field_measured_at": {"train_b128_step_ms": "2026-08-10T00:00:00Z"},
        "measured_at": "2026-08-18T22:54:44Z"}))
    monkeypatch.setenv("MSTLDM_BENCH_LAST_GOOD", str(p))
    monkeypatch.setattr(B.jax, "default_backend", lambda: "tpu")

    e = B.Emitter()
    e.set(chip="TPU v5 lite", scan_step_ms=0.03)
    e.set_headline(0.0101, "fused")
    e.emit()
    capsys.readouterr()

    saved = json.loads(p.read_text())
    fma = saved["field_measured_at"]
    # Freshly measured this run: a new (recent) stamp.
    assert fma["scan_step_ms"] >= saved["measured_at"][:10]
    assert fma["value"] == fma["scan_step_ms"]
    # Inherited field keeps its own old per-field stamp, not the record's.
    assert fma["train_b128_step_ms"] == "2026-08-10T00:00:00Z"


def test_order_sections_stalest_first():
    sections = [
        ("a", ("scan_step_ms",), (0, 0), None),
        ("b", ("train_b128_step_ms",), (0, 0), None),
        ("c", ("e2e_10s_clip_s",), (0, 0), None),
        ("d", ("mfu_transfer_b64", "transfer_b64_ms"), (0, 0), None),
    ]
    fb = {
        "chip": "TPU v5 lite",
        "measured_at": "2026-08-18T22:00:00Z",
        "scan_step_ms": 1, "train_b128_step_ms": 2, "mfu_transfer_b64": 3,
        "transfer_b64_ms": 4,
        # e2e_10s_clip_s absent from the record entirely -> stalest of all
        "field_measured_at": {
            "scan_step_ms": "2026-08-18T22:00:00Z",
            "train_b128_step_ms": "2026-08-10T00:00:00Z",
            "mfu_transfer_b64": "2026-08-15T00:00:00Z",
            # transfer_b64_ms has no per-field stamp -> record measured_at
        },
    }
    out = B.order_sections_stalest_first(sections, fb, "TPU v5 lite")
    assert [s[0] for s in out] == ["c", "b", "d", "a"]

    # Different chip / missing record: declared order untouched.
    assert B.order_sections_stalest_first(sections, fb, "TPU v6e") is sections
    assert B.order_sections_stalest_first(sections, None, "x") is sections


def test_carry_forward_empty_list_when_all_fresh(tmp_path, monkeypatch,
                                                 capsys):
    """An all-fresh run's final line says so explicitly:
    fields_from_last_good == [] (the round-5 release-gate criterion)."""
    p = tmp_path / "last_good.json"
    p.write_text(json.dumps({
        "metric": "ddim_step_ms", "value": 0.0096, "chip": "TPU v5 lite",
        "measured_at": "2026-08-18T22:54:44Z"}))
    monkeypatch.setenv("MSTLDM_BENCH_LAST_GOOD", str(p))
    e = B.Emitter()
    e.set(chip="TPU v5 lite")
    for k in B.Emitter._SECONDARY_KEYS:
        e.set(**{k: 1.0})
    e.set_headline(0.0101, "fused")
    e.emit()
    capsys.readouterr()
    e.carry_forward_missing()
    e.emit()
    d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d["fields_from_last_good"] == []
