"""Utility subsystem tests: env loader, profiling/debug, compile cache,
graft entry points."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_style_transfer_ldm_tpu.utils.env import get_env, load_env_file
from music_style_transfer_ldm_tpu.utils.profiling import (
    StepTimer, debug_mode,
)


def test_env_loader(tmp_path, monkeypatch):
    f = tmp_path / ".env.local"
    f.write_text("# comment\nHF_TOKEN='abc123'\nOTHER=x=y\n\nBAD LINE\n")
    monkeypatch.delenv("HF_TOKEN", raising=False)
    parsed = load_env_file(f)
    assert parsed["HF_TOKEN"] == "abc123"
    assert parsed["OTHER"] == "x=y"  # first '=' splits
    assert os.environ["HF_TOKEN"] == "abc123"
    assert get_env("HF_TOKEN", env_file=f) == "abc123"
    assert get_env("MISSING", default="d", env_file=f) == "d"


def test_step_timer():
    timer = StepTimer()
    for _ in range(5):
        with timer:
            sum(range(1000))
    s = timer.summary()
    assert s["steps"] == 5
    assert s["p95_s"] >= s["p50_s"] >= 0


def test_debug_mode_catches_nan():
    @jax.jit
    def bad(x):
        return jnp.log(x)  # log(-1) -> nan

    with debug_mode():
        with pytest.raises(FloatingPointError):
            np.asarray(bad(jnp.asarray(-1.0)))
    # restored afterwards
    assert not jax.config.jax_debug_nans
    assert np.isnan(np.asarray(bad(jnp.asarray(-1.0))))


def test_compile_cache_enable(tmp_path):
    from music_style_transfer_ldm_tpu.utils.cache import (
        enable_compilation_cache,
    )
    enable_compilation_cache(str(tmp_path / "cache"))
    assert (tmp_path / "cache").exists()
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cache")


def test_graft_entry_single_and_multichip():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (4, 16, 16, 32)
    assert out[1].shape == (4, 128, 128, 1)
    g.dryrun_multichip(8)
    g.dryrun_multichip(4)


def test_profiler_trace_writes_artifacts(tmp_path):
    from music_style_transfer_ldm_tpu.utils.profiling import trace
    with trace(tmp_path / "prof"):
        x = jnp.ones((64, 64))
        (x @ x).block_until_ready()
    files = list((tmp_path / "prof").rglob("*"))
    assert any(f.is_file() for f in files), "no trace artifacts written"


def test_stall_watchdog_fires_and_cancels(capsys):
    import time as _time
    from music_style_transfer_ldm_tpu.utils.profiling import StallWatchdog
    # cancels cleanly when work finishes in time
    with StallWatchdog(timeout_s=5.0, context="fast") as wd:
        pass
    _time.sleep(0.05)
    assert not wd.fired
    # fires when work overruns
    with StallWatchdog(timeout_s=0.05, context="slow epoch") as wd:
        _time.sleep(0.3)
    assert wd.fired
    out = capsys.readouterr().out
    assert "WATCHDOG" in out and "slow epoch" in out


def test_hbm_bandwidth_table():
    """Roofline's bandwidth axis (tools/roofline_b64.py): known chips
    resolve, unknown (CPU) returns None, v5p matches before v5."""
    from music_style_transfer_ldm_tpu.utils.chips import hbm_bytes_per_sec
    assert hbm_bytes_per_sec("TPU v5 lite") == 819e9
    assert hbm_bytes_per_sec("TPU v5p") == 2765e9
    assert hbm_bytes_per_sec("TPU v4") == 1228e9
    assert hbm_bytes_per_sec("cpu") is None
    assert hbm_bytes_per_sec(None) is None
