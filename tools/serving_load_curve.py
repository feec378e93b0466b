"""Serving latency/throughput under Poisson load (VERDICT r04 #7).

Drives the async microbatcher (serving/engine.py) with open-loop Poisson
arrivals at increasing offered load, with and without bucket autoscaling,
and records per-request latency percentiles + achieved throughput at each
level.  Open-loop means arrivals do NOT wait for completions — queueing
delay shows up honestly when the engine saturates (the knee of the
curve), unlike closed-loop "back-to-back" drivers that can never
oversubscribe.

Latency timestamps use time.monotonic at submit and at result delivery;
the engine's own dispatch thread does the batching, so the measured
latency includes queueing + microbatch wait (max_wait_ms) + device time +
relay round trip + audio inversion when enabled.

    python tools/serving_load_curve.py \
        [--loads 50,100,200,400,800] [--seconds 8] [--invert-audio]
        [--out docs/results/serving_load_curve.json]

Weights are random (latency is weight-independent); results go to one
JSON consumed by docs/PERFORMANCE.md's "Serving under load" section.
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def drive_level(engine, rate_per_s: float, seconds: float,
                content: np.ndarray, style: np.ndarray, rng) -> dict:
    """Open-loop Poisson arrivals at rate_per_s for `seconds`; returns
    latency percentiles + achieved throughput."""
    results = []  # (submit_t, done_t)
    lock = threading.Lock()
    waiters = []

    def wait_one(done_q, t_submit):
        out = done_q.get()
        t_done = time.monotonic()
        with lock:
            results.append((t_submit, t_done,
                            isinstance(out, Exception)))

    t0 = time.monotonic()
    n_sent = 0
    next_t = t0
    while True:
        now = time.monotonic()
        if now - t0 >= seconds:
            break
        if now < next_t:
            time.sleep(min(next_t - now, 0.002))
            continue
        i = n_sent % len(content)
        done_q = engine.submit(content[i], style[i], seed=n_sent)
        w = threading.Thread(target=wait_one, args=(done_q, next_t),
                             daemon=True)
        w.start()
        waiters.append(w)
        n_sent += 1
        next_t += rng.exponential(1.0 / rate_per_s)
    t_sent_end = time.monotonic()
    for w in waiters:
        w.join(timeout=120)
    t_end = time.monotonic()

    lats = sorted((d - s) * 1000 for s, d, err in results if not err)
    errors = sum(1 for _, _, err in results if err)
    done = len(lats)
    return {
        "offered_clips_per_s": round(rate_per_s, 1),
        "sent": n_sent,
        "completed": done,
        "errors": errors,
        "achieved_clips_per_s": round(done / max(t_end - t0, 1e-9), 1),
        "p50_ms": round(lats[done // 2], 1) if done else None,
        "p90_ms": round(lats[int(done * 0.9)], 1) if done else None,
        "p99_ms": round(lats[min(int(done * 0.99), done - 1)], 1)
        if done else None,
        "max_ms": round(lats[-1], 1) if done else None,
        "drain_s": round(t_end - t_sent_end, 2),
    }


def run_curve(autoscale: bool, loads, seconds: float, invert_audio: bool,
              sampler: str, sample_steps, steps: int = 50,
              buckets=(1, 2, 4, 8)) -> dict:
    import jax
    import jax.numpy as jnp

    from music_style_transfer_ldm_tpu.config import default_config
    from music_style_transfer_ldm_tpu.models.ldm import LDM
    from music_style_transfer_ldm_tpu.serving.engine import (
        EngineConfig, InferenceEngine,
    )

    cfg = default_config()
    model = LDM(latent_dim=cfg.model.latent_dim,
                num_timesteps=cfg.diffusion.num_timesteps,
                dtype=jnp.bfloat16)
    S = cfg.model.image_size
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0),
         "diffusion": jax.random.PRNGKey(1)},
        jnp.zeros((1, S, S, 1)), jnp.zeros((1, S, S, 1)),
        jnp.zeros((1,), jnp.int32))

    ecfg = EngineConfig(steps=steps, sampler=sampler,
                        sample_steps=sample_steps,
                        invert_audio=invert_audio, autoscale=autoscale,
                        batch_buckets=tuple(buckets), max_bucket=128)
    engine = InferenceEngine(model, variables, ecfg)
    t0 = time.time()
    engine.warmup()
    warm_s = time.time() - t0
    engine.start()

    rng = np.random.RandomState(0)
    content = rng.rand(16, S, S, 1).astype(np.float32)
    style = rng.rand(16, S, S, 1).astype(np.float32)
    # Prime: one request through the full path before timing.
    engine.submit(content[0], style[0], seed=0).get()

    levels = []
    for rate in loads:
        lv = drive_level(engine, rate, seconds, content, style, rng)
        lv["stats"] = dict(engine.stats())
        levels.append(lv)
        print(f"autoscale={autoscale} rate={rate}: {lv}", flush=True)
    engine.stop()
    return {"autoscale": autoscale, "warmup_s": round(warm_s, 1),
            "levels": levels, "engine_stats": dict(engine.stats())}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--loads", default="50,100,200,400,800,1600")
    p.add_argument("--seconds", type=float, default=8.0)
    p.add_argument("--invert-audio", action="store_true",
                   help="full product path incl. NNLS+Griffin-Lim audio "
                        "(default: mel-image serving)")
    p.add_argument("--sampler", default="dpm++")
    p.add_argument("--sample-steps", type=int, default=26)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--buckets", default="1,2,4,8")
    p.add_argument("--out", default=str(REPO / "docs" / "results"
                                        / "serving_load_curve.json"))
    args = p.parse_args()

    from music_style_transfer_ldm_tpu.utils.cache import (
        enable_compilation_cache,
    )
    enable_compilation_cache()
    import jax

    loads = [float(x) for x in args.loads.split(",")]
    record = {
        "chip": str(getattr(jax.devices()[0], "device_kind", "cpu")),
        "backend": jax.default_backend(),
        "sampler": args.sampler, "sample_steps": args.sample_steps,
        "invert_audio": bool(args.invert_audio),
        "seconds_per_level": args.seconds,
        "arrivals": "open-loop Poisson (exponential inter-arrival)",
        "runs": [run_curve(False, loads, args.seconds, args.invert_audio,
                           args.sampler, args.sample_steps, args.steps,
                           [int(b) for b in args.buckets.split(",")]),
                 run_curve(True, loads, args.seconds, args.invert_audio,
                           args.sampler, args.sample_steps, args.steps,
                           [int(b) for b in args.buckets.split(",")])],
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(record, indent=1) + "\n")
    print(f"wrote {out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
