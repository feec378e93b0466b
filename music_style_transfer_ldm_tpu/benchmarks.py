"""Headline benchmark (library form). Prints ONE JSON line to stdout.

Primary metric: DDIM denoise step latency on the flagship LDM (bf16,
batch 1, 50-step style-conditioned transfer as one fused lax.scan),
measured on whatever accelerator jax selects (the real TPU chip under the
driver). Baseline: the driver's north-star target of 50 ms/step
(BASELINE.md; the reference publishes no numbers of its own —
vs_baseline > 1 means faster than the target).

Secondary numbers (stderr): full 10 s clip end-to-end transfer
(mel -> VAE encode -> 50-step DDIM -> decode -> NNLS + Griffin-Lim audio),
target < 5 s.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _sync(out) -> None:
    """Force real completion: fetch one element to host.

    Through the axon relay, block_until_ready can return before the device
    work drains; a host readback cannot lie.
    """
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def _peak_flops_per_sec(device) -> float | None:
    """Peak dense bf16 FLOP/s for the chip, or None if unknown (e.g. CPU).

    Published per-chip peaks: v2 46, v3 123, v4 275, v5e 197, v5p 459,
    v6e 918 TFLOP/s.  Substring match on device_kind; order matters
    (v5p before v5).
    """
    kind = str(getattr(device, "device_kind", "")).lower()
    for key, peak in (("v6", 918e12), ("v5p", 459e12), ("v5", 197e12),
                      ("v4", 275e12), ("v3", 123e12), ("v2", 46e12)):
        if key in kind:
            return peak
    return None


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


def main() -> None:
    from music_style_transfer_ldm_tpu.utils.cache import (
        enable_compilation_cache,
    )
    enable_compilation_cache()
    from music_style_transfer_ldm_tpu.config import default_config
    from music_style_transfer_ldm_tpu.models.ldm import (
        LDM, content_style_transfer,
    )
    from music_style_transfer_ldm_tpu.audio import melspectrogram
    from music_style_transfer_ldm_tpu.audio.mel import power_to_db
    from music_style_transfer_ldm_tpu.audio.quantize import db_to_unit_image
    from music_style_transfer_ldm_tpu.audio.griffinlim import mel_to_audio
    from music_style_transfer_ldm_tpu.audio.mel import db_to_power
    from music_style_transfer_ldm_tpu.audio.quantize import unit_image_to_db

    log(f"devices: {jax.devices()}")
    cfg = default_config()
    model = LDM(latent_dim=cfg.model.latent_dim,
                num_timesteps=cfg.diffusion.num_timesteps,
                dtype=jnp.bfloat16)

    S = cfg.model.image_size
    content = jnp.asarray(np.random.RandomState(0).rand(1, S, S, 1),
                          jnp.float32)
    style = jnp.asarray(np.random.RandomState(1).rand(1, S, S, 1),
                        jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        content, style, jnp.zeros((1,), jnp.int32))

    steps = 50

    def transfer(content, style):
        decoded, _, _ = content_style_transfer(
            model, variables, jax.random.PRNGKey(2), content, style,
            num_timesteps=steps, eta=0.0)
        return decoded

    transfer_jit = jax.jit(transfer)
    total_s, _ = timed(transfer_jit, content, style)
    # The scan takes steps-1 UNet evaluations (ref loop semantics).
    step_ms = total_s / (steps - 1) * 1000.0
    log(f"50-step transfer: {total_s*1000:.1f} ms total, "
        f"{step_ms:.2f} ms/step")

    # ---- secondary: DPM-Solver++(2M) on a half-coarse grid ---------------
    def transfer_dpm(content, style):
        decoded, _, _ = content_style_transfer(
            model, variables, jax.random.PRNGKey(2), content, style,
            num_timesteps=steps, eta=0.0, sampler="dpm++",
            steps=steps // 2)
        return decoded

    dpm_s, _ = timed(jax.jit(transfer_dpm), content, style)
    log(f"dpm++ {steps // 2}-step transfer (equal-accuracy coarse grid): "
        f"{dpm_s*1000:.1f} ms total ({total_s / dpm_s:.2f}x vs 50-step "
        f"ddim)")

    # ---- secondary: 10 s clip end-to-end (4 x 3 s chunks as one batch) ----
    sr = cfg.audio.sample_rate
    clip = np.random.RandomState(2).randn(4, 3 * sr).astype(np.float32) * 0.1
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

    # ---- secondary: batched serving throughput + MFU ---------------------
    peak = _peak_flops_per_sec(jax.devices()[0])
    content64 = jnp.tile(content, (64, 1, 1, 1))
    style64 = jnp.tile(style, (64, 1, 1, 1))
    thr_s, _ = timed(transfer_jit, content64, style64, repeats=2, warmup=5)
    transfer_flops = _flops(transfer_jit, content64, style64)
    transfer_mfu = _mfu(transfer_flops, thr_s, peak)
    log(f"batch-64 transfer throughput: {64 / thr_s:.0f} clips/s "
        f"({thr_s * 1000:.1f} ms/batch), "
        f"{(transfer_flops or 0) / 1e9:.1f} GFLOP"
        + (f", MFU {transfer_mfu:.1%}" if transfer_mfu is not None else ""))

    # ---- secondary: batch-128 LDM train step (reference recipe) + MFU ----
    from music_style_transfer_ldm_tpu.training import LDMTrainer
    trainer = LDMTrainer(cfg)  # full recipe: lpips compression + vggish style
    state = trainer.init_state(0)
    fparams = trainer._feature_params()
    c128 = jnp.tile(content, (128, 1, 1, 1))
    s128 = jnp.tile(style, (128, 1, 1, 1))
    key = jax.random.PRNGKey(9)
    train_flops = _flops(trainer._train_step, state, c128, s128, key, fparams)
    # donate_argnums=(0,) invalidates the old state: thread it through.
    state, m = trainer._train_step(state, c128, s128, key, fparams)
    _sync(m["total_loss"])  # compile
    for _ in range(25):  # relay warm-up
        state, m = trainer._train_step(state, c128, s128, key, fparams)
    _sync(m["total_loss"])
    train_s = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        state, m = trainer._train_step(state, c128, s128, key, fparams)
        _sync(m["total_loss"])
        train_s = min(train_s, time.perf_counter() - t0)
    train_mfu = _mfu(train_flops, train_s, peak)
    log(f"batch-128 train step: {train_s * 1000:.1f} ms, "
        f"{(train_flops or 0) / 1e9:.1f} GFLOP"
        + (f", MFU {train_mfu:.1%}" if train_mfu is not None else "")
        + f" ({128 / train_s:.0f} samples/s)")

    baseline_ms = 50.0  # BASELINE.md north-star: < 50 ms/DDIM step
    print(json.dumps({
        "metric": "ddim_step_ms",
        "value": round(step_ms, 3),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / step_ms, 2),
        "chip": str(getattr(jax.devices()[0], "device_kind", "unknown")),
        "chip_peak_tflops": (round(peak / 1e12) if peak else None),
        "transfer_dpm_halfgrid_ms": round(dpm_s * 1000, 2),
        "transfer_b64_ms": round(thr_s * 1000, 2),
        "transfer_b64_gflop": (round(transfer_flops / 1e9, 2)
                               if transfer_flops else None),
        "mfu_transfer_b64": (round(transfer_mfu, 4)
                             if transfer_mfu is not None else None),
        "train_b128_step_ms": round(train_s * 1000, 2),
        "train_b128_gflop": (round(train_flops / 1e9, 2)
                             if train_flops else None),
        "mfu_train_b128": (round(train_mfu, 4)
                           if train_mfu is not None else None),
    }))


if __name__ == "__main__":
    main()
