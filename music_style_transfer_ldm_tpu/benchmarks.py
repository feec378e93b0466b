"""Headline benchmark (library form). Prints ONE JSON line to stdout.

Primary metric: DDIM denoise step DEVICE time on the flagship LDM (bf16,
batch 1, 49-step style-conditioned transfer as one fused Pallas
trajectory kernel), measured on whatever accelerator jax selects (the
real TPU chip under the driver). Baseline: the driver's north-star target
of 50 ms/step (BASELINE.md; the reference publishes no numbers of its own
— vs_baseline > 1 means faster than the target).

Methodology note (round 2): this chip is reached through the axon relay,
whose synchronous round trip is ~27 ms — more than the device time of an
entire 49-step trajectory. Single-call sync timing (round 1's 0.576
ms/step) therefore measures the RELAY, not the chip. Device time is now
measured by chaining N full trajectories inside one jitted program
(each trajectory consumes the previous one's output, so nothing can be
elided) and amortizing: (t_chain - t_sync_floor) / N. The sync floor and
the single-call client latency are still reported alongside.

Secondary numbers (stderr): the lax.scan sampler's device step time, full
10 s clip end-to-end transfer (mel -> VAE encode -> 50-step DDIM ->
decode -> NNLS + Griffin-Lim audio, target < 5 s), DPM++ half-grid
latency, batch-64 throughput + MFU, batch-128 train step + MFU.
"""

from __future__ import annotations

import json
import os
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
    n_steps = steps - 1
    on_cpu = jax.default_backend() == "cpu"
    # Wall budget for the secondary sections: on a cold compile cache every
    # graph goes through the remote-compile tunnel (minutes each); once the
    # budget is spent, remaining secondary metrics are skipped so the run
    # always finishes and prints its headline JSON.
    t_bench_start = time.time()
    budget_s = float(os.environ.get("MSTLDM_BENCH_BUDGET_S", "1500"))

    def over_budget(section: str) -> bool:
        spent = time.time() - t_bench_start
        if spent > budget_s:
            log(f"skipping {section}: {spent:.0f}s elapsed > "
                f"{budget_s:.0f}s budget (cold-cache protection)")
            return True
        return False
    # Chain lengths: long enough that device compute dominates the ~2 ms
    # relay RTT jitter (the floor subtraction is min-of-noisy-samples, so
    # short chains can apparently exceed peak FLOP/s).
    n_chain = 2 if on_cpu else 128

    def transfer(content, style):
        decoded, _, _ = content_style_transfer(
            model, variables, jax.random.PRNGKey(2), content, style,
            num_timesteps=steps, eta=0.0)
        return decoded

    transfer_jit = jax.jit(transfer)
    total_s, _ = timed(transfer_jit, content, style)
    log(f"50-step transfer, single-call client latency (includes one relay "
        f"round trip): {total_s*1000:.1f} ms")

    # ---- relay sync floor: a no-op readback ------------------------------
    floor_s, _ = timed(jax.jit(lambda a: a.sum()), content, repeats=10,
                       warmup=25)
    log(f"sync floor (jit(sum) + readback): {floor_s*1000:.2f} ms")

    # ---- headline: device-amortized step time, chained trajectories ------
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

    @jax.jit
    def chain_scan(z):
        fn = _denoise_fn(model, variables, emb)
        return jax.lax.fori_loop(
            0, n_chain,
            lambda i, z: ddim_sample(fn, sched, z, jnp.asarray(times),
                                     eta=0.0)[0], z)

    # Every section after the client-latency measurement is guarded: a
    # relay hiccup or compile failure in one metric must not cost the
    # driver its headline JSON line.
    scan_step_ms = None
    try:
        scan_s, _ = timed(chain_scan, z0, warmup=25)
        scan_step_ms = (max(scan_s - floor_s, 1e-9) / n_chain / n_steps
                        * 1000.0)
        log(f"lax.scan sampler x{n_chain} chained: {scan_s*1000:.1f} ms -> "
            f"{scan_step_ms:.4f} ms/step device time")
    except Exception as e:  # noqa: BLE001
        log(f"scan chain failed: {e!r}")
    step_ms, step_source = None, "fused pallas trajectory kernel (ops/pallas)"
    try:
        fused_s, _ = timed(chain_fused, z0, warmup=25)
        step_ms = max(fused_s - floor_s, 1e-9) / n_chain / n_steps * 1000.0
        log(f"fused Pallas trajectory kernel x{n_chain} chained: "
            f"{fused_s*1000:.1f} ms -> {step_ms:.4f} ms/step device time"
            + (f" (speedup {scan_step_ms/step_ms:.2f}x over scan)"
               if scan_step_ms else ""))
    except Exception as e:  # noqa: BLE001
        log(f"fused chain failed: {e!r}")
    if step_ms is None and scan_step_ms is not None:
        step_ms, step_source = scan_step_ms, "lax.scan sampler (fallback)"
    if step_ms is None:  # last resort: relay-bound single call
        step_ms = total_s / n_steps * 1000.0
        step_source = "single-call client latency / steps (relay-bound)"

    # Fastest full transfer: fused kernel on the dpm++ half grid (equal
    # ODE accuracy at ~half the denoiser evaluations).
    fused_dpm_traj_ms = None
    try:
        if over_budget("fused dpm++ chain"):
            raise TimeoutError("budget")
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
    except Exception as e:  # noqa: BLE001
        log(f"fused dpm++ chain failed: {e!r}")

    # ---- secondary: DPM-Solver++(2M) on a half-coarse grid ---------------
    def transfer_dpm(content, style):
        decoded, _, _ = content_style_transfer(
            model, variables, jax.random.PRNGKey(2), content, style,
            num_timesteps=steps, eta=0.0, sampler="dpm++",
            steps=steps // 2)
        return decoded

    dpm_s = None
    try:
        if over_budget("dpm++ section"):
            raise TimeoutError("budget")
        dpm_s, _ = timed(jax.jit(transfer_dpm), content, style)
        log(f"dpm++ {steps // 2}-step transfer (equal-accuracy coarse "
            f"grid): {dpm_s*1000:.1f} ms total ({total_s / dpm_s:.2f}x vs "
            f"50-step ddim)")
    except Exception as e:  # noqa: BLE001
        log(f"dpm++ section failed: {e!r}")

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

    try:
        if over_budget("end-to-end section"):
            raise TimeoutError("budget")
        e2e_jit = jax.jit(end_to_end)
        e2e_s, audio = timed(e2e_jit, jnp.asarray(clip), style4, repeats=3)
        log(f"10s clip end-to-end (mel->encode->50-step DDIM->decode->GL): "
            f"{e2e_s:.3f} s (target < 5 s); audio {audio.shape}")
    except Exception as e:  # noqa: BLE001
        log(f"end-to-end section failed: {e!r}")

    # ---- secondary: batched serving throughput + MFU ---------------------
    peak = _peak_flops_per_sec(jax.devices()[0])
    content64 = jnp.tile(content, (64, 1, 1, 1))
    style64 = jnp.tile(style, (64, 1, 1, 1))
    n_b64 = 1 if on_cpu else 16

    @jax.jit
    def chain_b64(c):
        # Each iteration's decoded [0,1] output is the next content, and the
        # style batch is rotated per iteration — without that, XLA hoists
        # the loop-invariant style-encoder forward out of the chain and the
        # amortized time flatters the real per-batch cost.
        def body(i, c):
            return transfer(c, jnp.roll(style64, i, axis=0))
        return jax.lax.fori_loop(0, n_b64, body, c)

    thr_s = transfer_flops = transfer_mfu = None
    try:
        if over_budget("batch-64 section"):
            raise TimeoutError("budget")
        b64_s, _ = timed(chain_b64, content64, repeats=3, warmup=25)
        thr_s = max(b64_s - floor_s, 1e-9) / n_b64
        transfer_flops = _flops(transfer_jit, content64, style64)
        transfer_mfu = _mfu(transfer_flops, thr_s, peak)
        log(f"batch-64 transfer throughput (x{n_b64} chained, device "
            f"time): {64 / thr_s:.0f} clips/s ({thr_s * 1000:.1f} "
            f"ms/batch), {(transfer_flops or 0) / 1e9:.1f} GFLOP"
            + (f", MFU {transfer_mfu:.1%}" if transfer_mfu is not None
               else ""))
    except Exception as e:  # noqa: BLE001
        log(f"batch-64 section failed: {e!r}")

    # ---- secondary: batch-128 LDM train step (reference recipe) + MFU ----
    from music_style_transfer_ldm_tpu.training import LDMTrainer
    # Full recipe: lpips compression + vggish style.  The flagship run uses
    # the TRAINABLE style term (style_loss_stop_gradient=False — the mode
    # that actually converges, docs/results/fullscale/): with gradients
    # flowing through it the style branch stays live in the chained loop
    # below even though the per-step metrics are discarded.  (With the
    # reference's no_grad quirk the style forward is metric-only, XLA
    # dead-code-eliminates it when metrics are dropped, and the measured
    # "step" silently loses ~2/3 of its FLOPs.)
    import dataclasses as _dc
    train_s = train_flops = train_mfu = None
    try:
        if over_budget("train-step section"):
            raise TimeoutError("budget")
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
    except Exception as e:  # noqa: BLE001
        log(f"train-step section failed: {e!r}")

    baseline_ms = 50.0  # BASELINE.md north-star: < 50 ms/DDIM step
    print(json.dumps({
        "metric": "ddim_step_ms",
        "value": round(step_ms, 4),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / step_ms, 2),
        "methodology": ("device time, N chained trajectories in one "
                        "dispatch minus sync floor; round-1 value (0.576) "
                        "was bound by the ~27 ms relay round trip"),
        "sampler": step_source,
        "scan_step_ms": (round(scan_step_ms, 4)
                         if scan_step_ms is not None else None),
        "client_latency_50step_ms": round(total_s * 1000, 2),
        "sync_floor_ms": round(floor_s * 1000, 2),
        "chip": str(getattr(jax.devices()[0], "device_kind", "unknown")),
        "chip_peak_tflops": (round(peak / 1e12) if peak else None),
        "transfer_dpm_halfgrid_ms": (round(dpm_s * 1000, 2)
                                     if dpm_s is not None else None),
        "fused_dpm_halfgrid_transfer_ms": (
            round(fused_dpm_traj_ms, 3)
            if fused_dpm_traj_ms is not None else None),
        "transfer_b64_ms": (round(thr_s * 1000, 2)
                            if thr_s is not None else None),
        "transfer_b64_gflop": (round(transfer_flops / 1e9, 2)
                               if transfer_flops else None),
        "mfu_transfer_b64": (round(transfer_mfu, 4)
                             if transfer_mfu is not None else None),
        "train_b128_step_ms": (round(train_s * 1000, 2)
                               if train_s is not None else None),
        "train_b128_gflop": (round(train_flops / 1e9, 2)
                             if train_flops else None),
        "mfu_train_b128": (round(train_mfu, 4)
                           if train_mfu is not None else None),
    }))


if __name__ == "__main__":
    main()
