"""Roofline analysis of the batch-64 transfer path (VERDICT r04 #3).

The bench's `transfer_b64` secondary measured 5.78 ms / 71.4 GFLOP =
6.3 % MFU — an order of magnitude below the train step's 41.8 %.  This
tool decomposes the batch-64, 50-step SDEdit transfer into its stages,
times each on-device with the bench's chained-dependent-calls
methodology, pulls FLOPs + bytes-accessed from XLA's cost analysis, and
places every stage on the chip's roofline: measured FLOP/s vs
min(peak, intensity x HBM bandwidth).  A stage sitting at its bandwidth
bound has no MFU headroom to take — the wall is HBM, not scheduling.

Also measures the candidate improvements the verdict named: bf16 inputs
end-to-end and the fused Pallas trajectory kernel at batch 64.

    python tools/roofline_b64.py [--out docs/results/roofline_b64.json]

Writes one JSON with per-stage numbers; the prose interpretation lives in
docs/PERFORMANCE.md ("Batch-64 transfer roofline").
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=str(REPO / "docs" / "results"
                                        / "roofline_b64.json"))
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--chain", type=int, default=0,
                   help="dependent-call chain length (0 = auto)")
    p.add_argument("--skip-fused", action="store_true",
                   help="skip the fused-kernel stage (CPU interpret mode "
                        "is impractically slow at large batch)")
    args = p.parse_args()

    from music_style_transfer_ldm_tpu.utils.cache import (
        enable_compilation_cache,
    )
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from music_style_transfer_ldm_tpu.benchmarks import _flops, _sync, timed
    from music_style_transfer_ldm_tpu.config import default_config
    from music_style_transfer_ldm_tpu.diffusion.ddim import (
        ddim_sample, transfer_time_grid,
    )
    from music_style_transfer_ldm_tpu.models.ldm import (
        LDM, _denoise_fn, content_style_transfer,
    )
    from music_style_transfer_ldm_tpu.utils.chips import (
        hbm_bytes_per_sec, peak_flops_per_sec,
    )

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "cpu")
    peak = peak_flops_per_sec(kind)
    bw = hbm_bytes_per_sec(kind)
    on_cpu = jax.default_backend() == "cpu"
    print(f"device: {kind} peak={peak and peak/1e12} TF/s "
          f"bw={bw and bw/1e9} GB/s", flush=True)

    cfg = default_config()
    model = LDM(latent_dim=cfg.model.latent_dim,
                num_timesteps=cfg.diffusion.num_timesteps,
                dtype=jnp.bfloat16)
    B, S = args.batch, cfg.model.image_size
    rng = np.random.RandomState(0)
    content = jnp.asarray(rng.rand(B, S, S, 1), jnp.float32)
    style = jnp.asarray(rng.rand(B, S, S, 1), jnp.float32)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0),
         "diffusion": jax.random.PRNGKey(1)},
        content[:1], style[:1], jnp.zeros((1,), jnp.int32))
    _sync(variables)

    n_chain = args.chain or (2 if on_cpu else 32)
    steps = args.steps
    times_grid = transfer_time_grid(steps)

    floor_s, _ = timed(jax.jit(lambda a: a.sum()), content, repeats=10,
                       warmup=25)
    print(f"sync floor {floor_s*1000:.2f} ms", flush=True)

    def bytes_accessed(jitted, *a) -> float | None:
        try:
            lowered = jitted.lower(*a)
            try:
                ca = lowered.compile().cost_analysis()
            except Exception:  # noqa: BLE001
                ca = lowered.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else {}
            v = float(ca.get("bytes accessed", 0.0))
            return v if v > 0 else None
        except Exception:  # noqa: BLE001
            return None

    record: dict = {
        "batch": B, "steps": steps, "chip": str(kind),
        "peak_tflops": peak and round(peak / 1e12, 1),
        "hbm_gb_s": bw and round(bw / 1e9), "chain": n_chain,
        "sync_floor_ms": round(floor_s * 1000, 2),
        "methodology": ("per-stage device time = chained dependent calls "
                        "in one jit minus sync floor, / chain; flops + "
                        "bytes from XLA cost_analysis; roofline bound = "
                        "min(peak, intensity * HBM bw)"),
        "stages": {},
    }

    def stage(name: str, chained_fn, single_fn, single_args,
              chain: int | None = None) -> None:
        """Measure a stage: chained_fn(x, n) must run the op n times as a
        dependent chain; single_fn/single_args feed cost_analysis for ONE
        call.  `chain` overrides the stage's chain length — the small
        stages (~0.1 ms device) need ~1000 chained calls so the measured
        delta dominates the ~2 ms relay sync jitter; the big stages only
        need tens."""
        n = n_chain if chain is None else (2 if on_cpu else chain)
        jitted_single = jax.jit(single_fn)
        fl = _flops(jitted_single, *single_args)
        by = bytes_accessed(jitted_single, *single_args)
        t_chain, _ = timed(jax.jit(lambda x: chained_fn(x, n)),
                           *single_args[:1], repeats=4, warmup=25)
        t = max(t_chain - floor_s, 1e-9) / n
        intensity = (fl / by) if (fl and by) else None
        achieved = (fl / t) if fl else None
        bound = None
        if intensity is not None and peak and bw:
            bound = min(peak, intensity * bw)
        entry = {
            "ms": round(t * 1000, 4),
            "gflop": fl and round(fl / 1e9, 3),
            "gb_accessed": by and round(by / 1e9, 4),
            "intensity_flop_per_byte": intensity and round(intensity, 2),
            "achieved_tflops": achieved and round(achieved / 1e12, 3),
            "mfu": (achieved and peak) and round(achieved / peak, 4),
            "roofline_bound_tflops": bound and round(bound / 1e12, 3),
            "pct_of_roofline": (achieved and bound) and round(
                achieved / bound, 3),
            "bound_by": (None if intensity is None or not peak or not bw
                         else ("hbm" if intensity * bw < peak else "mxu")),
        }
        record["stages"][name] = entry
        print(f"{name}: {entry}", flush=True)

    # ---- stage: style encoder ------------------------------------------
    def style_embed_once(s):
        return model.apply(variables, s, method=LDM.style_embed)

    def style_embed_chain(s, n):
        def body(i, s):
            emb = style_embed_once(s)
            # Real dependency: fold a tiny slice of the output back into
            # the next input (prevents hoisting/DCE without meaningfully
            # changing the work).
            return s + jnp.mean(emb["s6"]).astype(s.dtype) * 1e-12
        return jax.lax.fori_loop(0, n, body, s)

    stage("style_encoder", style_embed_chain, style_embed_once, (style,),
          chain=768)

    # ---- stage: VAE encode ----------------------------------------------
    def encode_once(c):
        return model.apply(variables, c, method=LDM.encode)

    def encode_chain(c, n):
        def body(i, c):
            z = encode_once(c)
            return c + jnp.mean(z).astype(c.dtype) * 1e-12
        return jax.lax.fori_loop(0, n, body, c)

    stage("vae_encode", encode_chain, encode_once, (content,), chain=768)

    # ---- stage: the 49-step DDIM scan (denoiser walk only) ---------------
    emb = style_embed_once(style)
    z0 = jnp.asarray(rng.rand(B, S // 8, S // 8, cfg.model.latent_dim),
                     jnp.float32)
    fn = _denoise_fn(model, variables, emb)
    sched = model.schedule

    def scan_once(z):
        return ddim_sample(fn, sched, z, jnp.asarray(times_grid), eta=0.0)[0]

    def scan_chain(z, n):
        return jax.lax.fori_loop(0, n, lambda i, z: scan_once(z), z)

    stage("ddim_scan_49", scan_chain, scan_once, (z0,))

    # ---- stage: VAE decode ------------------------------------------------
    def decode_once(z):
        return model.apply(variables, z, method=LDM.decode)

    def decode_chain(z, n):
        def body(i, z):
            img = decode_once(z)
            return z + jnp.mean(img).astype(z.dtype) * 1e-12
        return jax.lax.fori_loop(0, n, body, z)

    stage("vae_decode", decode_chain, decode_once, (z0,), chain=768)

    # ---- whole path (the bench's transfer_b64) ---------------------------
    def transfer_once(c):
        decoded, _, _ = content_style_transfer(
            model, variables, jax.random.PRNGKey(2), c, style,
            num_timesteps=steps, eta=0.0)
        return decoded

    def transfer_chain(c, n):
        def body(i, c):
            return transfer_once(c)
        return jax.lax.fori_loop(0, n, body, c)

    stage("full_transfer", transfer_chain, transfer_once, (content,))

    # ---- candidate: bf16 inputs end-to-end --------------------------------
    content16 = content.astype(jnp.bfloat16)

    def transfer_bf16_once(c):
        decoded, _, _ = content_style_transfer(
            model, variables, jax.random.PRNGKey(2),
            c.astype(jnp.float32), style, num_timesteps=steps, eta=0.0)
        return decoded.astype(jnp.bfloat16)

    def transfer_bf16_chain(c, n):
        return jax.lax.fori_loop(
            0, n, lambda i, c: transfer_bf16_once(c), c)

    stage("full_transfer_bf16_io", transfer_bf16_chain, transfer_bf16_once,
          (content16,))

    # ---- candidate: fused Pallas trajectory kernel at b64 -----------------
    try:
        if args.skip_fused:
            raise RuntimeError("skipped (--skip-fused)")
        from music_style_transfer_ldm_tpu.ops.pallas.fused_sampler import (
            fused_ddim_sample, pack_operands,
        )

        def fused_once(z):
            ops, names = pack_operands(variables["params"]["unet"], emb,
                                       sched, times_grid, 0.0,
                                       dtype=jnp.bfloat16, batch=B)
            return fused_ddim_sample(ops, names, z, steps - 1,
                                     dtype=jnp.bfloat16, interpret=on_cpu)

        def fused_chain(z, n):
            return jax.lax.fori_loop(0, n,
                                     lambda i, z: fused_once(z), z)

        stage("fused_kernel_b64", fused_chain, fused_once, (z0,), chain=8)
    except Exception as e:  # noqa: BLE001
        print(f"fused b64 stage failed: {e!r}", flush=True)
        record["stages"]["fused_kernel_b64"] = {"error": repr(e)}

    stages = record["stages"]
    known = [k for k in ("style_encoder", "vae_encode", "ddim_scan_49",
                         "vae_decode") if stages.get(k, {}).get("ms")]
    record["stage_sum_ms"] = round(sum(stages[k]["ms"] for k in known), 4)
    record["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                          time.gmtime())
    record["backend"] = jax.default_backend()

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(record, indent=1) + "\n")
    print(f"wrote {out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
