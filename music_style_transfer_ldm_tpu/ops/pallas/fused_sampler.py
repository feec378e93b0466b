"""The entire DDIM sampling trajectory as ONE Pallas TPU kernel.

The scan sampler (diffusion/ddim.py) already compiles the 49-step transfer
into a single device program, but each scan iteration still executes ~150
small XLA ops (convs on 2x2..16x16 maps, relayouts between them); at
batch 1 the step is latency-bound at ~0.57 ms (docs/PERFORMANCE.md) —
~1 us of MXU math paying ~570 us of small-kernel overhead.

This kernel removes that overhead structurally: the whole trajectory is a
single ``pallas_call`` with ``grid=(steps-1,)`` (TPU grid iterations run
sequentially, so the latent carry lives in a VMEM scratch across steps),
and every UNet layer is expressed as MXU matmuls over VMEM-resident
operands.  The batch (1..FUSED_MAX_BATCH latents, each with its own
style) is stacked on the SUBLANE dimension — x is [B*256, C] — so every
matmul stays 2-D (Mosaic has no 3-D dot_general) and gets B x the rows:

* every conv runs as a full-resolution stride-1 roll-tap conv on the
  stacked rows (9 matmuls: ``out = sum_t roll(x, t) masked @ W[t]``); the
  per-element edge masks are periodic in the 256-row element block, so
  taps never read across batch elements;
* stride-2 layers then row-DOWNSAMPLE (a k3 s2 p1 conv is the k3 s1 p1
  conv sampled at even pixels) and transpose layers zero-UPSAMPLE first
  (a k3 s2 transpose conv with the torch p=1/op=1 crop is the zero-
  upsample + k3 s1 p1 conv with the UNFLIPPED kernel): kron(I_B, S)
  block-diagonal 0/1 matrices at the small maps, a shared S applied per
  8-aligned element row slice at the 16x16 maps (where the block-diagonal
  would cost ~2 MB of VMEM);
* cross-attention supports a different style per element: K/V are
  precomputed OUTSIDE the kernel and concatenated along the key dim, and
  the logits are block-masked so element b's queries only see element b's
  keys — one matmul per head for the whole batch;
* the timestep-embedding MLP is precomputed per grid step and streamed in
  as a constant table;
* the DDIM update collapses to ``x <- A*x + B*eps_hat + C*prev_x0`` with
  per-step scalars folded from the schedule tables at pack time (DDIM has
  C=0; DPM-Solver++(2M) uses the multistep history through C; ref update
  rule: models/model.py:446-458).

Weights total ~12.3 MB bf16 (K/V and time-MLP folded out) + ~0.7 MB of
f32 resampling matrices + stacked activations: everything stays resident
in VMEM for all 49 steps — the only HBM traffic after warm-up is the
initial latents in and the final latents out.  At B=8 that sum (~17.3 MB)
slightly exceeds the default 16 MB scoped-VMEM carve-out, so the call
raises vmem_limit_bytes for batch > 1.

Measured on the v5e (round 3): 0.44 ms per 49-step batch-1 trajectory
(1.23x over the round-2 selection-matrix formulation it replaced, 2.3x
over the scan sampler), crossing over with the scan sampler near B=8
(serving uses the kernel for buckets <= 4).  Reference parity: same grid,
same update rule, eta-capable (ref: models/model.py:409-465,503-559).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from music_style_transfer_ldm_tpu.diffusion.ddim import (
    generation_time_grid, transfer_time_grid,
)
from music_style_transfer_ldm_tpu.diffusion.schedule import DiffusionSchedule

# UNet geometry (ref: models/model.py:163-231; models/unet.py).  The latent
# grid is 16x16; channel widths follow num_filters=64.
_H = 16
_LAT = 32
_NF = 64

# (name, kind, H_in, Cin, Cout, relu) in execution order.  kind: 's1' =
# 3x3 stride-1 pad-1 conv, 's2' = 3x3 stride-2 pad-1 conv, 'T' = 3x3
# stride-2 transpose conv with torch p=1/op=1 crop (models/layers.py).
_LAYERS = (
    ("enc1", "s1", 16, _LAT, _NF, True),
    ("enc2", "s2", 16, _NF, _NF * 2, True),        # + time embedding
    ("enc3", "s2", 8, _NF * 2, _NF * 4, True),
    ("enc4", "s2", 4, _NF * 4, _NF * 8, True),
    ("bottleneck", "s1", 2, _NF * 8, _NF * 8, True),
    ("dec4", "T", 2, _NF * 8, _NF * 4, True),
    ("dec3", "T", 4, _NF * 4, _NF * 2, True),
    ("dec2", "T", 8, _NF * 2, _NF, True),
    ("dec1", "s1", 16, _NF, _LAT, False),
)
_N_HEADS = 4


# --------------------------------------------------------------------------
# Pack-time helpers (host-side numpy; cached by geometry)
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _sel_down(H: int) -> np.ndarray:
    """[(H/2)^2, H^2] row-sampling matrix: stride-2 conv output (y, x) is
    the full-resolution stride-1 conv output at (2y, 2x) (both read input
    rows 2y+ky-1), so a k3 s2 p1 conv = k3 s1 p1 conv + this gather."""
    Ho = H // 2
    out = np.zeros((Ho * Ho, H * H), np.float32)
    for y in range(Ho):
        for x in range(Ho):
            out[y * Ho + x, (2 * y) * H + 2 * x] = 1.0
    return out


@functools.lru_cache(maxsize=None)
def _sel_up(H: int) -> np.ndarray:
    """[(2H)^2, H^2] zero-upsampling matrix: places input (y, x) at output
    (2y, 2x).  A k3 s2 transpose conv with torch p=1/op=1 crop = this
    scatter + k3 s1 p1 conv with the UNFLIPPED kernel (the flip cancels
    under the tap substitution a -> 2-a; see pack_operands)."""
    Ho = 2 * H
    out = np.zeros((Ho * Ho, H * H), np.float32)
    for y in range(H):
        for x in range(H):
            out[(2 * y) * Ho + 2 * x, y * H + x] = 1.0
    return out


@functools.lru_cache(maxsize=None)
def _blockdiag(kind: str, H: int, B: int) -> np.ndarray:
    """kron(I_B, S): per-element resampling over the stacked-row layout."""
    S = _sel_down(H) if kind == "down" else _sel_up(H)
    return np.kron(np.eye(B, dtype=np.float32), S)


def _tap_weights(kernel: jax.Array) -> jax.Array:
    """(3,3,Cin,Cout) conv kernel -> [9, Cin, Cout], tap-major.  Transpose
    convs use the SAME unflipped layout: the zero-upsample formulation
    absorbs the spatial flip (see pack_operands)."""
    return kernel.reshape(9, kernel.shape[2], kernel.shape[3])


def _sinusoidal(times: jax.Array, dim: int = 128) -> jax.Array:
    """Matches models.layers.SinusoidalPositionEmbeddings."""
    half = dim // 2
    scale = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -scale)
    args = times.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def _check_geometry(unet_params: Dict[str, Any]) -> None:
    # The kernel's selection matrices and layer plan are built for the
    # flagship geometry (16x16x32 latent, num_filters=64); reject other
    # widths with a clear message instead of an opaque matmul shape error.
    enc1_kernel = unet_params["enc1"]["kernel"]
    if tuple(enc1_kernel.shape) != (3, 3, _LAT, _NF):
        raise ValueError(
            "fused sampler supports the flagship UNet geometry "
            f"(latent_dim={_LAT}, num_filters={_NF}); got enc1 kernel "
            f"{tuple(enc1_kernel.shape)} — use the scan samplers "
            "(models/ldm.py) for other widths")


def _step_tables(unet_params: Dict[str, Any], schedule: DiffusionSchedule,
                 times: np.ndarray, eta: float, sampler: str, dtype
                 ) -> Tuple[jax.Array, jax.Array]:
    """Per-step tables: (temb [S-1, 1, 128], coefs [S-1, 5])."""
    t_grid = jnp.asarray(times[:-1], jnp.int32)
    temb = _sinusoidal(t_grid).astype(dtype)
    p = unet_params
    temb = temb @ jnp.asarray(p["time_fc1"]["kernel"], dtype)
    temb = temb + jnp.asarray(p["time_fc1"]["bias"], dtype)
    temb = jax.nn.gelu(temb)  # approximate=True, as flax nn.gelu
    temb = temb @ jnp.asarray(p["time_fc2"]["kernel"], dtype)
    temb = temb + jnp.asarray(p["time_fc2"]["bias"], dtype)

    # Per-step update scalars.  Both samplers collapse to
    #   x      <- A*x + B*eps_hat + C*prev_x0
    #   prev_x0 <- P*x + Q*eps_hat            (computed from the OLD x)
    # DDIM (ref update model.py:446-458) has C = 0; DPM-Solver++(2M)
    # (diffusion/dpm.py) uses the multistep x0 history through C.
    ab = schedule.alpha_bars.astype(jnp.float32)
    ab_t = ab[jnp.asarray(times[:-1])]
    ab_n = ab[jnp.asarray(times[1:])]
    sq_t, sq_n = jnp.sqrt(ab_t), jnp.sqrt(ab_n)
    s1m_t, s1m_n = jnp.sqrt(1.0 - ab_t), jnp.sqrt(1.0 - ab_n)
    P = 1.0 / sq_t
    Q = -s1m_t / sq_t
    if sampler == "ddim":
        A = sq_n / sq_t
        B = -sq_n * s1m_t / sq_t + (1.0 + eta) * s1m_n - eta * s1m_t
        C = jnp.zeros_like(A)
    elif sampler == "dpm++":
        if eta:
            raise ValueError("dpm++ is deterministic; eta must be 0")
        t_host = np.asarray(times)
        if len(np.unique(t_host)) != len(t_host):
            raise ValueError("duplicate timesteps in the grid: zero "
                             "log-SNR step h (use steps <= num_timesteps)")
        lam = jnp.log(sq_t / s1m_t)
        lam_n = jnp.log(sq_n / s1m_n)
        h = lam_n - lam
        prev_lam = jnp.concatenate([lam[:1], lam[:-1]])  # lam_{i-1}
        r = jnp.where(jnp.arange(len(h)) > 0, (lam - prev_lam) / h, 1.0)
        E = -sq_n * jnp.expm1(-h)
        first = jnp.arange(len(h)) == 0
        c2 = jnp.where(first, E, E * (1.0 + 1.0 / (2.0 * r)))
        C = jnp.where(first, 0.0, -E / (2.0 * r))
        A = s1m_n / s1m_t + c2 * P
        B = c2 * Q
    else:
        raise ValueError(f"unknown sampler {sampler!r}")
    # temb is [S-1, 1, 128]: 3D so the kernel can index the step row
    # dynamically (leading dims of >2D VMEM arrays have no
    # sublane-alignment rule).
    return temb[:, None, :], jnp.stack([A, B, C, P, Q], axis=1)


# Largest batch the stacked-row batched kernel is packed for.  VMEM bound:
# weights (~12.3 MB bf16 with K/V precomputed) + f32 resampling matrices
# (~0.7 MB at B=8) + activations/carries (~0.3 MB per batch element) must
# stay under the ~16 MB/core budget.
FUSED_MAX_BATCH = 8

def pack_operands(unet_params: Dict[str, Any],
                  style_embedding: Dict[str, jax.Array],
                  schedule: DiffusionSchedule, times: np.ndarray,
                  eta: float, dtype=jnp.bfloat16,
                  sampler: str = "ddim",
                  batch: int = 1) -> Tuple[list, list]:
    """Build the kernel operand list (everything except the latents).

    Traceable (pure jnp on the params / style embedding), so the whole
    pack + kernel call can live under one jit.  Returns (operands, names);
    names index the list inside the kernel.  B latents run in one kernel,
    batch stacked on the sublane dimension (x is [B*256, C]) — the
    round-3 design that cleared the Mosaic 3-D dot_general blocker
    (docs/ROADMAP.md r02 #4) without any 3-D matmul:

    * every conv runs as a full-resolution stride-1 roll-tap conv on the
      stacked rows — the per-element edge masks are periodic in the
      element row block, so taps never read across batch elements and
      every matmul is a plain 2-D [B*M, Cin] @ [Cin, Cout] with B x the
      MXU rows;
    * stride-2 layers then row-downsample (stride-2 conv == stride-1 conv
      sampled at even pixels) and transpose layers zero-upsample first
      (k3 s2 transpose == zero-upsample + stride-1 conv with the flipped
      kernel): per-element kron(I_B, S) block-diagonal matrices at the
      small maps, and a shared S applied per 8-aligned element row slice
      at the 16x16 maps (where the block-diagonal would cost ~2 MB VMEM);
    * cross-attention supports a DIFFERENT style per element: K/V are
      concatenated along the key dimension ([hd, B*Tk]) and the logits
      are block-masked so element b's queries only see element b's keys —
      one matmul per head instead of B.
    """
    if batch > FUSED_MAX_BATCH:
        raise ValueError(f"batched fused sampler packs at most "
                         f"B={FUSED_MAX_BATCH} (VMEM); got {batch}")
    _check_geometry(unet_params)
    B = batch

    ops: list = []
    names: list = []

    def add(name, arr, dt=dtype):
        ops.append(jnp.asarray(arr, dt))
        names.append(name)

    p = unet_params
    temb, coefs = _step_tables(unet_params, schedule, times, eta, sampler,
                               dtype)
    add("temb", temb)
    add("coefs", coefs, jnp.float32)

    # Conv layers: tap weights + biases.  Transpose kernels stay
    # UNFLIPPED in the zero-upsample + stride-1 conv formulation:
    # out(y) = sum_a k[a] x[(y+a-1)/2] equals the transpose conv's
    # sum_a k_flip[a] x[(y+1-a)/2] under the substitution a -> 2-a.
    for name, _, _, _, _, _ in _LAYERS:
        add(f"{name}_w", _tap_weights(jnp.asarray(p[name]["kernel"])))
        add(f"{name}_b", jnp.asarray(p[name]["bias"])[None, :])

    # Resampling matrices (f32: the gathers run on the f32 accumulators).
    add("enc2_down", _sel_down(16), jnp.float32)          # shared, per-b
    add("enc3_down", _blockdiag("down", 8, B), jnp.float32)
    add("enc4_down", _blockdiag("down", 4, B), jnp.float32)
    add("dec4_up", _blockdiag("up", 2, B), jnp.float32)
    add("dec3_up", _blockdiag("up", 4, B), jnp.float32)
    add("dec2_up", _sel_up(8), jnp.float32)               # shared, per-b

    # Cross-attention: per-element K/V concatenated on the key dim.
    for attn, skey in (("cross_attention2", "s5"), ("cross_attention1",
                                                    "s6")):
        ap = p[attn]
        ch = ap["q_proj"]["kernel"].shape[0]
        hd = ch // _N_HEADS
        s = jnp.asarray(style_embedding[skey], dtype)
        if s.shape[0] == 1 and B > 1:   # one style shared by the batch
            s = jnp.tile(s, (B,) + (1,) * (s.ndim - 1))
        if s.shape[0] != B:
            raise ValueError(f"style embedding batch {s.shape[0]} != "
                             f"kernel batch {B}")
        Tk = s.shape[1] * s.shape[2]
        s = s.reshape(B * Tk, ch)
        k = s @ jnp.asarray(ap["k_proj"]["kernel"], dtype) + jnp.asarray(
            ap["k_proj"]["bias"], dtype)
        v = s @ jnp.asarray(ap["v_proj"]["kernel"], dtype) + jnp.asarray(
            ap["v_proj"]["bias"], dtype)
        # [h, hd, B*Tk] / [h, B*Tk, hd]: b-major key dim for block masking.
        kT = k.reshape(B * Tk, _N_HEADS, hd).transpose(1, 2, 0)
        vh = v.reshape(B * Tk, _N_HEADS, hd).transpose(1, 0, 2)
        wq = jnp.asarray(ap["q_proj"]["kernel"], dtype)
        wq = wq.reshape(ch, _N_HEADS, hd).transpose(1, 0, 2)
        bq = jnp.asarray(ap["q_proj"]["bias"], dtype).reshape(_N_HEADS, 1, hd)
        wo = jnp.asarray(ap["out_proj"]["kernel"], dtype)
        wo = wo.reshape(_N_HEADS, hd, ch)
        add(f"{attn}_kT", kT)
        add(f"{attn}_v", vh)
        add(f"{attn}_wq", wq)
        add(f"{attn}_bq", bq)
        add(f"{attn}_wo", wo)
        add(f"{attn}_bo", jnp.asarray(ap["out_proj"]["bias"], dtype)[None, :])
    return ops, names


# --------------------------------------------------------------------------
# Kernel body (stacked-row layout; shared verbatim by the pure-jnp
# reference executor)
# --------------------------------------------------------------------------


def _roll_conv(x, w, H: int, roll):
    """Raw tap-sum of a 3x3 stride-1 pad-1 conv on B stacked H x H maps.

    x: [B*H*H, Cin] (element b occupies rows [b*H*H, (b+1)*H*H)); returns
    the f32 accumulator WITHOUT bias/relu (callers resample first when the
    layer is strided).  The edge masks are periodic in the element row
    block, so rolled taps never leak across batch elements: a row whose
    neighbor would live in another element is exactly a row at the image
    boundary, which the mask zeroes.
    """
    per = H * H
    n = x.shape[0]
    r = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) % per
    col = r % H
    acc = None
    for ky in (-1, 0, 1):
        for kx in (-1, 0, 1):
            t = (ky + 1) * 3 + (kx + 1)
            off = ky * H + kx
            shifted = roll(x, -off) if off else x
            ok = jnp.ones((n, 1), jnp.bool_)
            if ky < 0:
                ok = ok & (r >= H)
            if ky > 0:
                ok = ok & (r < per - H)
            if kx < 0:
                ok = ok & (col >= 1)
            if kx > 0:
                ok = ok & (col <= H - 2)
            tap = jnp.where(ok, shifted, jnp.zeros_like(shifted))
            y = jnp.dot(tap, w[t], preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
    return acc


def _resample_perb(x, S, B: int, rows: int):
    """Apply a shared per-element resampling matrix S to each element's
    row block (element offsets b*rows are 8-aligned at the 16x16 maps,
    where a kron(I_B, S) block-diagonal would cost ~2 MB of VMEM)."""
    outs = [jnp.dot(S, x[b * rows:(b + 1) * rows],
                    preferred_element_type=jnp.float32) for b in range(B)]
    return outs[0] if B == 1 else jnp.concatenate(outs, axis=0)


def _attention_blockmasked(x, kT, v, wq, bq, wo, bo, B: int, M: int, dtype):
    """Cross-attention with a per-element style: K/V concatenated on the
    key dim and logits block-masked so element b's M query rows only see
    element b's Tk keys — one matmul per head for the whole batch."""
    hd = wq.shape[2]
    tk_total = kT.shape[2]
    tk = tk_total // B
    n = x.shape[0]
    row_el = jax.lax.broadcasted_iota(jnp.int32, (n, tk_total), 0) // M
    col_el = jax.lax.broadcasted_iota(jnp.int32, (n, tk_total), 1) // tk
    block = row_el == col_el
    scale = 1.0 / math.sqrt(hd)
    out = None
    for h in range(_N_HEADS):
        q = jnp.dot(x, wq[h], preferred_element_type=jnp.float32)
        q = (q + bq[h].astype(jnp.float32)).astype(dtype)
        logits = jnp.dot(q, kT[h],
                         preferred_element_type=jnp.float32) * scale
        logits = jnp.where(block, logits.astype(jnp.float32), -1e30)
        p = jax.nn.softmax(logits, axis=-1)
        att = jnp.dot(p.astype(dtype), v[h],
                      preferred_element_type=jnp.float32).astype(dtype)
        y = jnp.dot(att, wo[h], preferred_element_type=jnp.float32)
        out = y if out is None else out + y
    return out + bo[0].astype(jnp.float32)


def _unet_step_batched(x, op, temb_row, dtype, roll, B: int):
    """One UNet forward on B stacked flattened latents x [B*256, 32].

    Same math as models/unet.py (additive skips to the
    pre-attention activations, time embedding at enc2, relu before the
    skip adds), restructured so every matmul is 2-D with B x the rows:
    full-resolution roll convs + per-element row resampling.
    """
    g = lambda n: op(n).astype(dtype)
    f32 = lambda a: a.astype(jnp.float32)
    cast = lambda a: a.astype(dtype)

    def finish(acc, bias, relu=True):
        acc = acc + op(bias)[0].astype(jnp.float32)
        return jnp.maximum(acc, 0.0) if relu else acc

    z1 = cast(finish(_roll_conv(x, g("enc1_w"), 16, roll), "enc1_b"))
    e2 = _roll_conv(z1, g("enc2_w"), 16, roll)            # full-res f32
    z2 = finish(_resample_perb(e2, op("enc2_down"), B, 256), "enc2_b")
    z2 = cast(z2 + temb_row.astype(jnp.float32))
    e3 = _roll_conv(z2, g("enc3_w"), 8, roll)
    z3 = cast(finish(jnp.dot(op("enc3_down"), e3,
                             preferred_element_type=jnp.float32), "enc3_b"))
    z3a = cast(_attention_blockmasked(
        z3, g("cross_attention2_kT"), g("cross_attention2_v"),
        g("cross_attention2_wq"), g("cross_attention2_bq"),
        g("cross_attention2_wo"), g("cross_attention2_bo"), B, 16, dtype))
    e4 = _roll_conv(z3a, g("enc4_w"), 4, roll)
    z4 = cast(finish(jnp.dot(op("enc4_down"), e4,
                             preferred_element_type=jnp.float32), "enc4_b"))
    z4a = cast(_attention_blockmasked(
        z4, g("cross_attention1_kT"), g("cross_attention1_v"),
        g("cross_attention1_wq"), g("cross_attention1_bq"),
        g("cross_attention1_wo"), g("cross_attention1_bo"), B, 4, dtype))
    zb = cast(finish(_roll_conv(z4a, g("bottleneck_w"), 2, roll),
                     "bottleneck_b"))
    # Decoder: zero-upsample (exact 0/1 scatter) -> stride-1 roll conv
    # with the unflipped kernel == k3 s2 transpose conv + torch crop.
    d4 = cast(jnp.dot(op("dec4_up"), f32(zb),
                      preferred_element_type=jnp.float32))
    u3 = cast(finish(_roll_conv(d4, g("dec4_w"), 4, roll), "dec4_b")
              + f32(z3))
    d3 = cast(jnp.dot(op("dec3_up"), f32(u3),
                      preferred_element_type=jnp.float32))
    u2 = cast(finish(_roll_conv(d3, g("dec3_w"), 8, roll), "dec3_b")
              + f32(z2))
    d2 = cast(_resample_perb(f32(u2), op("dec2_up"), B, 64))
    u1 = cast(finish(_roll_conv(d2, g("dec2_w"), 16, roll), "dec2_b")
              + f32(z1))
    return finish(_roll_conv(u1, g("dec1_w"), 16, roll), "dec1_b",
                  relu=False)


def _make_kernel(names, dtype, batch: int = 1):
    idx = {n: i for i, n in enumerate(names)}

    def kernel(*refs):
        # refs: *operands, x0, out, x_scr, prev_scr
        x0_ref, out_ref, x_scr, prev_scr = (refs[-4], refs[-3], refs[-2],
                                            refs[-1])
        op_refs = refs[:-4]

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            x_scr[:] = x0_ref[:]
            prev_scr[:] = jnp.zeros_like(prev_scr)

        def op(name):
            return op_refs[idx[name]][...]

        def roll(a, shift):
            # jnp.roll semantics via a static two-slice concat: Mosaic's
            # tpu.dynamic_rotate is unimplemented for bf16, and the shifts
            # here are all static anyway.
            m = (-shift) % a.shape[0]
            if m == 0:
                return a
            return jnp.concatenate([a[m:], a[:m]], axis=0)

        # Per-step rows are sliced out of the full resident tables (a
        # (1, 128) streamed block would violate the sublane tiling rule;
        # temb is [S-1, 1, 128] so the step index is a free leading dim).
        temb_row = op_refs[idx["temb"]][i]
        coefs_ref = op_refs[idx["coefs"]]

        x = x_scr[:]
        eps = _unet_step_batched(x.astype(dtype), op, temb_row, dtype,
                                 roll, batch)
        x_new = (coefs_ref[i, 0] * x + coefs_ref[i, 1] * eps
                 + coefs_ref[i, 2] * prev_scr[:])
        prev_scr[:] = coefs_ref[i, 3] * x + coefs_ref[i, 4] * eps
        x_scr[:] = x_new
        out_ref[:] = x_new

    return kernel


def fused_ddim_sample(operands: list, names: list, z_t: jax.Array,
                      n_steps: int, dtype=jnp.bfloat16,
                      interpret: bool | None = None) -> jax.Array:
    """Run the fused trajectory.

    z_t: [B, 16, 16, C] (pack_operands must have been called with the
    same batch) or [256, C].  The batch is stacked on the row dim: x0 is
    [B*256, C].
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    shape = z_t.shape
    batch = shape[0] if len(shape) == 4 else 1
    x0 = z_t.reshape(batch * _H * _H, -1).astype(jnp.float32)

    in_specs = []
    for n, a in zip(names, operands):
        space = pltpu.SMEM if n == "coefs" else pltpu.VMEM
        in_specs.append(pl.BlockSpec(
            a.shape, lambda i, _r=a.ndim: (0,) * _r, memory_space=space))
    in_specs.append(pl.BlockSpec(x0.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        _make_kernel(names, dtype, batch),
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(x0.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x0.shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM(x0.shape, jnp.float32),   # x carry
                        pltpu.VMEM(x0.shape, jnp.float32)],  # prev_x0 (2M)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # The batched layout needs ~17.3 MB at B=8 (weights + block
            # masks + stacked activations), just over the default 16 MB
            # scoped-vmem carve-out; raise the cap for it (v5e has the
            # physical headroom).  Batch-1 stays under the default.
            vmem_limit_bytes=(64 * 1024 * 1024 if batch > 1 else None)),
        interpret=interpret,
    )(*operands, x0)
    return out.reshape(shape)


def reference_ddim_sample(operands: list, names: list, z_t: jax.Array,
                          n_steps: int, dtype=jnp.float32) -> jax.Array:
    """Pure-jnp executor of the SAME packed math (no Pallas) — the
    numerical reference for the kernel and a debugging aid."""
    idx = {n: i for i, n in enumerate(names)}
    shape = z_t.shape
    batch = shape[0] if len(shape) == 4 else 1
    x = z_t.reshape(batch * _H * _H, -1).astype(jnp.float32)
    temb, coefs = operands[idx["temb"]], operands[idx["coefs"]]
    op = lambda n: operands[idx[n]]
    roll = lambda a, s: jnp.roll(a, s, axis=0)
    prev = jnp.zeros_like(x)
    for i in range(n_steps):
        eps = _unet_step_batched(x.astype(dtype), op, temb[i], dtype,
                                 roll, batch)
        x, prev = (coefs[i, 0] * x + coefs[i, 1] * eps + coefs[i, 2] * prev,
                   coefs[i, 3] * x + coefs[i, 4] * eps)
    return x.reshape(shape)


# --------------------------------------------------------------------------
# High-level wrapper: full SDEdit transfer with the fused trajectory
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("model", "num_timesteps",
                                             "eta", "interpret", "sampler",
                                             "steps"))
def _fused_transfer_impl(model, variables, key, content_spec, style_spec,
                         num_timesteps, eta, interpret, sampler="ddim",
                         steps=None):
    from music_style_transfer_ldm_tpu.models.ldm import LDM
    sched = model.schedule
    z_0 = model.apply(variables, content_spec.astype(jnp.float32),
                      method=LDM.encode).astype(jnp.float32)
    t = jnp.full((content_spec.shape[0],), num_timesteps - 1, jnp.int32)
    if key.ndim > 1:
        # Per-item keys [B, 2]: same noise stream as the scan path
        # (models/ldm.py _transfer_impl), so a request's partial noising is
        # reproducible in its own seed across samplers.
        eps = jax.vmap(
            lambda k, z: jax.random.normal(k, z.shape, jnp.float32))(key, z_0)
        z_t = sched.q_sample_with_noise(z_0, t, eps)
    else:
        z_t, _ = sched.q_sample(key, z_0, t)
    emb = model.apply(variables, style_spec.astype(jnp.float32),
                      method=LDM.style_embed)
    times = transfer_time_grid(num_timesteps, steps)
    ops, names = pack_operands(variables["params"]["unet"], emb, sched,
                               times, eta, dtype=model.dtype,
                               sampler=sampler,
                               batch=content_spec.shape[0])
    sampled = fused_ddim_sample(ops, names, z_t, len(times) - 1,
                                dtype=model.dtype, interpret=interpret)
    decoded = model.apply(variables, sampled, method=LDM.decode)
    return (decoded.astype(jnp.float32) + 1.0) / 2.0


@functools.partial(jax.jit, static_argnames=("model", "z_shape", "timesteps",
                                              "eta", "interpret", "sampler"))
def _fused_generate_impl(model, variables, key, z_shape, style_spec,
                         timesteps, eta, interpret, sampler="ddim"):
    from music_style_transfer_ldm_tpu.models.ldm import LDM
    sched = model.schedule
    z_t = jax.random.normal(key, z_shape, jnp.float32)
    emb = model.apply(variables, style_spec.astype(jnp.float32),
                      method=LDM.style_embed)
    times = generation_time_grid(model.num_timesteps, timesteps)
    ops, names = pack_operands(variables["params"]["unet"], emb, sched,
                               times, eta, dtype=model.dtype,
                               sampler=sampler, batch=z_shape[0])
    sampled = fused_ddim_sample(ops, names, z_t, len(times) - 1,
                                dtype=model.dtype, interpret=interpret)
    decoded = model.apply(variables, sampled, method=LDM.decode)
    return (decoded.astype(jnp.float32) + 1.0) / 2.0


def fused_style_sample(model, variables, key: jax.Array,
                       z_shape: Tuple[int, ...], style_spec: jax.Array,
                       timesteps: int = 100, eta: float = 0.0,
                       interpret: bool | None = None,
                       sampler: str = "ddim") -> jax.Array:
    """Style-conditioned generation from pure noise with the fused
    trajectory kernel — same grid and update as models.ldm
    style_ddim_sample (ref: model.py:382-465).  sampler='dpm++' runs the
    DPM-Solver++(2M) update on the same grid.  Batches up to
    FUSED_MAX_BATCH run the stacked-row batched kernel (one style per
    element or one shared style)."""
    if z_shape[0] > FUSED_MAX_BATCH:
        raise ValueError(f"fused sampler packs at most B={FUSED_MAX_BATCH}"
                         f" (VMEM); got batch {z_shape[0]} — use the scan "
                         "samplers (models/ldm.py) for larger batches")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _fused_generate_impl(model, variables, key, tuple(z_shape),
                                style_spec.astype(jnp.float32),
                                int(timesteps), float(eta), bool(interpret),
                                sampler)


def fused_content_style_transfer(model, variables, key: jax.Array,
                                 content_spec: jax.Array,
                                 style_spec: jax.Array,
                                 num_timesteps: int = 50, eta: float = 0.0,
                                 interpret: bool | None = None,
                                 sampler: str = "ddim",
                                 steps: int | None = None) -> jax.Array:
    """SDEdit transfer with the whole trajectory as one Pallas
    kernel.  Same trajectory as models.ldm.content_style_transfer;
    sampler='dpm++' with steps < num_timesteps walks the coarse
    DPM-Solver++(2M) grid (~2x fewer denoiser evaluations).  Returns
    decoded images in [0, 1].  Batches up to FUSED_MAX_BATCH run the
    stacked-row batched kernel (per-element styles supported)."""
    if content_spec.shape[0] > FUSED_MAX_BATCH:
        raise ValueError(f"fused sampler packs at most B={FUSED_MAX_BATCH}"
                         f" (VMEM); got batch {content_spec.shape[0]} — "
                         "use the scan samplers (models/ldm.py) for larger "
                         "batches")
    if num_timesteps > model.num_timesteps:
        # Same guard as the scan path (models/ldm.py): without it the
        # alpha_bar gather would silently clamp to T-1 under jit.
        raise ValueError(
            f"num_timesteps={num_timesteps} exceeds the schedule length "
            f"T={model.num_timesteps}")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _fused_transfer_impl(model, variables, key,
                                content_spec.astype(jnp.float32),
                                style_spec.astype(jnp.float32),
                                int(num_timesteps), float(eta),
                                bool(interpret), sampler,
                                None if steps is None else int(steps))
