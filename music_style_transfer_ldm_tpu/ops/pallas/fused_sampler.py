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
operands:

* all 9 conv/transpose-conv layers become tap-wise selection-matrix
  im2col matmuls: ``out = sum_t (S[t] @ x) @ W[t]`` where ``S[t]`` is a
  static 0/1 gather matrix encoding stride/padding/crop geometry and
  ``W[t]`` the (Cin, Cout) slice of the kernel for tap t (transpose-conv
  kernels are spatially flipped once at pack time);
* the two 16x16 stride-1 convs (enc1/dec1) skip the selection matmul and
  build their taps with sublane rolls + boundary masks instead (saves
  ~2.4 MB of VMEM);
* the style cross-attention K/V projections and the timestep-embedding
  MLP do not depend on the latent, so they are precomputed OUTSIDE the
  kernel (per style / per grid respectively) and streamed in as constants;
* the DDIM update collapses to ``x <- A*x + B*eps_hat`` with per-step
  scalars A, B folded from the schedule tables at pack time
  (ref update rule: models/model.py:446-458).

Weights total ~11 MB bf16 + ~0.7 MB of selection matrices + activations:
everything stays resident in VMEM (~16 MB/core) for all 49 steps — the
only HBM traffic after warm-up is the initial latent in and the final
latent out.

Scope: batch-1 latency path (the product's interactive transfer); batched
throughput keeps the scan sampler.  Reference parity: same grid, same
update rule, eta-capable (ref: models/model.py:409-465,503-559).
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
def _sel_conv(H: int, stride: int) -> np.ndarray:
    """[9, M_out, M_in] 0/1 gather matrices for a 3x3 pad-1 conv."""
    Ho = H // stride
    out = np.zeros((9, Ho * Ho, H * H), np.float32)
    for ky in range(3):
        for kx in range(3):
            t = ky * 3 + kx
            for y in range(Ho):
                iy = stride * y + ky - 1
                if not 0 <= iy < H:
                    continue
                for x in range(Ho):
                    ix = stride * x + kx - 1
                    if 0 <= ix < H:
                        out[t, y * Ho + x, iy * H + ix] = 1.0
    return out


@functools.lru_cache(maxsize=None)
def _sel_convT(H: int) -> np.ndarray:
    """[9, M_out, M_in] gather matrices for the k3 s2 VALID transpose conv
    cropped to torch p=1/op=1 geometry (models/layers.py:47-65): cropped
    out(y,x) = sum over taps (a,b) of in((y+1-a)/2, (x+1-b)/2) when the
    division is exact.  Pairs with the spatially FLIPPED kernel."""
    Ho = 2 * H
    out = np.zeros((9, Ho * Ho, H * H), np.float32)
    for a in range(3):
        for b in range(3):
            t = a * 3 + b
            for y in range(Ho):
                py = y + 1 - a
                if py % 2 or not 0 <= py // 2 < H:
                    continue
                for x in range(Ho):
                    px = x + 1 - b
                    if px % 2 == 0 and 0 <= px // 2 < H:
                        out[t, y * Ho + x, (py // 2) * H + px // 2] = 1.0
    return out


def _tap_weights(kernel: jax.Array, flip: bool) -> jax.Array:
    """(3,3,Cin,Cout) conv kernel -> [9, Cin, Cout], tap-major; transpose
    convs need the spatial flip (flax conv_transpose correlates the
    un-flipped kernel with the dilated input)."""
    if flip:
        kernel = kernel[::-1, ::-1]
    return kernel.reshape(9, kernel.shape[2], kernel.shape[3])


def _sinusoidal(times: jax.Array, dim: int = 128) -> jax.Array:
    """Matches models.layers.SinusoidalPositionEmbeddings."""
    half = dim // 2
    scale = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -scale)
    args = times.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def pack_operands(unet_params: Dict[str, Any],
                  style_embedding: Dict[str, jax.Array],
                  schedule: DiffusionSchedule, times: np.ndarray,
                  eta: float, dtype=jnp.bfloat16,
                  sampler: str = "ddim") -> Tuple[list, list]:
    """Build the kernel operand list (everything except the latent).

    Traceable (pure jnp on the params / style embedding), so the whole
    pack + kernel call can live under one jit.  Returns (operands, names);
    names index the list inside the kernel via _op_index.
    """
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

    ops: list = []
    names: list = []

    def add(name, arr, dt=dtype):
        ops.append(jnp.asarray(arr, dt))
        names.append(name)

    # Per-step tables ------------------------------------------------------
    t_grid = jnp.asarray(times[:-1], jnp.int32)
    temb = _sinusoidal(t_grid).astype(dtype)
    p = unet_params
    temb = temb @ jnp.asarray(p["time_fc1"]["kernel"], dtype)
    temb = temb + jnp.asarray(p["time_fc1"]["bias"], dtype)
    temb = jax.nn.gelu(temb)  # approximate=True, as flax nn.gelu
    temb = temb @ jnp.asarray(p["time_fc2"]["kernel"], dtype)
    temb = temb + jnp.asarray(p["time_fc2"]["bias"], dtype)
    # [S-1, 1, 128]: 3D so the kernel can index the step row dynamically
    # (leading dims of >2D VMEM arrays have no sublane-alignment rule).
    add("temb", temb[:, None, :])

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
    add("coefs", jnp.stack([A, B, C, P, Q], axis=1),
        jnp.float32)                                      # [S-1, 5] SMEM

    # Conv layers ----------------------------------------------------------
    for name, kind, H, _, _, _ in _LAYERS:
        kern = jnp.asarray(p[name]["kernel"])
        add(f"{name}_w", _tap_weights(kern, flip=(kind == "T")))
        add(f"{name}_b", jnp.asarray(p[name]["bias"])[None, :])
        if kind == "T":
            add(f"{name}_sel", _sel_convT(H))
        elif not (kind == "s1" and H == 16):   # 16x16 stride-1 uses rolls
            add(f"{name}_sel", _sel_conv(H, 1 if kind == "s1" else 2))

    # Cross-attention (K/V precomputed from the style embedding) ------------
    for attn, skey in (("cross_attention2", "s5"), ("cross_attention1",
                                                    "s6")):
        ap = p[attn]
        ch = ap["q_proj"]["kernel"].shape[0]  # channel count (not coef C)
        hd = ch // _N_HEADS
        s = jnp.asarray(style_embedding[skey], dtype)
        s = s.reshape(-1, ch)                                  # [Tk, ch]
        k = s @ jnp.asarray(ap["k_proj"]["kernel"], dtype) + jnp.asarray(
            ap["k_proj"]["bias"], dtype)
        v = s @ jnp.asarray(ap["v_proj"]["kernel"], dtype) + jnp.asarray(
            ap["v_proj"]["bias"], dtype)
        Tk = k.shape[0]
        # Head-sliced layouts avoid lane-dim slicing inside the kernel:
        # leading dims of >2D VMEM arrays index freely.
        kT = k.reshape(Tk, _N_HEADS, hd).transpose(1, 2, 0)    # [h, hd, Tk]
        vh = v.reshape(Tk, _N_HEADS, hd).transpose(1, 0, 2)    # [h, Tk, hd]
        wq = jnp.asarray(ap["q_proj"]["kernel"], dtype)
        wq = wq.reshape(ch, _N_HEADS, hd).transpose(1, 0, 2)   # [h, ch, hd]
        bq = jnp.asarray(ap["q_proj"]["bias"], dtype)
        bq = bq.reshape(_N_HEADS, 1, hd)
        wo = jnp.asarray(ap["out_proj"]["kernel"], dtype)
        wo = wo.reshape(_N_HEADS, hd, ch)                      # [h, hd, ch]
        add(f"{attn}_kT", kT)
        add(f"{attn}_v", vh)
        add(f"{attn}_wq", wq)
        add(f"{attn}_bq", bq)
        add(f"{attn}_wo", wo)
        add(f"{attn}_bo", jnp.asarray(ap["out_proj"]["bias"], dtype)[None, :])
    return ops, names


# --------------------------------------------------------------------------
# Kernel body (shared verbatim by the pure-jnp reference executor)
# --------------------------------------------------------------------------


def _conv_sel(x, sel, w, b, relu: bool):
    """sum_t (sel[t] @ x) @ w[t]: selection-matrix im2col conv."""
    acc = None
    for t in range(9):
        # f32 accumulator (Mosaic requires 32-bit matmul acc); the gather
        # is exact either way — each output row is a single product.
        tap = jnp.dot(sel[t], x,
                      preferred_element_type=jnp.float32).astype(x.dtype)
        y = jnp.dot(tap, w[t], preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    acc = acc + b[0].astype(jnp.float32)
    return jnp.maximum(acc, 0.0) if relu else acc


def _conv_roll16(x, w, b, relu: bool, roll):
    """3x3 stride-1 pad-1 conv on the 16x16 grid via sublane rolls.

    Row r of the [256, C] map is pixel (r//16, r%16); tap (ky,kx) reads
    row r + 16*ky + kx, masked where the neighbor crosses the image edge.
    """
    r = jax.lax.broadcasted_iota(jnp.int32, (256, 1), 0)
    col = r % 16
    acc = None
    for ky in (-1, 0, 1):
        for kx in (-1, 0, 1):
            t = (ky + 1) * 3 + (kx + 1)
            off = ky * 16 + kx
            shifted = roll(x, -off) if off else x
            ok = jnp.ones((256, 1), jnp.bool_)
            if ky < 0:
                ok = ok & (r >= 16)
            if ky > 0:
                ok = ok & (r < 240)
            if kx < 0:
                ok = ok & (col >= 1)
            if kx > 0:
                ok = ok & (col <= 14)
            tap = jnp.where(ok, shifted, jnp.zeros_like(shifted))
            y = jnp.dot(tap, w[t], preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
    acc = acc + b[0].astype(jnp.float32)
    return jnp.maximum(acc, 0.0) if relu else acc


def _attention(x, kT, v, wq, bq, wo, bo, dtype):
    """Per-head cross-attention; Q from x, K/V precomputed (packed)."""
    hd = wq.shape[2]
    scale = 1.0 / math.sqrt(hd)
    out = None
    for h in range(_N_HEADS):
        q = jnp.dot(x, wq[h], preferred_element_type=jnp.float32)
        q = (q + bq[h].astype(jnp.float32)).astype(dtype)
        logits = jnp.dot(q, kT[h],
                         preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        att = jnp.dot(p.astype(dtype), v[h],
                      preferred_element_type=jnp.float32).astype(dtype)
        y = jnp.dot(att, wo[h], preferred_element_type=jnp.float32)
        out = y if out is None else out + y
    return out + bo[0].astype(jnp.float32)


def _unet_step(x, op, temb_row, dtype, roll):
    """One UNet forward on the flattened latent x [256, 32].

    op: name -> array accessor (kernel refs or plain arrays); temb_row
    [1, 128].  Mirrors models/unet.py exactly: additive skips to the
    pre-attention activations, time embedding at enc2.
    """
    g = lambda n: op(n).astype(dtype)
    cast = lambda a: a.astype(dtype)

    z1 = cast(_conv_roll16(x, g("enc1_w"), g("enc1_b"), True, roll))
    z2 = _conv_sel(z1, g("enc2_sel"), g("enc2_w"), g("enc2_b"), True)
    z2 = cast(z2 + temb_row.astype(jnp.float32))
    z3 = cast(_conv_sel(z2, g("enc3_sel"), g("enc3_w"), g("enc3_b"), True))
    z3a = cast(_attention(z3, g("cross_attention2_kT"),
                          g("cross_attention2_v"), g("cross_attention2_wq"),
                          g("cross_attention2_bq"), g("cross_attention2_wo"),
                          g("cross_attention2_bo"), dtype))
    z4 = cast(_conv_sel(z3a, g("enc4_sel"), g("enc4_w"), g("enc4_b"), True))
    z4a = cast(_attention(z4, g("cross_attention1_kT"),
                          g("cross_attention1_v"), g("cross_attention1_wq"),
                          g("cross_attention1_bq"), g("cross_attention1_wo"),
                          g("cross_attention1_bo"), dtype))
    zb = cast(_conv_sel(z4a, g("bottleneck_sel"), g("bottleneck_w"),
                        g("bottleneck_b"), True))
    u3 = cast(_conv_sel(zb, g("dec4_sel"), g("dec4_w"), g("dec4_b"), True)
              + z3.astype(jnp.float32))
    u2 = cast(_conv_sel(u3, g("dec3_sel"), g("dec3_w"), g("dec3_b"), True)
              + z2.astype(jnp.float32))
    u1 = cast(_conv_sel(u2, g("dec2_sel"), g("dec2_w"), g("dec2_b"), True)
              + z1.astype(jnp.float32))
    return _conv_roll16(u1, g("dec1_w"), g("dec1_b"), False, roll)


def _make_kernel(names, dtype):
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
        eps = _unet_step(x.astype(dtype), op, temb_row, dtype, roll)
        x_new = (coefs_ref[i, 0] * x + coefs_ref[i, 1] * eps
                 + coefs_ref[i, 2] * prev_scr[:])
        prev_scr[:] = coefs_ref[i, 3] * x + coefs_ref[i, 4] * eps
        x_scr[:] = x_new
        out_ref[:] = x_new

    return kernel


def fused_ddim_sample(operands: list, names: list, z_t: jax.Array,
                      n_steps: int, dtype=jnp.bfloat16,
                      interpret: bool | None = None) -> jax.Array:
    """Run the fused trajectory.  z_t: [1, 16, 16, C] or [256, C]."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    shape = z_t.shape
    x0 = z_t.reshape(_H * _H, -1).astype(jnp.float32)

    in_specs = []
    for n, a in zip(names, operands):
        space = pltpu.SMEM if n == "coefs" else pltpu.VMEM
        in_specs.append(pl.BlockSpec(
            a.shape, lambda i, _r=a.ndim: (0,) * _r, memory_space=space))
    in_specs.append(pl.BlockSpec(x0.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        _make_kernel(names, dtype),
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(x0.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x0.shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM(x0.shape, jnp.float32),   # x carry
                        pltpu.VMEM(x0.shape, jnp.float32)],  # prev_x0 (2M)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*operands, x0)
    return out.reshape(shape)


def reference_ddim_sample(operands: list, names: list, z_t: jax.Array,
                          n_steps: int, dtype=jnp.float32) -> jax.Array:
    """Pure-jnp executor of the SAME packed math (no Pallas) — the
    numerical reference for the kernel and a debugging aid."""
    idx = {n: i for i, n in enumerate(names)}
    shape = z_t.shape
    x = z_t.reshape(_H * _H, -1).astype(jnp.float32)
    temb, coefs = operands[idx["temb"]], operands[idx["coefs"]]
    op = lambda n: operands[idx[n]]
    roll = lambda a, s: jnp.roll(a, s, axis=0)
    prev = jnp.zeros_like(x)
    for i in range(n_steps):
        eps = _unet_step(x.astype(dtype), op, temb[i], dtype, roll)
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
                               sampler=sampler)
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
                               sampler=sampler)
    sampled = fused_ddim_sample(ops, names, z_t, len(times) - 1,
                                dtype=model.dtype, interpret=interpret)
    decoded = model.apply(variables, sampled, method=LDM.decode)
    return (decoded.astype(jnp.float32) + 1.0) / 2.0


def fused_style_sample(model, variables, key: jax.Array,
                       z_shape: Tuple[int, ...], style_spec: jax.Array,
                       timesteps: int = 100, eta: float = 0.0,
                       interpret: bool | None = None,
                       sampler: str = "ddim") -> jax.Array:
    """Batch-1 style-conditioned generation from pure noise with the fused
    trajectory kernel — same grid and update as models.ldm
    style_ddim_sample (ref: model.py:382-465).  sampler='dpm++' runs the
    DPM-Solver++(2M) update on the same grid."""
    if z_shape[0] != 1:
        raise ValueError("fused sampler is the batch-1 latency path; "
                         f"got batch {z_shape[0]}")
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
    """Batch-1 SDEdit transfer with the whole trajectory as one Pallas
    kernel.  Same trajectory as models.ldm.content_style_transfer;
    sampler='dpm++' with steps < num_timesteps walks the coarse
    DPM-Solver++(2M) grid (~2x fewer denoiser evaluations).  Returns
    decoded images in [0, 1]."""
    if content_spec.shape[0] != 1:
        raise ValueError("fused sampler is the batch-1 latency path; "
                         f"got batch {content_spec.shape[0]}")
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
