"""Pallas TPU kernels for the std-normalized feature MSE layer.

The VGGish style loss spends more time in its normalization/MSE machinery
than in its convolutions' matmuls (r03 decomposition,
docs/PERFORMANCE.md): the machinery has ~zero FLOPs but streams the
feature maps from HBM several times — XLA's fusion computes the std
reduction, the normalized difference, and (in training) the backward as
separate passes over maps as large as 128x128x64 per sample.

These kernels restructure the layer around HBM reads: one program per
batch element holds its (p, t) feature block in VMEM and performs every
reduction and elementwise pass there, so

* the forward reads p and t from HBM exactly ONCE (stats + normalized
  squared difference + the per-sample mean in a single residency), and
* the backward reads them exactly once more and writes one gradient.

The backward is split into separate dp/dt kernels so XLA dead-code
eliminates the dt kernel entirely in the common training case (the
target side is data; no gradient consumer) — inside one fused kernel
that elimination would be impossible.

MEASURED OUTCOME (r03, v5e, batch 128): the XLA implementation wins —
full trunk fwd+grad 18.5 ms (XLA) vs 28.5 ms (these kernels).  XLA
fuses the normalization math into the surrounding conv pipeline (the
feature maps are consumed as produced), while opaque pallas_calls force
the maps to materialize in HBM on both sides of every kernel.  Kept as
a numerically-exact, parity-tested alternate (losses/vggish.py
vggish_feature_distance(impl='pallas')) and as the documented negative
result behind the 'auto'='xla' default — the same judgement call as
ops/pallas/fused_mel_image.py.

Numerics match losses/vggish.py normalized_mse (the closed-form VJP):
statistics in f32, eps = 1e-8 added to the std.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-8


def _fwd_kernel(p_ref, t_ref, m_ref, stats_ref):
    p = p_ref[0].astype(jnp.float32)
    t = t_ref[0].astype(jnp.float32)
    mu_p = jnp.mean(p)
    s_p = jnp.sqrt(jnp.mean((p - mu_p) ** 2))
    mu_t = jnp.mean(t)
    s_t = jnp.sqrt(jnp.mean((t - mu_t) ** 2))
    d = p / (s_p + _EPS) - t / (s_t + _EPS)
    # scalar outputs are [B, 1, 1] / [B, 1, 4] in SMEM: leading dim is
    # the grid; VMEM cannot take scalar stores
    m_ref[0, 0, 0] = jnp.mean(d * d)
    stats_ref[0, 0, 0] = mu_p
    stats_ref[0, 0, 1] = s_p
    stats_ref[0, 0, 2] = mu_t
    stats_ref[0, 0, 3] = s_t


def _bwd_kernel(p_ref, t_ref, stats_ref, uscale_ref, out_ref, *,
                wrt_target: bool):
    p = p_ref[0].astype(jnp.float32)
    t = t_ref[0].astype(jnp.float32)
    mu_p, s_p = stats_ref[0, 0, 0], stats_ref[0, 0, 1]
    mu_t, s_t = stats_ref[0, 0, 2], stats_ref[0, 0, 3]
    n = float(np.prod(p.shape))
    u = (2.0 / n) * uscale_ref[0, 0, 0] * (p / (s_p + _EPS)
                                        - t / (s_t + _EPS))
    if wrt_target:
        b = jnp.sum(u * t)
        out = -u / (s_t + _EPS) + b * (t - mu_t) / (
            (s_t + _EPS) ** 2 * n * s_t)
    else:
        a = jnp.sum(u * p)
        out = u / (s_p + _EPS) - a * (p - mu_p) / (
            (s_p + _EPS) ** 2 * n * s_p)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fwd_call(p3, t3, interpret=False):
    B, rows, ch = p3.shape
    blk = pl.BlockSpec((1, rows, ch), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    m, stats = pl.pallas_call(
        _fwd_kernel,
        grid=(B,),
        in_specs=[blk, blk],
        out_specs=[pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                                memory_space=pltpu.SMEM),
                   pl.BlockSpec((1, 1, 4), lambda b: (b, 0, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, 4), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(p3, t3)
    return m[:, 0, 0], stats


@functools.partial(jax.jit, static_argnames=("wrt_target", "interpret"))
def _bwd_call(p3, t3, stats, uscale, wrt_target, interpret=False):
    B, rows, ch = p3.shape
    blk = pl.BlockSpec((1, rows, ch), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    srow = lambda w: pl.BlockSpec((1, 1, w), lambda b: (b, 0, 0),
                                  memory_space=pltpu.SMEM)
    ref = t3 if wrt_target else p3
    return pl.pallas_call(
        functools.partial(_bwd_kernel, wrt_target=wrt_target),
        grid=(B,),
        in_specs=[blk, blk, srow(4), srow(1)],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct(p3.shape, ref.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(p3, t3, stats, uscale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def normalized_mse_pallas(p: jax.Array, t: jax.Array, weights: jax.Array,
                          interpret: bool = False) -> jax.Array:
    """One std-normalized-MSE layer over [B, H, W, C] (or [B, rows, C])
    feature maps, single-HBM-read Pallas implementation.  Equals
    losses.vggish.normalized_mse; gradients flow to p and t (the unused
    side's backward kernel is DCE'd by XLA)."""
    loss, _ = _nmp_fwd(p, t, weights, interpret)
    return loss


def _flat3(x):
    B = x.shape[0]
    ch = x.shape[-1]
    return x.reshape(B, -1, ch)


def _nmp_fwd(p, t, weights, interpret):
    p3, t3 = _flat3(p), _flat3(t)
    m, stats = _fwd_call(p3, t3, interpret=interpret)
    w = weights.astype(jnp.float32)
    wsum = jnp.sum(w)
    loss = jnp.sum(m * w) / wsum
    return loss, (p, t, stats, m, w, wsum)


def _nmp_bwd(interpret, res, g):
    p, t, stats, m, w, wsum = res
    p3, t3 = _flat3(p), _flat3(t)
    uscale = (g * w / wsum)[:, None, None]
    dp = _bwd_call(p3, t3, stats, uscale, False,
                   interpret=interpret).reshape(p.shape)
    dt = _bwd_call(p3, t3, stats, uscale, True,
                   interpret=interpret).reshape(t.shape)
    dw = g * (m * wsum - jnp.sum(m * w)) / (wsum ** 2)
    return dp, dt, dw.astype(jnp.float32)


normalized_mse_pallas.defvjp(_nmp_fwd, _nmp_bwd)
