"""Probe Mosaic (Pallas TPU) support for the ops the fused VGGish trunk
kernel (docs/ROADMAP.md #7) wants to use.

Each probe compiles (and runs, tiny shapes) one candidate op on the real
TPU and reports OK / the Mosaic error.  Run on TPU:

    python tools/probe_mosaic_trunk.py

Findings get recorded in CLAUDE.md / the kernel docstring.
"""

from __future__ import annotations

import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from music_style_transfer_ldm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache("/root/repo/.jax_cache")

RESULTS = []


def probe(name):
    def deco(fn):
        def run():
            try:
                fn()
                RESULTS.append((name, "OK", ""))
                print(f"[OK]   {name}", flush=True)
            except Exception as e:  # noqa: BLE001
                msg = str(e).splitlines()[0][:200]
                RESULTS.append((name, "FAIL", msg))
                print(f"[FAIL] {name}: {msg}", flush=True)
        return run
    return deco


def call(kernel, out_shape, *args, scratch_shapes=()):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(a.shape, lambda *_: (0,) * a.ndim,
                               memory_space=pltpu.VMEM) for a in args],
        out_specs=pl.BlockSpec(out_shape.shape,
                               lambda *_: (0,) * len(out_shape.shape),
                               memory_space=pltpu.VMEM),
        scratch_shapes=list(scratch_shapes),
    )(*args)


N, C = 1024, 64   # stand-in for [H*W, C] maps (small to compile fast)
H, W = 32, 32


@probe("reshape_merge_lanes [N,C]->[N/2,2C] (f32)")
def p_reshape_lanes():
    x = jnp.arange(N * C, dtype=jnp.float32).reshape(N, C)

    def k(x_ref, o_ref):
        y = x_ref[...].reshape(N // 2, 2 * C)
        o_ref[...] = y

    out = call(k, jax.ShapeDtypeStruct((N // 2, 2 * C), jnp.float32), x)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(x).reshape(N // 2, 2 * C))


@probe("reshape_split_leading [N,C]->[H,W,C] (f32)")
def p_reshape_split():
    x = jnp.arange(N * C, dtype=jnp.float32).reshape(N, C)

    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(H, W, C)

    out = call(k, jax.ShapeDtypeStruct((H, W, C), jnp.float32), x)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(x).reshape(H, W, C))


@probe("reshape_merge_leading [H,W,C]->[N,C] (f32)")
def p_reshape_merge():
    x = jnp.arange(N * C, dtype=jnp.float32).reshape(H, W, C)

    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(N, C)

    out = call(k, jax.ShapeDtypeStruct((N, C), jnp.float32), x)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(x).reshape(N, C))


@probe("reshape_img_to_col [128,128]->[16384,1] (f32)")
def p_reshape_img():
    x = jnp.arange(128 * 128, dtype=jnp.float32).reshape(128, 128)

    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(128 * 128, 1)

    out = call(k, jax.ShapeDtypeStruct((128 * 128, 1), jnp.float32), x)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(x).reshape(-1, 1))


@probe("strided_load_sublane x[0::2,:] (f32)")
def p_strided_sublane():
    x = jnp.arange(N * C, dtype=jnp.float32).reshape(N, C)

    def k(x_ref, o_ref):
        o_ref[...] = x_ref[::2, :]

    out = call(k, jax.ShapeDtypeStruct((N // 2, C), jnp.float32), x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[::2])


@probe("strided_load_leading x3[0::2] (f32)")
def p_strided_leading():
    x = jnp.arange(N * C, dtype=jnp.float32).reshape(H, W, C)

    def k(x_ref, o_ref):
        o_ref[...] = x_ref[::2]

    out = call(k, jax.ShapeDtypeStruct((H // 2, W, C), jnp.float32), x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[::2])


@probe("lane_slice_half y[:, :C/2] (f32)")
def p_lane_slice():
    x = jnp.arange(N * C, dtype=jnp.float32).reshape(N, C)

    def k(x_ref, o_ref):
        o_ref[...] = x_ref[:, : C // 2]

    out = call(k, jax.ShapeDtypeStruct((N, C // 2), jnp.float32), x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[:, :32])


@probe("lane_roll pltpu.roll(x,1,axis=1) (f32)")
def p_lane_roll():
    x = jnp.arange(N * 128, dtype=jnp.float32).reshape(N, 128)

    def k(x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], 1, axis=1)

    out = call(k, jax.ShapeDtypeStruct((N, 128), jnp.float32), x)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.roll(np.asarray(x), 1, axis=1))


@probe("dot_general_rhs_T contract ((1,),(1,)) bf16")
def p_dot_t():
    a = jnp.ones((N, C), jnp.bfloat16)
    b = jnp.ones((128, C), jnp.bfloat16)

    def k(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    out = call(k, jax.ShapeDtypeStruct((N, 128), jnp.float32), a, b)
    np.testing.assert_allclose(np.asarray(out), np.full((N, 128), C), rtol=0)


@probe("max_reduce_to_1x1 jnp.sum(x)[None,None] (f32)")
def p_reduce():
    x = jnp.ones((N, C), jnp.float32)

    def k(x_ref, o_ref):
        s = jnp.sum(x_ref[...].astype(jnp.float32))
        o_ref[...] = jnp.full((8, 128), s, jnp.float32)

    out = call(k, jax.ShapeDtypeStruct((8, 128), jnp.float32), x)
    np.testing.assert_allclose(np.asarray(out)[0, 0], N * C)


@probe("scratch_store_strided o[::2]=x (f32)")
def p_strided_store():
    x = jnp.arange((N // 2) * C, dtype=jnp.float32).reshape(N // 2, C)

    def k(x_ref, o_ref, scr):
        scr[...] = jnp.zeros((N, C), jnp.float32)
        scr[::2, :] = x_ref[...]
        o_ref[...] = scr[...]

    out = call(k, jax.ShapeDtypeStruct((N, C), jnp.float32), x,
               scratch_shapes=[pltpu.VMEM((N, C), jnp.float32)])
    exp = np.zeros((N, C), np.float32)
    exp[::2] = np.asarray(x)
    np.testing.assert_array_equal(np.asarray(out), exp)


@probe("bf16_reshape_merge_lanes [N,C]->[N/2,2C] (bf16)")
def p_reshape_lanes_bf16():
    x = jnp.arange(N * C, dtype=jnp.float32).astype(jnp.bfloat16)
    x = x.reshape(N, C)

    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(N // 2, 2 * C)

    out = call(k, jax.ShapeDtypeStruct((N // 2, 2 * C), jnp.bfloat16), x)
    np.testing.assert_array_equal(
        np.asarray(out, np.float32),
        np.asarray(x, np.float32).reshape(N // 2, 2 * C))


@probe("transpose_small w.T [64,128]->[128,64] (bf16)")
def p_transpose():
    x = jnp.arange(64 * 128, dtype=jnp.float32).astype(jnp.bfloat16)
    x = x.reshape(64, 128)

    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...].T

    out = call(k, jax.ShapeDtypeStruct((128, 64), jnp.bfloat16), x)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(x, np.float32).T)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for fn in [p_reshape_lanes, p_reshape_split, p_reshape_merge,
               p_reshape_img, p_strided_sublane, p_strided_leading,
               p_lane_slice, p_lane_roll, p_dot_t, p_reduce,
               p_strided_store, p_reshape_lanes_bf16, p_transpose]:
        fn()
    print("\nsummary:")
    for name, status, msg in RESULTS:
        print(f"  {status:4s} {name}" + (f" — {msg}" if msg else ""))
