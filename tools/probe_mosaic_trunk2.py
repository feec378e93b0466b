"""Round-2 Mosaic probes for the fused VGGish trunk kernel: physical VMEM
ceiling, leading-dim strided store, and the exact block shapes the hybrid
design wants.  Run on TPU."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from music_style_transfer_ldm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache("/root/repo/.jax_cache")


def vmem_probe(mb: int) -> str:
    """Allocate a scratch of `mb` MB and touch both ends."""
    n = mb * 1024 * 1024 // (128 * 4)  # rows of f32 x 128 lanes

    def k(x_ref, o_ref, scr):
        scr[0:8, :] = x_ref[...]
        scr[n - 8:n, :] = x_ref[...] * 2.0
        o_ref[...] = scr[0:8, :] + scr[n - 8:n, :]

    try:
        out = pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec((8, 128), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((n, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=192 * 1024 * 1024),
        )(jnp.ones((8, 128), jnp.float32))
        np.testing.assert_allclose(np.asarray(out), 3.0)
        return "OK"
    except Exception as e:  # noqa: BLE001
        return "FAIL: " + str(e).splitlines()[0][:160]


def strided_store_leading() -> str:
    H, W, C = 32, 32, 128

    def k(x_ref, o_ref, scr):
        scr[...] = jnp.zeros((H, W, C), jnp.float32)
        scr[::2] = x_ref[...]
        o_ref[...] = scr[...]

    try:
        x = jnp.arange((H // 2) * W * C, dtype=jnp.float32)
        x = x.reshape(H // 2, W, C)
        out = pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((H, W, C), jnp.float32),
            in_specs=[pl.BlockSpec((H // 2, W, C), lambda: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((H, W, C), lambda: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((H, W, C), jnp.float32)],
        )(x)
        exp = np.zeros((H, W, C), np.float32)
        exp[::2] = np.asarray(x)
        np.testing.assert_array_equal(np.asarray(out), exp)
        return "OK"
    except Exception as e:  # noqa: BLE001
        return "FAIL: " + str(e).splitlines()[0][:160]


def full_block_shapes() -> str:
    """The hybrid design's real block shapes: [1, 16384, 128] bf16 in/out
    over a batch grid, with a big stored-feature scratch."""
    B, R, C = 4, 16384, 128

    def k(x_ref, o_ref, scr):
        x = x_ref[0].astype(jnp.float32)          # [R, C]
        # pool via strided loads out of a scratch
        scr[...] = x.astype(jnp.bfloat16)
        a = scr[0::2, :].astype(jnp.float32)
        b = scr[1::2, :].astype(jnp.float32)
        wm = jnp.maximum(a, b)                     # [R/2, C]
        s = jnp.sum(wm)
        o_ref[0] = (x * 2.0 + s * 0.0).astype(jnp.bfloat16)

    try:
        x = jnp.ones((B, R, C), jnp.bfloat16)
        out = pl.pallas_call(
            k,
            grid=(B,),
            out_shape=jax.ShapeDtypeStruct((B, R, C), jnp.bfloat16),
            in_specs=[pl.BlockSpec((1, R, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, R, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((R, C), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=128 * 1024 * 1024),
        )(x)
        np.testing.assert_allclose(np.asarray(out, np.float32), 2.0)
        return "OK"
    except Exception as e:  # noqa: BLE001
        return "FAIL: " + str(e).splitlines()[0][:160]


def offset_strided_load() -> str:
    """x[1::2] (offset-1 stride-2) on the sublane dim."""
    N, C = 64, 128

    def k(x_ref, o_ref):
        o_ref[...] = x_ref[1::2, :]

    try:
        x = jnp.arange(N * C, dtype=jnp.float32).reshape(N, C)
        out = pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((N // 2, C), jnp.float32),
            in_specs=[pl.BlockSpec((N, C), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((N // 2, C), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
        )(x)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[1::2])
        return "OK"
    except Exception as e:  # noqa: BLE001
        return "FAIL: " + str(e).splitlines()[0][:160]


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    print("offset_strided_load:", offset_strided_load(), flush=True)
    print("strided_store_leading:", strided_store_leading(), flush=True)
    print("block_shapes [1,16384,128]:", full_block_shapes(), flush=True)
    for mb in (20, 32, 48, 64, 96, 120):
        print(f"vmem scratch {mb} MB:", vmem_probe(mb), flush=True)
