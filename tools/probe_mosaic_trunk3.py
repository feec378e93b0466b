"""Round-3 probes: isolate the block_shapes failure from round 2.
Suspects: strided sublane loads on bf16 (tiling (16,128)), 3-D input
block [1, R, C] indexing, or the big-array mix."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from music_style_transfer_ldm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache("/root/repo/.jax_cache")


def run(name, kernel, out_shape, args, scratch=(), grid=None, blocks=None):
    try:
        in_specs = blocks or [
            pl.BlockSpec(a.shape,
                         (lambda *_: (0,) * a.ndim) if grid else None,
                         memory_space=pltpu.VMEM) for a in args]
        kw = dict(out_shape=out_shape,
                  in_specs=in_specs,
                  scratch_shapes=list(scratch),
                  compiler_params=pltpu.CompilerParams(
                      vmem_limit_bytes=128 * 1024 * 1024))
        if grid:
            kw["grid"] = grid
        out = pl.pallas_call(
            kernel,
            out_specs=pl.BlockSpec(
                out_shape.shape,
                (lambda *_: (0,) * len(out_shape.shape)) if grid else None,
                memory_space=pltpu.VMEM),
            **kw)(*args)
        jax.block_until_ready(out)
        print(f"[OK]   {name}", flush=True)
        return np.asarray(out)
    except Exception as e:  # noqa: BLE001
        print(f"[FAIL] {name}: {str(e).splitlines()[0][:160]}", flush=True)
        return None


N, C = 2048, 128

# 1. strided sublane load, bf16 scratch
x = jnp.ones((N, C), jnp.bfloat16)


def k1(x_ref, o_ref, scr):
    scr[...] = x_ref[...]
    o_ref[...] = scr[0::2, :]


run("strided_sublane_load bf16 scratch", k1,
    jax.ShapeDtypeStruct((N // 2, C), jnp.bfloat16), [x],
    scratch=[pltpu.VMEM((N, C), jnp.bfloat16)])


# 2. strided sublane load stride 2 offset 1, bf16
def k2(x_ref, o_ref, scr):
    scr[...] = x_ref[...]
    o_ref[...] = scr[1::2, :]


run("strided_sublane_load offset1 bf16", k2,
    jax.ShapeDtypeStruct((N // 2, C), jnp.bfloat16), [x],
    scratch=[pltpu.VMEM((N, C), jnp.bfloat16)])


# 3. 3-D input block [1, N, C] with grid, x_ref[0]
xb = jnp.ones((4, N, C), jnp.bfloat16)


def k3(x_ref, o_ref):
    o_ref[0] = x_ref[0] * jnp.bfloat16(2.0)


run("3d_block_index grid", k3,
    jax.ShapeDtypeStruct((4, N, C), jnp.bfloat16), [xb], grid=(4,),
    blocks=[pl.BlockSpec((1, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)])


# 4. strided load directly from a 3-D input block's middle dim
def k4(x_ref, o_ref):
    o_ref[0] = x_ref[0, 0::2, :]


run("strided_mid_3dblock", k4,
    jax.ShapeDtypeStruct((4, N // 2, C), jnp.bfloat16), [xb], grid=(4,),
    blocks=[pl.BlockSpec((1, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)])


# 5. f32 cast of big loaded block + sum + re-store bf16 (round2 mix)
def k5(x_ref, o_ref, scr):
    v = x_ref[0].astype(jnp.float32)
    scr[...] = v.astype(jnp.bfloat16)
    a = scr[0::2, :].astype(jnp.float32)
    b = scr[1::2, :].astype(jnp.float32)
    s = jnp.sum(jnp.maximum(a, b))
    o_ref[0] = (v * 2.0 + s * 0.0).astype(jnp.bfloat16)


run("round2_mix_smaller", k5,
    jax.ShapeDtypeStruct((4, N, C), jnp.bfloat16), [xb], grid=(4,),
    blocks=[pl.BlockSpec((1, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)],
    scratch=[pltpu.VMEM((N, C), jnp.bfloat16)])


# 6. same as 5 but R=16384 (the round-2 exact size)
R = 16384
xb2 = jnp.ones((2, R, C), jnp.bfloat16)


def k6(x_ref, o_ref, scr):
    v = x_ref[0].astype(jnp.float32)
    scr[...] = v.astype(jnp.bfloat16)
    a = scr[0::2, :].astype(jnp.float32)
    b = scr[1::2, :].astype(jnp.float32)
    s = jnp.sum(jnp.maximum(a, b))
    o_ref[0] = (v * 2.0 + s * 0.0).astype(jnp.bfloat16)


run("round2_mix_16384", k6,
    jax.ShapeDtypeStruct((2, R, C), jnp.bfloat16), [xb2], grid=(2,),
    blocks=[pl.BlockSpec((1, R, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)],
    scratch=[pltpu.VMEM((R, C), jnp.bfloat16)])

print("done", flush=True)
