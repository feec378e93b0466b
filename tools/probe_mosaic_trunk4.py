"""Probe Mosaic handling of lane-offset slices (x[:, 64:128] of a
128-lane f32 array): store-to-narrow-ref, binary ops mixing offsets,
dot_general on an offset slice, and the offset concat that failed."""

from music_style_transfer_ldm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache("/root/repo/.jax_cache")

import functools  # noqa: E402
import time  # noqa: E402
import traceback  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def run(name, fn):
    t0 = time.time()
    try:
        out = fn()
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
        log(f"OK   {name} ({time.time()-t0:.1f}s)")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        log(f"FAIL {name}: {msg}")
        return False


N, C = 256, 64


def pcall(kernel, out_shape, scratch=()):
    return pl.pallas_call(
        kernel,
        out_specs=pl.BlockSpec((N, 2 * C), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 2 * C), jnp.float32),
        in_specs=[pl.BlockSpec((N, 2 * C), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        scratch_shapes=list(scratch),
        interpret=False,
    )


x = jnp.arange(N * 2 * C, dtype=jnp.float32).reshape(N, 2 * C) / 1e4


def k_store_offset_slice(x_ref, o_ref, scr):
    scr[...] = x_ref[:, C:]
    o_ref[:, :C] = scr[...]
    o_ref[:, C:] = x_ref[:, :C]


def k_mix_offsets(x_ref, o_ref):
    a = x_ref[:, :C]
    b = x_ref[:, C:]
    o_ref[:, :C] = a - b
    o_ref[:, C:] = b * 2.0


def k_dot_offset(x_ref, o_ref):
    a = x_ref[:, C:]                      # offset-64 lhs
    w = jax.lax.broadcasted_iota(jnp.float32, (C, C), 0) / 100.0
    y = jnp.dot(a, w, preferred_element_type=jnp.float32)
    o_ref[:, :C] = y
    o_ref[:, C:] = x_ref[:, :C]


def k_concat_offset(x_ref, o_ref):
    a = x_ref[:, :C]
    b = x_ref[:, C:]
    j = jnp.concatenate([a, b], axis=0)   # the failing op
    o_ref[:, :C] = j[:N]
    o_ref[:, C:] = j[N:]


def k_concat_via_scr(x_ref, o_ref, scr2):
    scr2[:N] = x_ref[:, :C]
    scr2[N:] = x_ref[:, C:]
    o_ref[:, :C] = scr2[:N]
    o_ref[:, C:] = scr2[N:]


def main():
    log(f"devices: {jax.devices()}")
    run("store offset slice via scratch",
        lambda: pcall(k_store_offset_slice, None,
                      [pltpu.VMEM((N, C), jnp.float32)])(x))
    run("binary op mixing offsets", lambda: pcall(k_mix_offsets, None)(x))
    run("dot with offset-64 lhs", lambda: pcall(k_dot_offset, None)(x))
    run("row-concat of offset slices",
        lambda: pcall(k_concat_offset, None)(x))
    run("row-restack via scratch stores",
        lambda: pcall(k_concat_via_scr, None,
                      [pltpu.VMEM((2 * N, C), jnp.float32)])(x))
    # correctness of the scratch restack
    y = pcall(k_concat_via_scr, None,
              [pltpu.VMEM((2 * N, C), jnp.float32)])(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=0)
    log("restack value check OK")


if __name__ == "__main__":
    main()
