"""Fused VGGish trunk on the real TPU: compile, parity vs the XLA path,
then chained-dispatch device timing (CLAUDE.md methodology: N dependent
calls in one jit minus the sync floor).

Run stages via argv: `parity` (B=4), `time` (chained timing at --batch),
or both.  Backgrounded runs: relay client INIT can take minutes.
"""

from __future__ import annotations

import sys
import time

from music_style_transfer_ldm_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache("/root/repo/.jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from music_style_transfer_ldm_tpu.losses.vggish import (  # noqa: E402
    VGGishFeatures, vggish_feature_distance,
)
from music_style_transfer_ldm_tpu.ops.pallas.fused_trunk import (  # noqa: E402
    fused_supported,
)

H = W = 128
DT = jnp.bfloat16


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def trunk_flops(B):
    """Dense FLOPs of one trunk forward over BOTH branches (matmul terms
    only), at 128x128: conv1 counted too (XLA side)."""
    specs = [(128 * 128, 1, 64), (64 * 64, 64, 128), (32 * 32, 128, 256),
             (32 * 32, 256, 256), (16 * 16, 256, 512), (16 * 16, 512, 512)]
    per = sum(2 * 9 * cin * cout * hw for hw, cin, cout in specs)
    return 2 * B * per  # both branches


def main():
    stages = sys.argv[1:] or ["parity", "time"]
    batch = 128
    for a in list(stages):
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])
            stages.remove(a)

    log(f"devices: {jax.devices()}")
    module = VGGishFeatures(dtype=DT)
    params = module.init(jax.random.PRNGKey(3),
                         jnp.zeros((1, H, W, 1), jnp.float32))["params"]

    kp, kt = jax.random.split(jax.random.PRNGKey(11))

    def dist(impl, with_w=True):
        def f(pred, target, weights):
            return vggish_feature_distance(module, params, pred, target,
                                           weights, impl=impl)
        return f

    if "parity" in stages:
        B = 4
        pred = jax.random.uniform(kp, (B, H, W, 1), jnp.float32)
        target = jax.random.uniform(kt, (B, H, W, 1), jnp.float32)
        weights = jnp.asarray([1.0] * (B - 1) + [0.0], jnp.float32)
        log(f"fused_supported: {fused_supported(params, pred)}")

        t0 = time.time()
        v_x = jax.jit(dist("xla"))(pred, target, weights)
        sync(v_x)
        log(f"xla value compile+run {time.time()-t0:.1f}s: {float(v_x):.6f}")

        t0 = time.time()
        v_f = jax.jit(dist("fused-value"))(pred, target, weights)
        sync(v_f)
        log(f"fused-value compile+run {time.time()-t0:.1f}s: "
            f"{float(v_f):.6f}")

        t0 = time.time()
        g_x = jax.jit(jax.grad(lambda p: dist("xla")(p, target, weights))
                      )(pred)
        sync(g_x)
        log(f"xla grad compile+run {time.time()-t0:.1f}s")

        t0 = time.time()
        g_f = jax.jit(jax.grad(lambda p: dist("fused")(p, target, weights))
                      )(pred)
        sync(g_f)
        log(f"fused grad compile+run {time.time()-t0:.1f}s")

        gx, gf = np.asarray(g_x), np.asarray(g_f)
        den = np.abs(gx).max() + 1e-12
        log(f"value fused-vs-xla rel: "
            f"{abs(float(v_f)-float(v_x))/abs(float(v_x)):.4e}")
        log(f"grad maxrel {np.abs(gf-gx).max()/den:.4e}  "
            f"l2rel {np.linalg.norm(gf-gx)/np.linalg.norm(gx):.4e}")

    if "time" in stages:
        B = batch
        pred = jax.random.uniform(kp, (B, H, W, 1), jnp.float32)
        target = jax.random.uniform(kt, (B, H, W, 1), jnp.float32)
        weights = jnp.ones((B,), jnp.float32)
        n_chain = 16

        def chain_value(impl):
            f = dist(impl)

            @jax.jit
            def run(p):
                def body(_, pk):
                    v = f(pk, target, weights)
                    return pk + (1e-6 * v).astype(pk.dtype)
                return jax.lax.fori_loop(0, n_chain, body, p)
            return run

        def chain_grad(impl):
            f = dist(impl)
            g = jax.grad(lambda p: f(p, target, weights))

            @jax.jit
            def run(p):
                def body(_, pk):
                    return pk + (1e-6 * g(pk)).astype(pk.dtype)
                return jax.lax.fori_loop(0, n_chain, body, p)
            return run

        # sync floor
        tiny = jax.jit(lambda x: x + 1.0)
        z = jnp.zeros((8, 128), jnp.float32)
        sync(tiny(z))
        for _ in range(25):
            sync(tiny(z))
        floors = []
        for _ in range(8):
            t0 = time.perf_counter()
            sync(tiny(z))
            floors.append(time.perf_counter() - t0)
        floor = min(floors)
        log(f"sync floor {floor*1000:.2f} ms")

        dev = jax.devices()[0]
        try:
            from music_style_transfer_ldm_tpu.benchmarks import (
                _peak_flops_per_sec,
            )
            peak = _peak_flops_per_sec(dev)
        except Exception:
            peak = None

        fl_fwd = trunk_flops(B)
        for name, runner, fl in [
            ("xla   value", chain_value("xla"), fl_fwd),
            ("fused value", chain_value("fused-value"), fl_fwd),
            # grad-of-pred only: fwd + input-grad chain = ~2x fwd FLOPs
            # (no weight gradients anywhere in this metric).
            ("xla   grad ", chain_grad("xla"), 2 * fl_fwd),
            ("fused grad ", chain_grad("fused"), 2 * fl_fwd),
        ]:
            try:
                t0 = time.time()
                out = runner(pred)
                sync(out)
                log(f"{name}: compiled in {time.time()-t0:.1f}s")
                for _ in range(25):
                    out = runner(pred)
                sync(out)
                best = float("inf")
                for _ in range(6):
                    t0 = time.perf_counter()
                    out = runner(pred)
                    sync(out)
                    best = min(best, time.perf_counter() - t0)
                per = max(best - floor, 1e-9) / n_chain
                mfu = (fl / per / peak) if peak else float("nan")
                log(f"{name} b{B}: {per*1000:.3f} ms/call  "
                    f"mfu~{mfu:.3f}")
            except Exception as e:
                log(f"{name} FAILED: {e!r:.500}")

    log("DONE")


if __name__ == "__main__":
    main()
