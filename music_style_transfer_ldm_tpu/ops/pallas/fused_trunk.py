"""The whole VGGish style-loss trunk — forward AND input-gradient — as one
Pallas TPU kernel per sample.

Why it was built: the LDM train step is wall-limited by the style trunk's
feature-metric machinery (docs/PERFORMANCE.md "wall" analysis): maxpools,
per-sample std reductions and the six-scale normalized MSE have ~zero
FLOPs but stream feature maps through HBM, a hypothesized ~56-59 % MFU
roofline floor.  An isolated Pallas metric layer made things WORSE
(ops/pallas/normalized_mse.py); the remaining hypothesis (ROADMAP #7) was
that only a WHOLE-trunk fusion — every conv, pool, metric reduction and
the full backward chain in one VMEM residency per sample, HBM touched
only for the first feature map in and the input gradient out — could
beat XLA.

MEASURED OUTCOME (v5e, b128 @128x128, chained-dispatch methodology —
tools/bench_fused_trunk_tpu.py): the hypothesis is REFUTED.  XLA fwd
10.41 ms (53 % MFU) vs fused 12.21 ms (45 %); fwd+input-grad XLA
18.47 ms (60 %) vs fused 20.71 ms (53 %); at b8 the grad paths tie
(1.44 vs 1.38 ms, within relay jitter).  XLA's conv emission feeds the
MXU without materializing the 9 shifted tap copies this kernel's
roll-based convs pay for on the VPU, and at b128 its HBM streaming
overlaps compute well enough that fusion buys nothing back.  The kernel
is kept as a parity-tested alternate (impl='fused'/'fused-value' in
losses/vggish.py) and as the strongest-possible closure of the wall
analysis: even full fusion cannot beat XLA here, so the ~42 % train-step
MFU stands as the practical wall for this loss design.

Design (probed op support: tools/probe_mosaic_trunk*.py):

* conv1 (1->64 ch at 128x128) stays OUTSIDE in XLA as one grouped conv
  over the (pred, target) channel pair: bridging the [H, W] image layout
  to the kernel's [H*W, C] matmul layout needs a lane<->sublane relayout
  Mosaic does not expose ([H,W]->[HW,1] reshapes fail to compile), while
  the boundary array f1_both = [B, H*W, 2*C1] is exactly 128 lanes — no
  HBM tile padding — and conv1 is ~0.6 % of trunk FLOPs.
* inside the kernel the two branches (pred, target) are STACKED ON ROWS
  for every conv, so each of the 9 tap matmuls runs once with 2x the MXU
  rows (the roll-tap full-resolution conv of ops/pallas/fused_sampler.py;
  edge masks are periodic in the per-image row block).
* maxpools run as stride-2 loads on f32 scratch copies (bf16's (16,128)
  tiling rejects stride-2 sublane access — probed), in two reshape-free
  stages: w-pairs are adjacent rows of the flattened map, h-pairs are
  adjacent leading indices of the [H, W/2, C] view.
* the backward is the hand-derived chain: closed-form normalized-MSE
  input grads (same math as losses/vggish.py normalized_mse), relu masks
  from the stored post-relu maps, conv input-grads as tap matmuls with
  the CONTRACTION ON THE RHS'S OUTPUT DIM (lax.dot_general ((1,),(1,)) —
  Mosaic lowers it natively, so no transposed weight copies), and
  first-match 2x2 argmax scatter matching XLA's select-and-scatter tie
  rule.
* per-sample VMEM: ~9 MB bf16 weights (fetched once, constant index
  map), ~5 MB stored post-relu maps (both branches, the backward needs
  them), ~35 MB f32 pool/scatter scratches — well under the ~128 MB/core
  the v5e exposes (probed up to 120 MB).

Gradient scope: the backward produces d(pred) only — the style target is
data in every training path (the reference extracts target features under
torch.no_grad, ref: models/loss.py:78).  d(target)/d(params) cotangents
are returned as zeros; callers that need target gradients must use the
XLA implementation (losses/vggish.py).

Reference semantics reproduced: VGGish conv trunk + per-ReLU feature
collection (ref: models/loss.py:52-101), std-normalized per-sample MSE
averaged over layers (ref: loss.py:92-101), eps = 1e-8.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-8
_N_LAYERS = 6
_LB = 128  # TPU lane width: strided loads/stores need 128-lane base refs


def _nblocks(c: int):
    """Channel blocking for pool/unpool scratches: Mosaic's strided
    sublane load requires the base memref's last dim to be exactly 128
    (probed on v5e), so wide maps are staged as per-128-lane blocks.
    Narrow test geometries (c < 128) run single-block (interpret mode
    has no such constraint)."""
    if c % _LB == 0:
        return c // _LB, _LB
    if c < _LB:
        return 1, c
    raise ValueError(f"channel count {c} not blockable into {_LB} lanes")

# Kernel-side convs in trunk order (conv1 runs in XLA).  A 2x2/2 maxpool
# runs BEFORE convs 0, 1 and 3 (i.e. after collected layers f1, f2, f4).
_KERNEL_CONVS = ("conv2", "conv3_1", "conv3_2", "conv4_1", "conv4_2")
_POOL_BEFORE = (True, True, False, True, False)


def _geometry(params: Dict[str, Any], H: int, W: int):
    """Static geometry: dims[l] = (H_l, W_l, C_l) of collected layer l
    (l=0 is conv1's output); convs[i] = (name, H, W, Cin, Cout) for the
    kernel-side convs."""
    if H % 8 or W % 8:
        raise ValueError(f"fused trunk needs H, W divisible by 8; got "
                         f"{(H, W)}")
    c_prev = params["conv1"]["kernel"].shape[3]
    if 2 * c_prev > _LB:
        raise ValueError(f"fused trunk needs conv1 width <= {_LB // 2} "
                         f"(joint f1 layout is one lane block); got "
                         f"{c_prev}")
    dims = [(H, W, c_prev)]
    convs = []
    h, w = H, W
    for name, pool in zip(_KERNEL_CONVS, _POOL_BEFORE):
        if pool:
            h, w = h // 2, w // 2
        k = params[name]["kernel"]
        if k.shape[2] != c_prev:
            raise ValueError(f"{name}: Cin {k.shape[2]} != previous Cout "
                             f"{c_prev} — not the VGGish topology")
        cout = k.shape[3]
        convs.append((name, h, w, c_prev, cout))
        dims.append((h, w, cout))
        c_prev = cout
    return dims, convs


# --------------------------------------------------------------------------
# Kernel building blocks
# --------------------------------------------------------------------------


def _roll_rows(a, shift):
    """jnp.roll on the row dim via a static two-slice concat (Mosaic's
    dynamic rotate is unimplemented for bf16; shifts here are static)."""
    m = (-shift) % a.shape[0]
    if m == 0:
        return a
    return jnp.concatenate([a[m:], a[:m]], axis=0)


def _tap_masks(n: int, per: int, W: int):
    """Row-validity masks for the 9 taps on stacked flattened maps: a
    neighbor living in another image block is exactly a row at the image
    boundary, which the mask zeroes (see fused_sampler._roll_conv)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) % per
    col = r % W
    masks = {}
    for ky in (-1, 0, 1):
        for kx in (-1, 0, 1):
            ok = jnp.ones((n, 1), jnp.bool_)
            if ky < 0:
                ok = ok & (r >= W)
            if ky > 0:
                ok = ok & (r < per - W)
            if kx < 0:
                ok = ok & (col >= 1)
            if kx > 0:
                ok = ok & (col <= W - 2)
            masks[(ky, kx)] = ok
    return masks


def _conv_fwd(x, w9, H: int, W: int, dtype):
    """3x3 stride-1 pad-1 conv on stacked flattened maps.

    x: [n, Cin] (n a multiple of H*W); w9: [9, Cin, Cout] value.
    Returns the f32 accumulator (no bias/relu)."""
    n = x.shape[0]
    masks = _tap_masks(n, H * W, W)
    xd = x.astype(dtype)
    acc = None
    for ky in (-1, 0, 1):
        for kx in (-1, 0, 1):
            t = (ky + 1) * 3 + (kx + 1)
            off = ky * W + kx
            shifted = _roll_rows(xd, -off) if off else xd
            tap = jnp.where(masks[(ky, kx)], shifted,
                            jnp.zeros_like(shifted))
            y = jnp.dot(tap, w9[t].astype(dtype),
                        preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
    return acc


def _conv_bwd_input(g, w9, H: int, W: int, dtype):
    """Input gradient of _conv_fwd: dx = sum_t roll(mask_t * (g @ w_t^T),
    +off_t).  The transposed contraction runs as dot_general ((1,),(1,))
    — no transposed weight copy.  g: [n, Cout] f32 -> [n, Cin] f32."""
    n = g.shape[0]
    masks = _tap_masks(n, H * W, W)
    gd = g.astype(dtype)
    acc = None
    for ky in (-1, 0, 1):
        for kx in (-1, 0, 1):
            t = (ky + 1) * 3 + (kx + 1)
            off = ky * W + kx
            z = jax.lax.dot_general(gd, w9[t].astype(dtype),
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            z = jnp.where(masks[(ky, kx)], z, jnp.zeros_like(z))
            if off:
                z = _roll_rows(z, off)
            acc = z if acc is None else acc + z
    return acc


def _metric_direct_grad(p32, t32, mu_p, s_p, s_t, n_elems: float,
                        a=None):
    """d m_l / d p for m_l = mean((p/(s_p+e) - t/(s_t+e))^2) — the closed
    form of losses/vggish.py _nm_bwd with unit upstream (the 1/num_layers
    average is folded in by the caller).

    `a` is the global projection coefficient sum(u * p) over the WHOLE
    layer; it must be passed in when p32/t32 are a chunk of the layer
    (the L1 chunked path) — computing it from the chunk is wrong."""
    ph = p32 / (s_p + _EPS)
    th = t32 / (s_t + _EPS)
    u = (2.0 / n_elems) * (ph - th)
    if a is None:
        a = jnp.sum(u * p32)
    return u / (s_p + _EPS) - a * (p32 - mu_p) / (
        (s_p + _EPS) ** 2 * n_elems * s_p)


# --------------------------------------------------------------------------
# The kernel
# --------------------------------------------------------------------------


def _make_kernel(H: int, W: int, dims, convs, dtype, l1_chunks: int,
                 with_grad: bool):
    C1 = dims[0][2]
    HW = H * W
    csz = HW // l1_chunks
    n1 = float(HW * C1)
    inv_layers = 1.0 / _N_LAYERS

    nb1, bs1 = _nblocks(dims[1][2])
    nb3, bs3 = _nblocks(dims[3][2])

    def kernel(f1b_ref, *refs):
        nconv = len(convs)
        wrefs = refs[:2 * nconv]
        it = iter(refs[2 * nconv:])

        def take(n=1):
            return [next(it) for _ in range(n)]

        m_ref = take()[0]
        g1_ref = take()[0] if with_grad else None
        f1f, p3_1, rs1 = take(3)
        pf0, pp0 = take(nb1), take(nb1)
        xs0 = take()[0]
        pf2, pp2 = take(nb3), take(nb3)
        xs2 = take()[0]
        if with_grad:
            stores = tuple(take(5))
            gj1, e3_1j, u2d_1j = take(3)
            u0, e0 = take(nb1), take(nb1)
            xg0 = take()[0] if nb1 > 1 else None
            u2, e2 = take(nb3), take(nb3)
            xg2 = take()[0] if nb3 > 1 else None
        else:
            # Metrics only (the trainer's parity default stop-gradients
            # the style term): no post-relu stores, no unpool machinery.
            stores = None

        def w9(i):
            return wrefs[2 * i][...]

        def bias(i):
            return wrefs[2 * i + 1][...].astype(jnp.float32)   # [1, C]

        # ---------------- forward --------------------------------------
        f1f[...] = f1b_ref[0].astype(jnp.float32)   # [HW, 2*C1] joint

        m_layers = []

        def l1_sums(fn):
            tot = jnp.float32(0.0)
            for k in range(l1_chunks):
                tot = tot + fn(f1f[k * csz:(k + 1) * csz, :])
            return tot

        mu_p1 = l1_sums(lambda b: jnp.sum(b[:, :C1])) / n1
        mu_t1 = l1_sums(lambda b: jnp.sum(b[:, C1:])) / n1
        s_p1 = jnp.sqrt(
            l1_sums(lambda b: jnp.sum((b[:, :C1] - mu_p1) ** 2)) / n1)
        s_t1 = jnp.sqrt(
            l1_sums(lambda b: jnp.sum((b[:, C1:] - mu_t1) ** 2)) / n1)

        def l1_m(b):
            d = b[:, :C1] / (s_p1 + _EPS) - b[:, C1:] / (s_t1 + _EPS)
            return jnp.sum(d * d)

        m_layers.append(l1_sums(l1_m) / n1)

        def pool(src2d, scr3, rows: int, img_rows: int, w: int, bs: int):
            """2x2/2 maxpool over a stacked [rows, bs] f32 ref.  img_rows
            = total stacked image rows (n_images * H_level).  bs <= 128:
            Mosaic's strided sublane load requires a 128-lane base."""
            wm = jnp.maximum(src2d[0::2, :], src2d[1::2, :])
            scr3[...] = wm.reshape(img_rows, w // 2, bs)
            hm = jnp.maximum(scr3[0::2], scr3[1::2])
            return hm.reshape(rows // 4, bs)

        # pool1 on the lanes-joint f32 copy (both branches pool
        # identically lane-by-lane), then restack branch rows.
        # Restack branches from lanes to rows via scratch stores: Mosaic
        # cannot concat a lane-offset slice (tpu.concatenate rejects
        # mismatched non-concat-dim offsets) but relayouts fine on store
        # (probed: tools/probe_mosaic_trunk4.py).
        pooled = pool(f1f, p3_1, HW, H, W, 2 * C1)
        rs1[: HW // 4] = pooled[:, :C1]
        rs1[HW // 4:] = pooled[:, C1:]
        x = rs1[...].astype(dtype)

        # a pool follows convs 0 and 2; wide maps pool per 128-lane block
        pgroups = {0: (pf0, pp0, xs0, nb1, bs1),
                   2: (pf2, pp2, xs2, nb3, bs3)}
        stats = []
        for i, (name, h, w, cin, cout) in enumerate(convs):
            del name, cin
            acc = _conv_fwd(x, w9(i), h, w, dtype) + bias(i)
            f = jnp.maximum(acc.astype(dtype), 0)      # [2*h*w, cout]
            if with_grad:
                stores[i][...] = f
            n_half = h * w
            p32 = f[:n_half].astype(jnp.float32)
            t32 = f[n_half:].astype(jnp.float32)
            ne = float(n_half * cout)
            mu_p = jnp.sum(p32) / ne
            s_p = jnp.sqrt(jnp.sum((p32 - mu_p) ** 2) / ne)
            mu_t = jnp.sum(t32) / ne
            s_t = jnp.sqrt(jnp.sum((t32 - mu_t) ** 2) / ne)
            stats.append((mu_p, s_p, s_t))
            d = p32 / (s_p + _EPS) - t32 / (s_t + _EPS)
            m_layers.append(jnp.sum(d * d) / ne)
            if i in pgroups:
                pf, pp, xs, nb, bs = pgroups[i]
                f32v = f.astype(jnp.float32)
                for k in range(nb):
                    sl = slice(k * bs, (k + 1) * bs)
                    pf[k][...] = f32v[:, sl]
                    pk = pool(pf[k], pp[k], 2 * h * w, 2 * h, w, bs)
                    xs[:, sl] = pk
                x = xs[...].astype(dtype)
            elif i + 1 < nconv:
                x = f

        for li in range(_N_LAYERS):
            m_ref[0, 0, li] = m_layers[li]

        if not with_grad:
            return

        # ---------------- backward (d pred only) ------------------------
        def unpool_block(gp, fsrc2d, scr3, u2d, h: int, w: int, bs: int):
            """Scatter gp [h*w/4, bs] f32 to the argmax of each 2x2
            window of the PRE-pool p-branch map (f32 ref fsrc2d, p rows
            first), XLA's first-match tie order (0,0),(0,1),(1,0),(1,1).
            h, w are the per-image dims; the p branch (or the single
            joint image at level 1) occupies the first h*w rows.  scr3
            [h, w//2, bs] is used for both extraction and the scatter
            staging (loads complete before the re-store)."""
            v = {}
            for dx in (0, 1):
                st1 = fsrc2d[dx::2, :]
                st1 = st1[: (h * w) // 2, :bs]
                scr3[...] = st1.reshape(h, w // 2, bs)
                for dy in (0, 1):
                    v[(dy, dx)] = scr3[dy::2].reshape((h * w) // 4, bs)
            wmax = jnp.maximum(jnp.maximum(v[(0, 0)], v[(0, 1)]),
                               jnp.maximum(v[(1, 0)], v[(1, 1)]))
            taken = jnp.zeros_like(wmax, dtype=jnp.bool_)
            sel = {}
            for key in ((0, 0), (0, 1), (1, 0), (1, 1)):
                hit = (v[key] == wmax) & (~taken)
                sel[key] = hit
                taken = taken | hit
            for dx in (0, 1):
                c0 = jnp.where(sel[(0, dx)], gp, 0.0)
                c1 = jnp.where(sel[(1, dx)], gp, 0.0)
                scr3[0::2] = c0.reshape(h // 2, w // 2, bs)
                scr3[1::2] = c1.reshape(h // 2, w // 2, bs)
                u2d[dx::2, :] = scr3[...].reshape((h * w) // 2, bs)
            return u2d[...]

        def unpool(gp, fsrcs, scrs, u2ds, xg, h: int, w: int, c: int):
            """Blocked unpool: one unpool_block per 128-lane channel
            block (vreg-aligned lane slices), assembled through the xg
            staging ref when there is more than one block."""
            nb, bs = _nblocks(c)
            for k in range(nb):
                gpb = gp[:, k * bs:(k + 1) * bs] if nb > 1 else gp
                r = unpool_block(gpb, fsrcs[k], scrs[k], u2ds[k], h, w,
                                 bs)
                if nb == 1:
                    return r
                xg[:, k * bs:(k + 1) * bs] = r
            return xg[...]

        def direct(li):
            """Metric gradient at collected layer li (p branch), with
            the 1/num_layers average folded in."""
            h, w, c = dims[li]
            n_half = h * w
            fval = stores[li - 1][...]
            p32 = fval[:n_half].astype(jnp.float32)
            t32 = fval[n_half:].astype(jnp.float32)
            mu_p, s_p, s_t = stats[li - 1]
            return inv_layers * _metric_direct_grad(
                p32, t32, mu_p, s_p, s_t, float(n_half * c))

        def relu_mask(li, g):
            n_half = dims[li][0] * dims[li][1]
            fp = stores[li - 1][: n_half]
            # compare in f32: v5e has no bf16 vector compare (probed)
            return jnp.where(fp.astype(jnp.float32) > 0, g, 0.0)

        h, w, _ = dims[5]
        g = relu_mask(5, direct(5))
        g = _conv_bwd_input(g, w9(4), h, w, dtype)          # at f5
        g = relu_mask(4, g + direct(4))
        g = _conv_bwd_input(g, w9(3), h, w, dtype)          # at pooled3
        h, w, c = dims[3]
        g = unpool(g, pf2, e2, u2, xg2, h, w, c)            # at f4
        g = relu_mask(3, g + direct(3))
        g = _conv_bwd_input(g, w9(2), h, w, dtype)          # at f3
        g = relu_mask(2, g + direct(2))
        g = _conv_bwd_input(g, w9(1), h, w, dtype)          # at pooled2
        h, w, c = dims[1]
        g = unpool(g, pf0, e0, u0, xg0, h, w, c)            # at f2
        g = relu_mask(1, g + direct(1))
        g = _conv_bwd_input(g, w9(0), h, w, dtype)          # at pooled1
        # f1-level unpool runs on the JOINT 128-lane layout (C1 = 64
        # lanes alone would put strided ops on a sub-128 base, which
        # Mosaic rejects): widen g with zero t-lanes, scatter both
        # branches (t lanes are dead weight the VPU carries for free),
        # then keep the p lanes.
        gj1[:, :C1] = g
        gj1[:, C1:] = jnp.zeros_like(g)
        gj = unpool(gj1[...], (f1f,), (e3_1j,), (u2d_1j,), None,
                    H, W, 2 * C1)                           # at f1 joint
        g = gj[:, :C1]

        # L1 direct metric grad + relu mask, chunked, straight to out.
        # The std-backprop projection a1 = sum(u * p) is GLOBAL over the
        # layer — accumulate it across chunks before the grad pass.
        def l1_a(b):
            p32, t32 = b[:, :C1], b[:, C1:]
            u = (2.0 / n1) * (p32 / (s_p1 + _EPS) - t32 / (s_t1 + _EPS))
            return jnp.sum(u * p32)

        a1 = l1_sums(l1_a)
        for k in range(l1_chunks):
            blk = f1f[k * csz:(k + 1) * csz, :]
            p32, t32 = blk[:, :C1], blk[:, C1:]
            d1 = inv_layers * _metric_direct_grad(p32, t32, mu_p1, s_p1,
                                                  s_t1, n1, a=a1)
            gk = g[k * csz:(k + 1) * csz, :] + d1
            gk = jnp.where(p32 > 0, gk, 0.0)
            g1_ref[0, k * csz:(k + 1) * csz, :] = gk.astype(g1_ref.dtype)

    return kernel


# --------------------------------------------------------------------------
# pallas_call wrapper
# --------------------------------------------------------------------------


def _const_spec(shape, space=pltpu.VMEM):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda b, _n=nd: (0,) * _n,
                        memory_space=space)


@functools.partial(jax.jit, static_argnames=("H", "W", "interpret",
                                             "l1_chunks", "with_grad"))
def _trunk_call(params, f1_both, H: int, W: int, interpret: bool = False,
                l1_chunks: int = 4, with_grad: bool = True):
    """Run the fused trunk kernel over the batch grid.

    f1_both: [B, H*W, 2*C1] (pred lanes then target lanes), bf16.
    Returns (m [B, 6] f32 per-layer per-sample means, g1 [B, H*W, C1]
    = d(mean_l m_l)/d f1_pred with the relu1 mask applied); g1 is None
    for the metrics-only variant (with_grad=False)."""
    dims, convs = _geometry(params, H, W)
    C1 = dims[0][2]
    B = f1_both.shape[0]
    dtype = f1_both.dtype

    operands = [f1_both]
    in_specs = [pl.BlockSpec((1, H * W, 2 * C1), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)]
    for name, _, _, _, _ in convs:
        k = params[name]["kernel"]
        w9 = jnp.asarray(k, dtype).reshape(9, k.shape[2], k.shape[3])
        bvec = jnp.asarray(params[name]["bias"], jnp.float32)[None, :]
        operands += [w9, bvec]
        in_specs += [_const_spec(w9.shape), _const_spec(bvec.shape)]

    d1, d3 = dims[1], dims[3]
    f32 = jnp.float32
    nb1, bs1 = _nblocks(d1[2])
    nb3, bs3 = _nblocks(d3[2])

    # Mirrors the unpack order in _make_kernel.kernel exactly.
    scratch = [
        pltpu.VMEM((H * W, 2 * C1), f32),                      # f1f
        pltpu.VMEM((H, W // 2, 2 * C1), f32),                  # p3_1
        pltpu.VMEM((2 * (H * W // 4), C1), f32),               # rs1
    ]
    # forward pool groups for the convs followed by a pool (0 and 2)
    for (dd, nb, bs) in ((d1, nb1, bs1), (d3, nb3, bs3)):
        rows = 2 * dd[0] * dd[1]
        scratch += [pltpu.VMEM((rows, bs), f32)] * nb          # pf blocks
        scratch += [pltpu.VMEM((2 * dd[0], dd[1] // 2, bs), f32)] * nb
        scratch += [pltpu.VMEM((rows // 4, dd[2]), f32)]       # xs
    if with_grad:
        for li in range(1, 6):
            rows = 2 * dims[li][0] * dims[li][1]
            scratch += [pltpu.VMEM((rows, dims[li][2]), dtype)]  # stores
        scratch += [
            pltpu.VMEM((H * W // 4, 2 * C1), f32),             # gj1
            pltpu.VMEM((H, W // 2, 2 * C1), f32),              # e3_1j
            pltpu.VMEM((H * W, 2 * C1), f32),                  # u2d_1j
        ]
        for (dd, nb, bs) in ((d1, nb1, bs1), (d3, nb3, bs3)):
            hw = dd[0] * dd[1]
            scratch += [pltpu.VMEM((hw, bs), f32)] * nb        # u blocks
            scratch += [pltpu.VMEM((dd[0], dd[1] // 2, bs), f32)] * nb
            if nb > 1:
                scratch += [pltpu.VMEM((hw, dd[2]), f32)]      # xg

    m_spec = pl.BlockSpec((1, 1, 8), lambda b: (b, 0, 0),
                          memory_space=pltpu.SMEM)
    m_shape = jax.ShapeDtypeStruct((B, 1, 8), jnp.float32)
    out_specs = [m_spec]
    out_shape = [m_shape]
    if with_grad:
        out_specs.append(pl.BlockSpec((1, H * W, C1), lambda b: (b, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, H * W, C1), dtype))

    out = pl.pallas_call(
        _make_kernel(H, W, dims, convs, dtype, l1_chunks, with_grad),
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    m = out[0][:, 0, :_N_LAYERS]
    return m, (out[1] if with_grad else None)


# --------------------------------------------------------------------------
# XLA-side conv1 + custom_vjp distance
# --------------------------------------------------------------------------


def _conv1_both(params, pred, target, dtype):
    """conv1 on both branches as ONE grouped conv (input channels
    (pred, target), feature_group_count=2) -> [B, H*W, 2*C1] with exactly
    128 lanes at the flagship width (no HBM tile padding)."""
    k1 = jnp.asarray(params["conv1"]["kernel"], dtype)       # [3,3,1,C1]
    b1 = jnp.asarray(params["conv1"]["bias"], jnp.float32)
    x2 = jnp.concatenate([pred, target], axis=-1).astype(dtype)
    k2 = jnp.concatenate([k1, k1], axis=-1)                  # [3,3,1,2C1]
    y = jax.lax.conv_general_dilated(
        x2, k2, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=2,
        preferred_element_type=jnp.float32)
    y = y + jnp.concatenate([b1, b1])
    f = jnp.maximum(y, 0).astype(dtype)
    B, H, W, C2 = f.shape
    return f.reshape(B, H * W, C2)


def _conv1_input_grad(params, g1_img, dtype):
    """d pred from the (relu-masked) gradient at conv1's output: conv
    with the spatially flipped, io-transposed kernel."""
    k1 = jnp.asarray(params["conv1"]["kernel"], dtype)       # [3,3,1,C1]
    kT = jnp.flip(k1, (0, 1)).transpose(0, 1, 3, 2)          # [3,3,C1,1]
    return jax.lax.conv_general_dilated(
        g1_img.astype(dtype), kT, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_vggish_distance(params, pred: jax.Array, target: jax.Array,
                          weights: jax.Array, dtype=jnp.bfloat16,
                          interpret: bool = False) -> jax.Array:
    """losses.vggish.vggish_feature_distance, fused: the whole trunk
    (minus conv1, see module docstring) in one Pallas kernel per sample,
    forward and pred-side input gradient together.

    pred/target: [B, H, W, 1]; weights: [B] validity vector.  Gradients
    flow to `pred` (and `weights`); `target` and `params` receive ZERO
    cotangents by design (the training style target is data and the
    trunk is frozen — use the XLA impl for anything else)."""
    loss, _ = _fvd_fwd(params, pred, target, weights, dtype, interpret)
    return loss


def _fvd_fwd(params, pred, target, weights, dtype, interpret):
    B, H, W, _ = pred.shape
    f1 = _conv1_both(params, pred, target, dtype)
    m, g1 = _trunk_call(params, f1, H, W, interpret=interpret)
    m_bar = jnp.mean(m, axis=1)                              # [B]
    w = weights.astype(jnp.float32)
    wsum = jnp.sum(w)
    loss = jnp.sum(m_bar * w) / wsum
    return loss, (params, g1, m_bar, w, wsum, pred.shape)


def _fvd_bwd(dtype, interpret, res, g):
    del interpret
    params, g1, m_bar, w, wsum, pshape = res
    B, H, W, _ = pshape
    scale = (g * w / wsum)[:, None, None, None]
    g1_img = g1.reshape(B, H, W, -1).astype(jnp.float32) * scale
    d_pred = _conv1_input_grad(params, g1_img, dtype).astype(jnp.float32)
    d_target = jnp.zeros(pshape, jnp.float32)
    d_w = g * (m_bar * wsum - jnp.sum(m_bar * w)) / (wsum ** 2)
    d_params = jax.tree_util.tree_map(jnp.zeros_like, params)
    return d_params, d_pred, d_target, d_w


fused_vggish_distance.defvjp(_fvd_fwd, _fvd_bwd)


def fused_vggish_distance_value(params, pred: jax.Array,
                                target: jax.Array, weights: jax.Array,
                                dtype=jnp.bfloat16,
                                interpret: bool = False) -> jax.Array:
    """Metrics-only fused trunk: the forward VGGish distance with NO
    gradient path (the kernel skips the whole backward chain and its
    scratch).  For the trainer's parity default
    ``style_loss_stop_gradient=True`` (ref: loss.py:78 torch.no_grad),
    where the XLA path's backward is DCE'd anyway — this is the fused
    equivalent.  Differentiating through this raises; use
    ``fused_vggish_distance``."""
    B, H, W, _ = pred.shape
    f1 = _conv1_both(params, pred, target, dtype)
    m, _ = _trunk_call(params, f1, H, W, interpret=interpret,
                       with_grad=False)
    w = weights.astype(jnp.float32)
    return jnp.sum(jnp.mean(m, axis=1) * w) / jnp.sum(w)


def fused_supported(params, pred: jax.Array) -> bool:
    """True when the fused kernel's geometry constraints hold for this
    (params, input) pair: single input channel, H and W divisible by 8,
    and the joint conv1 lane width 2*C1 a multiple of 128 (no padding
    waste in the boundary array)."""
    try:
        k1 = params["conv1"]["kernel"]
    except (KeyError, TypeError):
        return False
    if pred.ndim != 4 or pred.shape[3] != 1 or k1.shape[2] != 1:
        return False
    H, W = pred.shape[1], pred.shape[2]
    if H % 8 or W % 8 or (2 * k1.shape[3]) % 128:
        return False
    try:
        _geometry(params, H, W)
    except (KeyError, ValueError):
        return False
    return True
