"""VGGish perceptual feature loss in flax.

The reference downloads harritaylor/torchvggish at runtime and uses only its
conv trunk ``vggish.features`` (ref: models/loss.py:52-101): per-ReLU feature
maps of both inputs are collected, std-normalized per sample, and compared
with MSE averaged over layers.

This environment has no network access, so the trunk is re-implemented as a
flax module with the exact VGGish topology (VGG-ish conv/pool stack used by
AudioSet VGGish), plus ``convert_torchvggish_state_dict`` to transplant real
pretrained weights from a local torchvggish ``.pth`` when one is provided.
Without pretrained weights, a fixed-seed random trunk is used — random VGG
features are a well-established perceptual metric family, and the loss
*semantics* (normalization + layer averaging) are identical either way.
"""

from __future__ import annotations

from typing import Any, Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# (layer_name, out_channels, followed_by_pool)
_VGGISH_CONVS = (
    ("conv1", 64, True),
    ("conv2", 128, True),
    ("conv3_1", 256, False),
    ("conv3_2", 256, True),
    ("conv4_1", 512, False),
    ("conv4_2", 512, True),
)

# torchvggish Sequential indices of the Conv2d layers, in order
# (features.0, .3, .6, .8, .11, .13).
_TORCH_CONV_INDICES = (0, 3, 6, 8, 11, 13)


class VGGishFeatures(nn.Module):
    """The VGGish conv trunk; returns all post-ReLU feature maps (NHWC)."""

    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        feats = []
        x = x.astype(self.dtype)
        for name, ch, pool in _VGGISH_CONVS:
            x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), name=name,
                        dtype=self.dtype, param_dtype=self.param_dtype)(x)
            x = nn.relu(x)
            feats.append(x)  # collect after every ReLU (ref: loss.py:87-90)
            if pool:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class VGGishFeatureLoss:
    """Frozen perceptual distance (ref: models/loss.py:52-101).

    Holds its own (frozen) parameters; call like a function on a pair of
    NHWC images.  ``params`` may come from ``convert_torchvggish_state_dict``
    or the fixed-seed random init.
    """

    def __init__(self, params=None, seed: int = 0,
                 input_shape=(1, 128, 128, 1)):
        self.module = VGGishFeatures()
        if params is None:
            params = self.module.init(
                jax.random.PRNGKey(seed),
                jnp.zeros(input_shape, jnp.float32))["params"]
        self.params = jax.lax.stop_gradient(params)

    def __call__(self, predicted: jax.Array, target: jax.Array,
                 weights=None) -> jax.Array:
        return vggish_feature_distance(self.module, self.params, predicted,
                                       target, weights)


_NM_EPS = 1e-8


@jax.custom_vjp
def normalized_mse(p: jax.Array, t: jax.Array,
                   weights: jax.Array) -> jax.Array:
    """One layer of the std-normalized feature MSE (ref: loss.py:92-101)
    with a hand-derived closed-form backward:

        p_hat = p/(s_p+eps),   u = g * w_b * 2 (p_hat - t_hat) / n
        dL/dp = u/(s_p+eps) - (sum u p) (p - mu_p) / ((s_p+eps)^2 n s_p)

    (and symmetrically for t; stats in f32 regardless of feature dtype;
    weights is the [B] validity vector — pass ones for the plain mean,
    see basic.weighted_batch_mean).  Measured impact r03: the full train
    step went 25.3 -> 24.4 ms (+4% throughput) — the explicit residual
    list and single-pass backward give XLA a slightly leaner graph than
    autodiff, though most of the layer's cost is irreducible HBM traffic
    (docs/PERFORMANCE.md wall analysis).
    """
    loss, _ = _nm_fwd(p, t, weights)
    return loss


def _nm_stats(x32, axes):
    mu = jnp.mean(x32, axis=axes, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=axes, keepdims=True)
    s = jnp.sqrt(var)
    return mu, s


def _nm_fwd(p, t, weights):
    axes = (1, 2, 3)
    p32, t32 = p.astype(jnp.float32), t.astype(jnp.float32)
    mu_p, s_p = _nm_stats(p32, axes)
    mu_t, s_t = _nm_stats(t32, axes)
    ph = p32 / (s_p + _NM_EPS)
    th = t32 / (s_t + _NM_EPS)
    m = jnp.mean((ph - th) ** 2, axis=axes)                       # [B]
    w = weights.astype(jnp.float32)
    wsum = jnp.sum(w)
    loss = jnp.sum(m * w) / wsum
    return loss, (p, t, mu_p, s_p, mu_t, s_t, m, w, wsum)


def _nm_bwd(res, g):
    p, t, mu_p, s_p, mu_t, s_t, m, w, wsum = res
    axes = (1, 2, 3)
    n = float(np.prod(p.shape[1:]))
    p32, t32 = p.astype(jnp.float32), t.astype(jnp.float32)
    ph = p32 / (s_p + _NM_EPS)
    th = t32 / (s_t + _NM_EPS)
    wn = (g * w / wsum)[:, None, None, None]
    u = (2.0 / n) * wn * (ph - th)
    a = jnp.sum(u * p32, axis=axes, keepdims=True)
    dp = u / (s_p + _NM_EPS) - a * (p32 - mu_p) / (
        (s_p + _NM_EPS) ** 2 * n * s_p)
    b = jnp.sum(u * t32, axis=axes, keepdims=True)
    dt = -u / (s_t + _NM_EPS) + b * (t32 - mu_t) / (
        (s_t + _NM_EPS) ** 2 * n * s_t)
    # dL/dw_b = g * (m_b * wsum - sum(m w)) / wsum^2 (quotient rule).
    dw = g * (m * wsum - jnp.sum(m * w)) / (wsum ** 2)
    return dp.astype(p.dtype), dt.astype(t.dtype), dw.astype(jnp.float32)


normalized_mse.defvjp(_nm_fwd, _nm_bwd)


def vggish_feature_distance(module: VGGishFeatures, params,
                            predicted: jax.Array,
                            target: jax.Array,
                            weights=None,
                            impl: str = "auto") -> jax.Array:
    """Std-normalized multi-layer MSE (ref: loss.py:92-101).

    Matches the reference's arithmetic: each feature map is divided by its
    per-sample std over (H, W, C) (+1e-8), then MSE, averaged over layers
    (normalization statistics in f32).

    impl selects the layer implementation: 'xla' (default; the
    closed-form-VJP jnp version above) or 'pallas' (the single-HBM-read
    TPU kernel, ops/pallas/normalized_mse.py).  Measured r03 at batch
    128: XLA 18.5 ms vs Pallas 28.5 ms for the full trunk fwd+grad — XLA
    fuses the normalization into the surrounding conv pipeline, while
    the opaque kernels force extra HBM round trips, so 'auto' = 'xla'
    and the kernel is kept as a parity-tested alternate (same judgement
    call as ops/pallas/fused_mel_image.py).

    (The reference additionally extracts features under torch.no_grad; that
    gradient-blocking behavior is applied by the trainers via
    TrainConfig.style_loss_stop_gradient, see losses/feature.py.)
    Gradients flow into `predicted`/`target` but never into `params`
    (the reference wraps extraction in no_grad + frozen weights; here the
    params are stop_gradient'ed by the caller).
    """
    if weights is None:
        weights = jnp.ones((predicted.shape[0],), jnp.float32)
    if impl == "auto":
        impl = "xla"
    if impl in ("fused", "fused-value"):
        # Whole-trunk Pallas kernel (ops/pallas/fused_trunk.py): every
        # conv, pool and metric in one VMEM residency per sample.
        # 'fused' carries the pred-side gradient; 'fused-value' is
        # metrics-only (for stop-gradient callers).  Single-device only
        # (opaque to GSPMD) and VGGish-geometry-gated — callers check
        # ops.pallas.fused_trunk.fused_supported first.
        from music_style_transfer_ldm_tpu.ops.pallas.fused_trunk import (
            fused_vggish_distance, fused_vggish_distance_value,
        )
        interp = jax.default_backend() == "cpu"
        dt = jnp.dtype(module.dtype)
        fn = (fused_vggish_distance if impl == "fused"
              else fused_vggish_distance_value)
        return fn(params, predicted, target, weights, dt, interp)
    feats_p = module.apply({"params": params}, predicted)
    feats_t = module.apply({"params": params}, target)
    if impl == "pallas":
        from music_style_transfer_ldm_tpu.ops.pallas.normalized_mse import (
            normalized_mse_pallas,
        )
        interp = jax.default_backend() == "cpu"
        layer = lambda p, t, w: normalized_mse_pallas(p, t, w, interp)
    else:
        layer = normalized_mse
    total = jnp.float32(0.0)
    for p, t in zip(feats_p, feats_t):
        total = total + layer(p, t, weights)
    return total / len(feats_p)


def convert_torchvggish_state_dict(state_dict: Dict[str, Any]):
    """Transplant torchvggish ``vggish.features`` weights into flax params.

    Accepts a state dict with keys like ``features.0.weight`` (torch OIHW)
    and returns the flax params tree (HWIO kernels, NHWC).  One-time
    conversion; run on host.
    """
    params = {}
    for (name, _, _), idx in zip(_VGGISH_CONVS, _TORCH_CONV_INDICES):
        w = np.asarray(state_dict[f"features.{idx}.weight"])  # [O, I, H, W]
        b = np.asarray(state_dict[f"features.{idx}.bias"])
        kernel = np.transpose(w, (2, 3, 1, 0))  # -> [H, W, I, O]
        params[name] = {"kernel": jnp.asarray(kernel, jnp.float32),
                        "bias": jnp.asarray(b, jnp.float32)}
    return params
