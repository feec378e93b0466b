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


def vggish_feature_distance(module: VGGishFeatures, params,
                            predicted: jax.Array,
                            target: jax.Array,
                            weights=None) -> jax.Array:
    """Std-normalized multi-layer MSE (ref: loss.py:92-101).

    Matches the reference's arithmetic: each feature map is divided by its
    per-sample std over (H, W, C) (+1e-8), then MSE, averaged over layers.
    (The reference additionally extracts features under torch.no_grad; that
    gradient-blocking behavior is applied by the trainers via
    TrainConfig.style_loss_stop_gradient, see losses/feature.py.)
    Gradients flow into `predicted`/`target` but never into `params`
    (the reference wraps extraction in no_grad + frozen weights; here the
    params are stop_gradient'ed by the caller).
    """
    from music_style_transfer_ldm_tpu.losses.basic import weighted_batch_mean

    feats_p = module.apply({"params": params}, predicted)
    feats_t = module.apply({"params": params}, target)
    total = jnp.float32(0.0)
    for p, t in zip(feats_p, feats_t):
        axes = (1, 2, 3)  # per-sample over H, W, C (ref dims [1,2,3] in NCHW)
        p = p / (jnp.std(p, axis=axes, keepdims=True) + 1e-8)
        t = t / (jnp.std(t, axis=axes, keepdims=True) + 1e-8)
        total = total + weighted_batch_mean((p - t) ** 2, weights)
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
