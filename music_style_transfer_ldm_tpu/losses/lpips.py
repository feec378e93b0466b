"""LPIPS perceptual distance (AlexNet backbone) in flax.

The reference's AE compression loss routes through LPIPS when
``compression_feature_extractor == 'lpips'`` (the shipped default,
ref: models/config.py:17, models/loss.py:6-30).  This module provides the
same metric structure: AlexNet conv features at relu1..relu5,
channel-unit-normalized, squared difference, learned 1x1 linear heads,
spatial mean, layer sum.

No pretrained AlexNet/LPIPS weights are downloadable in an air-gapped
environment, so the default initialization is a fixed seed (random deep
features remain a meaningful perceptual metric family);
``convert_torch_lpips_state_dict`` transplants real weights from a local
torch `lpips` state dict when available.  Grayscale inputs are replicated
to 3 channels; inputs in [0, 1] are shifted to LPIPS's [-1, 1] convention
internally (the reference double-shifts — a quirk not replicated, see
loss.py:14-18).
"""

from __future__ import annotations

from typing import Any, Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# (name, out_channels, kernel, stride, padding, pool_before)
_ALEX_CONVS = (
    ("conv1", 64, 11, 4, 2, False),
    ("conv2", 192, 5, 1, 2, True),
    ("conv3", 384, 3, 1, 1, True),
    ("conv4", 256, 3, 1, 1, False),
    ("conv5", 256, 3, 1, 1, False),
)


class AlexNetFeatures(nn.Module):
    """AlexNet conv trunk returning the five post-ReLU feature maps."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        feats = []
        x = x.astype(self.dtype)
        for name, ch, k, s, p, pool in _ALEX_CONVS:
            if pool:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
            x = nn.Conv(ch, (k, k), strides=(s, s),
                        padding=((p, p), (p, p)), name=name,
                        dtype=self.dtype)(x)
            x = nn.relu(x)
            feats.append(x)
        return feats


class LPIPS(nn.Module):
    """Full LPIPS head: normalize, diff^2, 1x1 linear, mean, sum."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array,
                 weights=None) -> jax.Array:
        from music_style_transfer_ldm_tpu.losses.basic import (
            weighted_batch_mean,
        )

        # [0,1] (or [-1,1]) grayscale/NHWC -> 3-channel [-1,1].
        def prep(x):
            x = x.astype(jnp.float32)
            if x.shape[-1] == 1:
                x = jnp.repeat(x, 3, axis=-1)
            return 2.0 * x - 1.0

        trunk = AlexNetFeatures(dtype=self.dtype, name="alex")
        fa = trunk(prep(a))
        fb = trunk(prep(b))
        total = jnp.float32(0.0)
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / (jnp.linalg.norm(xa, axis=-1, keepdims=True) + 1e-10)
            nb = xb / (jnp.linalg.norm(xb, axis=-1, keepdims=True) + 1e-10)
            diff = (na - nb) ** 2
            head = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{i}",
                           dtype=self.dtype,
                           kernel_init=nn.initializers.uniform(scale=0.1))
            total = total + weighted_batch_mean(
                head(diff.astype(self.dtype)).astype(jnp.float32), weights)
        return total


class LPIPSLoss:
    """Frozen LPIPS callable (counterpart of the reference's per-call
    ``LPIPS(net='alex')`` construction, loss.py:10 — built once here)."""

    def __init__(self, params=None, seed: int = 0,
                 input_shape=(1, 128, 128, 1)):
        self.module = LPIPS()
        if params is None:
            x = jnp.zeros(input_shape, jnp.float32)
            params = self.module.init(jax.random.PRNGKey(seed), x,
                                      x)["params"]
        self.params = jax.lax.stop_gradient(params)

    def __call__(self, a: jax.Array, b: jax.Array,
                 weights=None) -> jax.Array:
        return self.module.apply({"params": self.params}, a, b, weights)


def convert_torch_lpips_state_dict(state_dict: Dict[str, Any]):
    """Transplant a torch `lpips.LPIPS(net='alex')` state dict.

    Expects keys like ``net.slice1.0.weight`` (torchvision AlexNet layout)
    and ``lin0.model.1.weight`` for the linear heads.
    """
    # torchvision alexnet conv indices inside lpips slices:
    # slice1: 0 (conv1); slice2: 3 (conv2); slice3: 6 (conv3);
    # slice4: 8 (conv4); slice5: 10 (conv5)
    conv_keys = [("conv1", "net.slice1.0"), ("conv2", "net.slice2.3"),
                 ("conv3", "net.slice3.6"), ("conv4", "net.slice4.8"),
                 ("conv5", "net.slice5.10")]
    params: Dict[str, Any] = {"alex": {}}
    for name, tkey in conv_keys:
        w = np.asarray(state_dict[f"{tkey}.weight"])  # OIHW
        b = np.asarray(state_dict[f"{tkey}.bias"])
        params["alex"][name] = {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "bias": jnp.asarray(b)}
    for i in range(5):
        w = np.asarray(state_dict[f"lin{i}.model.1.weight"])  # [1, C, 1, 1]
        params[f"lin{i}"] = {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}
    return params
