"""Feature-metric factory used by the trainers.

Reference semantics being reproduced (ref: models/loss.py + config.py:17):

* the COMPRESSION loss's perceptual term goes through the dispatcher with
  ``compression_feature_extractor`` — shipped default ``'lpips'`` — and
  gradients DO flow through it (LPIPS is invoked outside any no_grad);
* the STYLE loss always uses VGGishFeatureLoss, whose feature extraction
  runs under ``torch.no_grad`` (loss.py:78) — so with reference defaults
  the weight-3.0 style term contributes a VALUE but ZERO gradient.  That
  quirk is reproduced via ``stop_gradient`` behind
  ``TrainConfig.style_loss_stop_gradient`` (default True = parity; set
  False to let the style term actually train — plausibly why the
  reference's style loss stayed flat, report conclusion).

Without network access no pretrained LPIPS/VGGish weights exist; both
metrics default to fixed-seed random trunks (random deep features remain a
valid perceptual metric family) and accept transplanted torch weights via
their converters.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from music_style_transfer_ldm_tpu.losses.lpips import LPIPS
from music_style_transfer_ldm_tpu.losses.vggish import (
    VGGishFeatures, vggish_feature_distance,
)


@dataclasses.dataclass
class FeatureMetric:
    kind: str
    module: Any
    params: Any

    def init(self, seed: int = 0, input_shape=(1, 128, 128, 1)) -> None:
        if self.params is not None:
            return
        x = jnp.zeros(input_shape, jnp.float32)
        if self.kind == "lpips":
            self.params = self.module.init(jax.random.PRNGKey(seed), x,
                                           x)["params"]
        else:
            self.params = self.module.init(jax.random.PRNGKey(seed),
                                           x)["params"]

    def distance(self, params, a: jax.Array, b: jax.Array,
                 weights=None, impl: str = "auto") -> jax.Array:
        """Pure function of (params, a, b[, weights]) — safe to close over
        the module only (params are passed through the jit boundary
        explicitly).  ``weights`` renormalizes over padded batch rows.
        impl ('auto'|'pallas'|'xla') selects the vggish normalized-MSE
        layer implementation (see losses/vggish.py); meshed callers must
        pass 'xla' (the Pallas kernel is opaque to GSPMD)."""
        if self.kind == "lpips":
            return self.module.apply({"params": params}, a, b, weights)
        return vggish_feature_distance(self.module, params, a, b, weights,
                                       impl=impl)


def build_feature_metric(kind: str, dtype=jnp.float32,
                         params=None) -> FeatureMetric:
    if kind == "lpips":
        return FeatureMetric("lpips", LPIPS(dtype=dtype), params)
    if kind == "vggish":
        return FeatureMetric("vggish", VGGishFeatures(dtype=dtype), params)
    raise ValueError(f"unknown feature extractor {kind!r}")
