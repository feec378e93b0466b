"""Scalar training losses (ref: models/loss.py).

All pure functions of arrays -> scalar float32, composable under jit/grad.
The perceptual term takes the feature-loss callable explicitly (the
reference's dispatcher + per-call LPIPS instantiation, loss.py:6-30, is a
quirk we replace with explicit dependency injection; behavior — a frozen
deep-feature distance weighted 0.1 — is preserved).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def weighted_batch_mean(per_elem: jax.Array,
                        weights: Optional[jax.Array]) -> jax.Array:
    """Mean of elementwise values, renormalized by per-sample weights.

    ``weights`` is a [B] validity vector (1 for real rows, 0 for rows the
    data-parallel padder appended, see parallel/sharding.py); the result
    equals the plain mean over the unpadded batch.  weights=None is the
    plain global mean.
    """
    per_elem = per_elem.astype(jnp.float32)
    if weights is None:
        return jnp.mean(per_elem)
    per_sample = jnp.mean(per_elem, axis=tuple(range(1, per_elem.ndim)))
    w = weights.astype(jnp.float32)
    return jnp.sum(per_sample * w) / jnp.sum(w)


def mse(a: jax.Array, b: jax.Array,
        weights: Optional[jax.Array] = None) -> jax.Array:
    return weighted_batch_mean(
        (a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2, weights)


def kl_regularization_loss(latent: jax.Array,
                           weights: Optional[jax.Array] = None) -> jax.Array:
    """mean(0.5 * (z^2 - 1 - log(z^2 + 1e-8))) — pushes latent activations
    toward unit variance (ref: loss.py:31-32)."""
    z2 = latent.astype(jnp.float32) ** 2
    return weighted_batch_mean(0.5 * (z2 - 1.0 - jnp.log(z2 + 1e-8)), weights)


def diffusion_loss(noise_pred: jax.Array, noise_target: jax.Array,
                   weights: Optional[jax.Array] = None) -> jax.Array:
    """MSE(eps_hat, eps) (ref: loss.py:48-49)."""
    return mse(noise_pred, noise_target, weights)


def compression_loss(original: jax.Array, reconstructed: jax.Array,
                     latent: jax.Array,
                     feature_loss: Optional[Callable] = None,
                     perceptual_weight: float = 0.1,
                     kl_weight: float = 0.01,
                     weights: Optional[jax.Array] = None) -> jax.Array:
    """MSE + 0.1*perceptual + 0.01*KL (ref: loss.py:34-45).

    ``feature_loss(a, b, weights)`` must accept the validity weights so the
    perceptual term is renormalized the same way (see losses/feature.py)."""
    loss = mse(reconstructed, original, weights)
    if feature_loss is not None:
        loss = loss + perceptual_weight * feature_loss(original,
                                                       reconstructed, weights)
    return loss + kl_weight * kl_regularization_loss(latent, weights)


def style_loss(reconstructed: jax.Array, style_spec: jax.Array,
               feature_loss: Callable,
               weights: Optional[jax.Array] = None) -> jax.Array:
    """Perceptual distance between output and style image
    (ref: loss.py:104-106)."""
    return feature_loss(reconstructed, style_spec, weights)


def perceptual_loss(original: jax.Array, reconstructed: jax.Array,
                    feature_extractor_type: str = "vggish",
                    feature_extractor: Optional[Callable] = None
                    ) -> jax.Array:
    """Dispatcher mirroring the reference API (ref: loss.py:24-30):
    'vggish' requires the provided extractor; 'lpips' builds/uses an LPIPS
    metric (built once and cached, unlike the reference's per-call
    construction, loss.py:10)."""
    if feature_extractor_type == "vggish":
        if feature_extractor is None:
            raise ValueError("Feature extractor must be provided for VGGish")
        return feature_extractor(original, reconstructed)
    if feature_extractor is not None:
        return feature_extractor(original, reconstructed)
    from music_style_transfer_ldm_tpu.losses.lpips import LPIPSLoss
    global _DEFAULT_LPIPS
    if _DEFAULT_LPIPS is None:
        _DEFAULT_LPIPS = LPIPSLoss(input_shape=(1,) + original.shape[1:])
    return _DEFAULT_LPIPS(original, reconstructed)


_DEFAULT_LPIPS = None


def gram_matrix(features: jax.Array) -> jax.Array:
    """Classic Gram matrix over NHWC features, [B, C, C] normalized by
    C*H*W (ref: loss.py:108-112 — defined there but unused; kept for API
    parity)."""
    B, H, W, C = features.shape
    f = features.reshape(B, H * W, C).astype(jnp.float32)
    return jnp.einsum("bnc,bnd->bcd", f, f,
                      preferred_element_type=jnp.float32) / (C * H * W)
