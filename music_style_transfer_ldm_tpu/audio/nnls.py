"""Batched non-negative least squares for mel inversion.

``librosa.feature.inverse.mel_to_audio`` (ref: data/audio_processor.py:99)
first solves  min_{X>=0} ||B X - M||_F^2  for the linear spectrogram X given
the mel filterbank B.  librosa uses a host-side scipy NNLS / L-BFGS-B; here
we use accelerated projected gradient (FISTA) — every iteration is two
matmuls that ride the MXU and the whole solve is batched over
(batch, time) at once, so it stays on device inside the jitted pipeline.

The Lipschitz constant sigma_max(B)^2 and the pseudo-inverse warm start are
computed once in numpy from the static filterbank.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


_STATICS_CACHE: dict = {}


def _statics_for(B_np: np.ndarray):
    """(lipschitz, pinv) for a filterbank, cached by array identity/content."""
    h = (B_np.shape, B_np.tobytes()[:256], float(B_np.sum()))
    if h not in _STATICS_CACHE:
        L = float(np.linalg.norm(B_np, 2) ** 2)
        pinv = np.linalg.pinv(B_np).astype(np.float32)
        _STATICS_CACHE[h] = (L, pinv)
    return _STATICS_CACHE[h]


@functools.partial(jax.jit, static_argnames=("n_iter",))
def _nnls_fista(B: jax.Array, M: jax.Array, x0: jax.Array, inv_L: float,
                n_iter: int) -> jax.Array:
    def gradient(y):
        resid = jnp.einsum("mf,...ft->...mt", B, y,
                           preferred_element_type=jnp.float32) - M
        return jnp.einsum("mf,...mt->...ft", B, resid,
                          preferred_element_type=jnp.float32)

    def step(carry, _):
        x, y, t = carry
        x_new = jnp.maximum(0.0, y - inv_L * gradient(y))
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = x_new + ((t - 1.0) / t_new) * (x_new - x)
        return (x_new, y_new, t_new), None

    (x, _, _), _ = jax.lax.scan(step, (x0, x0, jnp.float32(1.0)), None,
                                length=n_iter)
    return x


def nnls(B: jax.Array, M: jax.Array, n_iter: int = 64) -> jax.Array:
    """Solve min_{X>=0} ||B X - M||_F^2.

    B: [n_mels, n_freq] filterbank; M: [..., n_mels, T] mel power.
    Returns X: [..., n_freq, T].
    """
    B_np = np.asarray(B, np.float32)
    L, pinv = _statics_for(B_np)
    x0 = jnp.maximum(
        0.0, jnp.einsum("fm,...mt->...ft", jnp.asarray(pinv), M,
                        preferred_element_type=jnp.float32))
    return _nnls_fista(jnp.asarray(B_np), M.astype(jnp.float32), x0,
                       1.0 / L, n_iter)
