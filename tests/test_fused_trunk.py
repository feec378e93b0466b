"""Fused whole-trunk VGGish kernel (ops/pallas/fused_trunk.py) vs the XLA
reference path (losses/vggish.py), interpret mode on CPU.

The kernel reproduces the reference style metric semantics
(ref: models/loss.py:52-101): per-ReLU feature maps, per-sample
std-normalization (+1e-8), MSE averaged over 6 layers — plus the
hand-derived pred-side input gradient.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from music_style_transfer_ldm_tpu.losses.vggish import (
    VGGishFeatures, vggish_feature_distance,
)
from music_style_transfer_ldm_tpu.ops.pallas.fused_trunk import (
    fused_supported, fused_vggish_distance, fused_vggish_distance_value,
)

EPS = 1e-8
NAMES = ("conv1", "conv2", "conv3_1", "conv3_2", "conv4_1", "conv4_2")
WIDTHS = (8, 16, 32, 32, 64, 64)
POOL_AFTER = (True, True, False, True, False, False)


@functools.lru_cache(maxsize=4)
def small_params(seed=0):
    key = jax.random.PRNGKey(seed)
    params = {}
    cin = 1
    for name, cout in zip(NAMES, WIDTHS):
        key, k1, k2 = jax.random.split(key, 3)
        params[name] = {
            "kernel": jax.random.normal(k1, (3, 3, cin, cout),
                                        jnp.float32) * 0.2,
            "bias": jax.random.normal(k2, (cout,), jnp.float32) * 0.05,
        }
        cin = cout
    return params


def xla_small_distance(params, pred, target, weights, dt):
    """Reference semantics with the small trunk (same math as
    losses/vggish.py vggish_feature_distance, param-dict driven)."""
    def feats(x):
        out = []
        x = x.astype(dt)
        for name, pool in zip(NAMES, POOL_AFTER):
            k = params[name]["kernel"].astype(dt)
            b = params[name]["bias"].astype(dt)
            x = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
            x = nn.relu(x)
            out.append(x)
            if pool:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return out

    fp, ft = feats(pred), feats(target)
    w = weights.astype(jnp.float32)
    total = jnp.float32(0.0)
    for p, t in zip(fp, ft):
        p32, t32 = p.astype(jnp.float32), t.astype(jnp.float32)
        axes = (1, 2, 3)
        s_p = jnp.std(p32, axis=axes, keepdims=True)
        s_t = jnp.std(t32, axis=axes, keepdims=True)
        d = p32 / (s_p + EPS) - t32 / (s_t + EPS)
        m = jnp.mean(d * d, axis=axes)
        total = total + jnp.sum(m * w) / jnp.sum(w)
    return total / len(fp)


def make_inputs(H, W, B=3, seed=7):
    kp, kt = jax.random.split(jax.random.PRNGKey(seed))
    pred = jax.random.uniform(kp, (B, H, W, 1), jnp.float32)
    target = jax.random.uniform(kt, (B, H, W, 1), jnp.float32)
    weights = jnp.asarray([1.0] * (B - 1) + [0.0], jnp.float32)
    return pred, target, weights


@pytest.mark.parametrize("H,W", [(16, 16), (24, 16)])
def test_f32_value_and_grad_parity(H, W):
    params = small_params()
    pred, target, weights = make_inputs(H, W)
    dt = jnp.float32

    ref = xla_small_distance(params, pred, target, weights, dt)
    got = fused_vggish_distance(params, pred, target, weights, dt, True)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)

    gref = jax.grad(lambda p: xla_small_distance(params, p, target,
                                                 weights, dt))(pred)
    ggot = jax.grad(lambda p: fused_vggish_distance(
        params, p, target, weights, dt, True))(pred)
    gr, gg = np.asarray(gref), np.asarray(ggot)
    assert np.abs(gg - gr).max() / (np.abs(gr).max() + 1e-12) < 1e-4
    # the zero-weight sample gets an exactly zero gradient
    np.testing.assert_array_equal(gg[-1], 0.0)


def test_weights_grad_parity():
    params = small_params()
    pred, target, weights = make_inputs(16, 16)
    dt = jnp.float32
    wref = jax.grad(lambda w: xla_small_distance(params, pred, target,
                                                 w, dt))(weights)
    wgot = jax.grad(lambda w: fused_vggish_distance(
        params, pred, target, w, dt, True))(weights)
    np.testing.assert_allclose(np.asarray(wgot), np.asarray(wref),
                               rtol=1e-4, atol=1e-7)


def test_target_and_params_cotangents_are_zero_by_design():
    params = small_params()
    pred, target, weights = make_inputs(16, 16)
    dt = jnp.float32
    gt = jax.grad(lambda t: fused_vggish_distance(
        params, pred, t, weights, dt, True))(target)
    np.testing.assert_array_equal(np.asarray(gt), 0.0)
    gp = jax.grad(lambda pr: fused_vggish_distance(
        pr, pred, target, weights, dt, True))(params)
    for leaf in jax.tree_util.tree_leaves(gp):
        np.testing.assert_array_equal(np.asarray(leaf), 0.0)


def test_bf16_tracks_the_f32_oracle_as_well_as_xla_bf16():
    """bf16 grads differ from bf16-XLA pointwise (different rounding
    points, pool-tie routing); the correctness bar is distance to the
    f32 oracle, which must be comparable to the XLA bf16 path's."""
    params = small_params()
    pred, target, weights = make_inputs(16, 16)
    g32 = np.asarray(jax.grad(lambda p: xla_small_distance(
        params, p, target, weights, jnp.float32))(pred))
    gx = np.asarray(jax.grad(lambda p: xla_small_distance(
        params, p, target, weights, jnp.bfloat16))(pred))
    gf = np.asarray(jax.grad(lambda p: fused_vggish_distance(
        params, p, target, weights, jnp.bfloat16, True))(pred))
    n32 = np.linalg.norm(g32)
    xla_err = np.linalg.norm(gx - g32) / n32
    fus_err = np.linalg.norm(gf - g32) / n32
    assert fus_err < max(2.0 * xla_err, 0.05), (fus_err, xla_err)

    v32 = float(xla_small_distance(params, pred, target, weights,
                                   jnp.float32))
    vf = float(fused_vggish_distance(params, pred, target, weights,
                                     jnp.bfloat16, True))
    assert abs(vf - v32) / abs(v32) < 0.02


def test_value_only_variant_matches():
    params = small_params()
    pred, target, weights = make_inputs(16, 16)
    dt = jnp.float32
    full = fused_vggish_distance(params, pred, target, weights, dt, True)
    val = fused_vggish_distance_value(params, pred, target, weights, dt,
                                      True)
    np.testing.assert_allclose(float(val), float(full), rtol=1e-6)


def test_geometry_guards():
    params = small_params()
    pred, target, weights = make_inputs(16, 16)
    with pytest.raises(ValueError, match="divisible by 8"):
        fused_vggish_distance(params, pred[:, :12], target[:, :12],
                              weights, jnp.float32, True)
    # small trunk: 2*C1 = 16 lanes -> not the production geometry
    assert not fused_supported(params, pred)
    assert not fused_supported({}, pred)


def test_impl_plumbing_real_widths_value():
    """vggish_feature_distance(impl='fused-value') against the XLA path
    with the REAL VGGish trunk (64..512 channels) at a small image."""
    module = VGGishFeatures(dtype=jnp.float32)
    pred, target, weights = make_inputs(16, 16, B=2)
    params = module.init(jax.random.PRNGKey(3),
                         jnp.zeros((1, 16, 16, 1), jnp.float32))["params"]
    assert fused_supported(params, pred)
    ref = vggish_feature_distance(module, params, pred, target, weights,
                                  impl="xla")
    got = vggish_feature_distance(module, params, pred, target, weights,
                                  impl="fused-value")
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
