"""Loss function tests (ref: models/loss.py semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from music_style_transfer_ldm_tpu.losses import (
    VGGishFeatureLoss, compression_loss, diffusion_loss, gram_matrix,
    kl_regularization_loss, style_loss,
)
from music_style_transfer_ldm_tpu.losses.vggish import (
    VGGishFeatures, convert_torchvggish_state_dict,
)


def test_kl_regularization_matches_reference_formula(rng):
    z = rng.randn(2, 4, 4, 8).astype(np.float32)
    got = float(kl_regularization_loss(jnp.asarray(z)))
    want = np.mean(0.5 * (z**2 - 1 - np.log(z**2 + 1e-8)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_kl_minimized_at_unit_variance():
    # KL penalty should be ~0 for |z|=1 and positive elsewhere.
    ones = jnp.ones((4, 4))
    assert abs(float(kl_regularization_loss(ones))) < 1e-6
    assert float(kl_regularization_loss(3 * ones)) > 1.0


def test_diffusion_loss_is_mse(rng):
    a = rng.randn(2, 8, 8, 4).astype(np.float32)
    b = rng.randn(2, 8, 8, 4).astype(np.float32)
    got = float(diffusion_loss(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, np.mean((a - b) ** 2), rtol=1e-5)


def test_vggish_loss_zero_for_identical_and_positive_otherwise(rng):
    loss_net = VGGishFeatureLoss(seed=0)
    x = jnp.asarray(rng.rand(2, 128, 128, 1).astype(np.float32))
    y = jnp.asarray(rng.rand(2, 128, 128, 1).astype(np.float32))
    assert float(loss_net(x, x)) < 1e-10
    assert float(loss_net(x, y)) > 0.0


def test_vggish_gradient_flows_to_inputs_not_params(rng):
    loss_net = VGGishFeatureLoss(seed=0)
    x = jnp.asarray(rng.rand(1, 128, 128, 1).astype(np.float32))
    y = jnp.asarray(rng.rand(1, 128, 128, 1).astype(np.float32))
    g = jax.grad(lambda a: loss_net(a, y))(x)
    assert float(jnp.abs(g).max()) > 0.0


def test_compression_loss_composition(rng):
    x = jnp.asarray(rng.rand(2, 128, 128, 1).astype(np.float32))
    r = jnp.asarray(rng.rand(2, 128, 128, 1).astype(np.float32))
    z = jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))
    base = float(compression_loss(x, r, z, None))
    want = (np.mean((np.asarray(r) - np.asarray(x)) ** 2)
            + 0.01 * float(kl_regularization_loss(z)))
    np.testing.assert_allclose(base, want, rtol=1e-5)
    # With a perceptual term it must increase for distinct inputs.
    loss_net = VGGishFeatureLoss(seed=0)
    full = float(compression_loss(x, r, z, loss_net))
    assert full > base


def test_style_loss_delegates(rng):
    loss_net = VGGishFeatureLoss(seed=0)
    x = jnp.asarray(rng.rand(1, 128, 128, 1).astype(np.float32))
    s = jnp.asarray(rng.rand(1, 128, 128, 1).astype(np.float32))
    assert float(style_loss(x, s, loss_net)) == float(loss_net(x, s))


def test_gram_matrix_shape_and_symmetry(rng):
    f = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    g = np.asarray(gram_matrix(f))
    assert g.shape == (2, 16, 16)
    np.testing.assert_allclose(g, np.swapaxes(g, 1, 2), rtol=1e-5)


def test_torchvggish_weight_conversion_shapes(rng):
    # Fabricate a torch-layout state dict and check the transplant.
    chans = [(1, 64, 0), (64, 128, 3), (128, 256, 6), (256, 256, 8),
             (256, 512, 11), (512, 512, 13)]
    sd = {}
    for cin, cout, idx in chans:
        sd[f"features.{idx}.weight"] = rng.randn(cout, cin, 3, 3).astype(
            np.float32)
        sd[f"features.{idx}.bias"] = rng.randn(cout).astype(np.float32)
    params = convert_torchvggish_state_dict(sd)
    mod = VGGishFeatures()
    ref = mod.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 128, 128, 1)))["params"]
    got_shapes = jax.tree_util.tree_map(lambda x: x.shape, params)
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, ref)
    assert got_shapes == ref_shapes
    # And the converted params actually run.
    feats = mod.apply({"params": params}, jnp.zeros((1, 128, 128, 1)))
    assert len(feats) == 6


def test_lpips_zero_identical_positive_distinct(rng):
    from music_style_transfer_ldm_tpu.losses import LPIPSLoss
    lp = LPIPSLoss(seed=0)
    x = jnp.asarray(rng.rand(1, 128, 128, 1).astype(np.float32))
    y = jnp.asarray(rng.rand(1, 128, 128, 1).astype(np.float32))
    assert float(lp(x, x)) < 1e-8
    assert float(lp(x, y)) > 0.0


def test_perceptual_loss_dispatcher(rng):
    from music_style_transfer_ldm_tpu.losses import (
        VGGishFeatureLoss, perceptual_loss,
    )
    x = jnp.asarray(rng.rand(1, 128, 128, 1).astype(np.float32))
    y = jnp.asarray(rng.rand(1, 128, 128, 1).astype(np.float32))
    vgg = VGGishFeatureLoss(seed=0)
    # vggish path requires an extractor (ref: loss.py:26)
    with np.testing.assert_raises(ValueError):
        perceptual_loss(x, y, "vggish", None)
    v = float(perceptual_loss(x, y, "vggish", vgg))
    assert v == float(vgg(x, y))
    # lpips path works with no extractor
    l = float(perceptual_loss(x, y, "lpips", None))
    assert l > 0.0


def test_torch_lpips_conversion_shapes(rng):
    from music_style_transfer_ldm_tpu.losses import (
        LPIPS, convert_torch_lpips_state_dict,
    )
    convs = [("net.slice1.0", 3, 64, 11), ("net.slice2.3", 64, 192, 5),
             ("net.slice3.6", 192, 384, 3), ("net.slice4.8", 384, 256, 3),
             ("net.slice5.10", 256, 256, 3)]
    sd = {}
    for key, cin, cout, k in convs:
        sd[f"{key}.weight"] = rng.randn(cout, cin, k, k).astype(np.float32)
        sd[f"{key}.bias"] = rng.randn(cout).astype(np.float32)
    for i, c in enumerate([64, 192, 384, 256, 256]):
        sd[f"lin{i}.model.1.weight"] = np.abs(
            rng.randn(1, c, 1, 1)).astype(np.float32)
    params = convert_torch_lpips_state_dict(sd)
    mod = LPIPS()
    x = jnp.zeros((1, 64, 64, 1))
    ref = mod.init(jax.random.PRNGKey(0), x, x)["params"]
    got_shapes = jax.tree_util.tree_map(lambda v: v.shape, params)
    ref_shapes = jax.tree_util.tree_map(lambda v: v.shape, ref)
    assert got_shapes == ref_shapes
    out = mod.apply({"params": params}, x, x)
    assert float(out) < 1e-8


def test_normalized_mse_custom_vjp_matches_autodiff(rng):
    """The closed-form VJP (losses/vggish.py normalized_mse) must equal
    autodiff of the plain formula — value and both input gradients,
    weighted and unweighted, f32 and bf16 features."""
    import jax
    import jax.numpy as jnp

    from music_style_transfer_ldm_tpu.losses.vggish import normalized_mse

    def plain(p, t, w):
        axes = (1, 2, 3)
        p32, t32 = p.astype(jnp.float32), t.astype(jnp.float32)
        ph = p32 / (jnp.std(p32, axis=axes, keepdims=True) + 1e-8)
        th = t32 / (jnp.std(t32, axis=axes, keepdims=True) + 1e-8)
        m = jnp.mean((ph - th) ** 2, axis=axes)
        return jnp.sum(m * w) / jnp.sum(w)

    for dtype, tol in ((jnp.float32, 2e-5), (jnp.bfloat16, 2e-2)):
        p = jnp.asarray(rng.randn(3, 8, 8, 5), dtype) * 2.0
        t = jnp.asarray(rng.randn(3, 8, 8, 5), dtype)
        for w in (jnp.ones((3,), jnp.float32),
                  jnp.asarray([1.0, 1.0, 0.0], jnp.float32)):
            got = float(normalized_mse(p, t, w))
            want = float(plain(p, t, w))
            assert abs(got - want) <= tol * max(1.0, abs(want)), (got, want)
            gp, gt, gw = jax.grad(
                lambda *a: normalized_mse(*a), argnums=(0, 1, 2))(p, t, w)
            wp, wt, ww = jax.grad(plain, argnums=(0, 1, 2))(p, t, w)
            np.testing.assert_allclose(np.asarray(gp, np.float32),
                                       np.asarray(wp, np.float32),
                                       rtol=tol, atol=tol)
            np.testing.assert_allclose(np.asarray(gt, np.float32),
                                       np.asarray(wt, np.float32),
                                       rtol=tol, atol=tol)
            np.testing.assert_allclose(np.asarray(gw), np.asarray(ww),
                                       rtol=1e-4, atol=1e-5)


def test_normalized_mse_pallas_matches_xla(rng):
    """The Pallas layer kernels (ops/pallas/normalized_mse.py, interpret
    mode on CPU) equal the XLA closed-form implementation — value and all
    three gradients."""
    import jax
    import jax.numpy as jnp

    from music_style_transfer_ldm_tpu.losses.vggish import normalized_mse
    from music_style_transfer_ldm_tpu.ops.pallas.normalized_mse import (
        normalized_mse_pallas,
    )

    p = jnp.asarray(rng.randn(3, 16, 16, 64), jnp.float32)
    t = jnp.asarray(rng.randn(3, 16, 16, 64), jnp.float32)
    w = jnp.asarray([1.0, 1.0, 0.0], jnp.float32)
    got = float(normalized_mse_pallas(p, t, w, True))
    want = float(normalized_mse(p, t, w))
    assert abs(got - want) < 1e-5
    gp, gt, gw = jax.grad(lambda *a: normalized_mse_pallas(*a, True),
                          argnums=(0, 1, 2))(p, t, w)
    wp, wt, ww = jax.grad(normalized_mse, argnums=(0, 1, 2))(p, t, w)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(wp), atol=1e-7)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(wt), atol=1e-7)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(ww), atol=1e-6)


def test_vggish_distance_pallas_impl_matches(rng):
    """vggish_feature_distance(impl='pallas') == default, incl. grads."""
    import jax
    import jax.numpy as jnp

    from music_style_transfer_ldm_tpu.losses.feature import (
        build_feature_metric,
    )
    m = build_feature_metric("vggish", dtype=jnp.float32)
    m.init(seed=0, input_shape=(1, 64, 64, 1))
    a = jnp.asarray(rng.rand(2, 64, 64, 1), jnp.float32)
    b = jnp.asarray(rng.rand(2, 64, 64, 1), jnp.float32)
    d_x = float(m.distance(m.params, a, b, impl="xla"))
    d_p = float(m.distance(m.params, a, b, impl="pallas"))
    assert abs(d_x - d_p) < 1e-5 * max(1.0, abs(d_x))
    g_x = jax.grad(lambda z: m.distance(m.params, z, b, impl="xla"))(a)
    g_p = jax.grad(lambda z: m.distance(m.params, z, b, impl="pallas"))(a)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=1e-4, atol=1e-6)
