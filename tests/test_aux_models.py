"""VL attention + CNN policy nets tests."""
import numpy as np
import jax
import jax.numpy as jnp

from real_robot_nerf_actor_tpu.models.vl_attention import (
    LanguageInformedVisualAttention, Visual3DLangTransformer, VLCrossAttention)
from real_robot_nerf_actor_tpu.models.cnn_policies import (
    CNNAndFcsNet, CNNLangAndFcsNet, SiameseNet, SpatialSoftmax2D)


def test_vl_cross_attention_gated_identity_at_init():
    m = VLCrossAttention(n_heads=2, d_head=8)
    vis = jax.random.normal(jax.random.key(0), (2, 10, 16))
    lang = jax.random.normal(jax.random.key(1), (2, 5, 12))
    params = m.init(jax.random.key(2), vis, lang)
    out = m.apply(params, vis, lang)
    assert out.shape == vis.shape
    # zero-init gate -> identity at init (stable residual insertion)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vis), atol=1e-6)


def test_visual3d_lang_transformer():
    m = Visual3DLangTransformer(depth=2, n_heads=2, d_head=8)
    vis = jax.random.normal(jax.random.key(0), (1, 20, 16))
    lang = jax.random.normal(jax.random.key(1), (1, 4, 8))
    params = m.init(jax.random.key(2), vis, lang)
    out = m.apply(params, vis, lang)
    assert out.shape == vis.shape
    assert np.isfinite(np.asarray(out)).all()


def test_language_informed_visual_attention():
    m = LanguageInformedVisualAttention()
    feat = jax.random.normal(jax.random.key(0), (2, 4, 4, 4, 8))
    lang = jax.random.normal(jax.random.key(1), (2, 16))
    params = m.init(jax.random.key(2), feat, lang)
    out = m.apply(params, feat, lang)
    assert out.shape == feat.shape


def test_cnn_policy_nets():
    obs = jax.random.uniform(jax.random.key(0), (2, 32, 32, 3))
    low = jnp.ones((2, 4))
    lang = jnp.ones((2, 16))

    net = CNNAndFcsNet(out_dim=8)
    p = net.init(jax.random.key(1), obs, low)
    assert net.apply(p, obs, low).shape == (2, 8)

    lnet = CNNLangAndFcsNet(out_dim=8)
    p = lnet.init(jax.random.key(2), obs, low, lang)
    out = lnet.apply(p, obs, low, lang)
    assert out.shape == (2, 8)
    # language must influence the output
    out2 = lnet.apply(p, obs, low, lang * 2.0)
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-6

    snet = SiameseNet()
    p = snet.init(jax.random.key(3), [obs, obs])
    assert snet.apply(p, [obs, obs]).ndim == 2


def test_spatial_softmax_2d():
    m = SpatialSoftmax2D()
    feat = np.zeros((1, 9, 9, 2), np.float32)
    feat[0, 2, 6, 0] = 50.0   # peak at y=2, x=6
    feat[0, 8, 0, 1] = 50.0
    params = m.init(jax.random.key(0), jnp.asarray(feat))
    kp = np.asarray(m.apply(params, jnp.asarray(feat))).reshape(2, 2)
    np.testing.assert_allclose(kp[0], [6 / 4 - 1, 2 / 4 - 1], atol=1e-3)
    np.testing.assert_allclose(kp[1], [-1.0, 1.0], atol=1e-3)
