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


def test_multilayer_3d_encoder_deep():
    """Deep UNet: output shape + 3-entry multi-scale voxel list
    (input, V/4 skip sum, V/2 skip sum) like network_utils.py:247-302."""
    from real_robot_nerf_actor_tpu.models.blocks import MultiLayer3DEncoder
    m = MultiLayer3DEncoder(features=16)
    x = jax.random.normal(jax.random.key(0), (1, 20, 20, 20, 10))
    params = m.init(jax.random.key(1), x)
    (out, voxel_list), _ = m.apply(params, x, mutable=["batch_stats"])
    assert out.shape == (1, 20, 20, 20, 16)
    assert len(voxel_list) == 3
    assert voxel_list[0].shape == (1, 20, 20, 20, 10)
    assert voxel_list[1].shape[1:] == (5, 5, 5, 128)
    assert voxel_list[2].shape[1:] == (10, 10, 10, 64)


def test_implicit_net_geometric_init_and_skips():
    """ImplicitNet (IGR MLP): geometric init -> initial first output is
    ~(radius - |p|)-like (positive at origin, negative far away); skip
    layers concat the input / sqrt(2); softplus-beta path finite."""
    from real_robot_nerf_actor_tpu.models.implicit import ImplicitNet
    d_in = 3
    net = ImplicitNet(d_in=d_in, dims=[64, 64, 64], d_out=4, skip_in=(2,),
                      radius_init=0.3)
    x0 = jnp.zeros((1, d_in))
    params = net.init(jax.random.key(0), x0)
    near = net.apply(params, jnp.zeros((1, d_in)))
    far = net.apply(params, jnp.ones((1, d_in)) * 2.0)
    # negated-SDF convention: inside (origin) positive, outside negative
    assert float(near[0, 0]) > 0.0
    assert float(far[0, 0]) < float(near[0, 0])
    # skip-layer dims (mlp.py:60-63): the layer BEFORE a skip emits
    # dims[l] - d_in so the concat restores dims[l]
    assert params["params"]["lin1"]["kernel"].shape == (64, 64 - d_in)
    assert params["params"]["lin2"]["kernel"].shape == (64, 64)
    soft = ImplicitNet(d_in=d_in, dims=[32, 32], d_out=2, beta=100.0,
                       geometric_init=False)
    p2 = soft.init(jax.random.key(1), x0)
    out = soft.apply(p2, jax.random.normal(jax.random.key(2), (5, d_in)))
    assert np.isfinite(np.asarray(out)).all()


def test_conv_encoder_2d():
    """ConvEncoder: 128x128 image -> half-res feature map with the global
    bottleneck broadcast (custom_encoder.py semantics)."""
    from real_robot_nerf_actor_tpu.models.encoder2d import ConvEncoder
    m = ConvEncoder(dim_in=3)
    x = jax.random.normal(jax.random.key(0), (1, 128, 128, 3))
    params = m.init(jax.random.key(1), x)
    out = m.apply(params, x)
    assert out.shape == (1, 128, 128, 128) or out.shape[1] == 128
    assert np.isfinite(np.asarray(out)).all()


def test_pca_matches_numpy_svd():
    """pca_fit_transform == centered-SVD PCA (sklearn semantics) up to
    fp32 tolerance, including the svd_flip sign convention."""
    from real_robot_nerf_actor_tpu.utils.pca import pca_fit_transform
    rng = np.random.default_rng(0)
    x = rng.standard_normal((500, 24)).astype(np.float32)
    x[:, :4] *= 10.0  # give the spectrum structure
    k = 6
    got = np.asarray(pca_fit_transform(jnp.asarray(x), k))
    xc = x - x.mean(0)
    u, s, vt = np.linalg.svd(xc, full_matrices=False)
    comps = vt[:k]
    signs = np.sign(comps[np.arange(k), np.abs(comps).argmax(1)])
    want = xc @ (comps * signs[:, None]).T
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
