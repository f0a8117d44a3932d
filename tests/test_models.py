"""Model shape/behavior tests at reduced sizes (fast on 1-core CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from real_robot_nerf_actor_tpu.models import (
    ResnetFC, NerfFieldConfig, VoxelNerfField, PerceiverConfig, PerceiverIO)


def test_resnetfc_shapes_and_residual_identity():
    mlp = ResnetFC(d_out=8, n_blocks=3, d_latent=16, d_hidden=32, combine_layer=2)
    x = jnp.ones((10, 16 + 5))
    params = mlp.init(jax.random.key(0), x)
    out, last = mlp.apply(params, x)
    assert out.shape == (10, 8)
    assert last.shape == (10, 32)
    # fc1 zero-init: at init each res block is identity, so output depends
    # only on lin_in/lin_z/lin_out; gradients still flow
    g = jax.grad(lambda p: mlp.apply(p, x)[0].sum())(params)
    flat = jax.tree_util.tree_leaves(g)
    assert any(np.abs(np.asarray(t)).sum() > 0 for t in flat)


def test_resnetfc_multiview_combine():
    mlp = ResnetFC(d_out=4, n_blocks=3, d_latent=0, d_hidden=16, combine_layer=1)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((6, 5)), jnp.float32)
    params = mlp.init(jax.random.key(0), x)
    out2, _ = mlp.apply(params, x, num_views=2)
    assert out2.shape == (3, 4)
    # averaging two identical views == single view result
    xx = jnp.repeat(x[:3], 2, axis=0)
    outr, _ = mlp.apply(params, xx, num_views=2)
    out1, _ = mlp.apply(params, x[:3], num_views=1)
    np.testing.assert_allclose(np.asarray(outr), np.asarray(out1), atol=1e-5)


def test_voxel_nerf_field():
    cfg = NerfFieldConfig(d_latent=8, d_embed=16, d_hidden=32, n_blocks=3,
                          coord_bounds=(0., 0., 0., 1., 1., 1.))
    assert cfg.d_in == 42
    field = VoxelNerfField(cfg)
    vox = jnp.asarray(np.random.default_rng(0).standard_normal((1, 6, 6, 6, 8)),
                      jnp.float32)
    xyz = jax.random.uniform(jax.random.key(1), (1, 50, 3))
    dirs = jax.random.normal(jax.random.key(2), (1, 50, 3))
    params = field.init(jax.random.key(0), vox, xyz, dirs)
    out = field.apply(params, vox, xyz, dirs)
    assert out["rgb"].shape == (1, 50, 3)
    assert out["sigma"].shape == (1, 50)
    assert out["embed"].shape == (1, 50, 16)
    assert (np.asarray(out["rgb"]) >= 0).all() and (np.asarray(out["rgb"]) <= 1).all()
    assert (np.asarray(out["sigma"]) >= 0).all()


def test_voxel_nerf_field_mask_outside():
    """mask_outside=True: sigma is hard-zero for out-of-box points and
    IDENTICAL to the unmasked field for in-box points (rgb/embed are
    untouched either way)."""
    import dataclasses
    cfg = NerfFieldConfig(d_latent=8, d_embed=16, d_hidden=32, n_blocks=3,
                          coord_bounds=(0., 0., 0., 1., 1., 1.))
    field = VoxelNerfField(cfg)
    field_m = VoxelNerfField(dataclasses.replace(cfg, mask_outside=True))
    vox = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 6, 6, 6, 8)),
        jnp.float32)
    xyz_in = jax.random.uniform(jax.random.key(1), (1, 40, 3),
                                minval=0.01, maxval=0.99)
    xyz_out = xyz_in + jnp.asarray([2.0, 0.0, 0.0])   # past the box
    xyz = jnp.concatenate([xyz_in, xyz_out], axis=1)
    dirs = jax.random.normal(jax.random.key(2), (1, 80, 3))
    params = field.init(jax.random.key(0), vox, xyz, dirs)
    # bias the sigma head so the unmasked field is nonzero everywhere
    params = jax.tree_util.tree_map(lambda x: x, params)
    params["params"]["mlp_coarse"]["lin_out_bias"] = (
        params["params"]["mlp_coarse"]["lin_out_bias"].at[3].set(2.0))
    raw = field.apply(params, vox, xyz, dirs)
    msk = field_m.apply(params, vox, xyz, dirs)
    assert np.asarray(raw["sigma"][0, 40:]).min() > 0.0
    np.testing.assert_array_equal(np.asarray(msk["sigma"][0, 40:]), 0.0)
    np.testing.assert_array_equal(np.asarray(msk["sigma"][0, :40]),
                                  np.asarray(raw["sigma"][0, :40]))
    np.testing.assert_array_equal(np.asarray(msk["rgb"]),
                                  np.asarray(raw["rgb"]))


def _tiny_perceiver(**kw):
    return PerceiverConfig(
        depth=1, voxel_size=10, num_latents=16, latent_dim=32,
        im_channels=8, cross_dim_head=8, latent_dim_head=8, latent_heads=2,
        voxel_patch_size=5, final_dim=8, lang_emb_dim=16, lang_max_seq_len=5,
        num_rotation_classes=12, **kw)


def test_perceiver_io_shapes():
    cfg = _tiny_perceiver()
    net = PerceiverIO(cfg)
    vox = jnp.ones((2, 10, 10, 10, 10))
    proprio = jnp.ones((2, 7))
    lang = jnp.ones((2, 5, 16))
    params = net.init(jax.random.key(0), vox, proprio, lang)
    q_trans, q_rot_grip, q_coll = net.apply(params, vox, proprio, lang)
    assert q_trans.shape == (2, 10, 10, 10)
    assert q_rot_grip.shape == (2, 12 * 3 + 2)
    assert q_coll.shape == (2, 2)


def test_perceiver_io_nerfact_variant_returns_voxel_feat():
    cfg = _tiny_perceiver(input_encoder="unet", return_voxel_feat=True)
    net = PerceiverIO(cfg)
    vox = jnp.ones((1, 10, 10, 10, 10))
    params = net.init(jax.random.key(0), vox, jnp.ones((1, 7)), jnp.ones((1, 5, 16)))
    out = net.apply(params, vox, jnp.ones((1, 7)), jnp.ones((1, 5, 16)),
                    mutable=["batch_stats"])
    (q_trans, q_rot_grip, q_coll, voxel_feat) = out[0]
    assert voxel_feat.shape == (1, 10, 10, 10, 8)



def test_pointwise_conv_lowering_matches_xla_conv():
    """PointwiseConv3D (flat-matmul 1x1x1 conv) is param-tree compatible
    with nn.Conv and numerically identical."""
    from flax import linen as nn
    from real_robot_nerf_actor_tpu.models.blocks import (
        PointwiseConv3D, init_for)

    x = jax.random.normal(jax.random.key(0), (2, 6, 6, 6, 10))
    pw = PointwiseConv3D(16, init_for("lrelu"))
    p = pw.init(jax.random.key(1), x)
    assert p["params"]["kernel"].shape == (1, 1, 1, 10, 16)
    y_ref = nn.Conv(16, (1, 1, 1)).apply({"params": p["params"]}, x)
    assert jnp.allclose(pw.apply(p, x), y_ref, atol=1e-5)


def test_shuffle_transpose_conv_block_upsample():
    """ShuffleTransposeConv3D: disjoint-block transpose conv — each 5^3
    output block is exactly x[i,j,k] @ K[di,dj,dk] + b."""
    from real_robot_nerf_actor_tpu.models.blocks import (
        ShuffleTransposeConv3D, init_for)

    x = jax.random.normal(jax.random.key(0), (1, 3, 3, 3, 4))
    m = ShuffleTransposeConv3D(6, 5, init_for(None))
    p = m.init(jax.random.key(1), x)
    y = m.apply(p, x)
    assert y.shape == (1, 15, 15, 15, 6)
    k = p["params"]["kernel"]  # (5, 5, 5, 4, 6)
    b = p["params"]["bias"]
    expect = jnp.einsum("c,co->o", x[0, 1, 2, 0], k[3, 4, 1]) + b
    assert jnp.allclose(y[0, 5 * 1 + 3, 5 * 2 + 4, 5 * 0 + 1], expect,
                        atol=1e-5)


def test_quantized_resnetfc_same_tree_and_close_outputs():
    """quantized=True serves the SAME param tree via W8A8 matmuls with
    bounded relative error (dynamic per-row/per-channel int8)."""
    from real_robot_nerf_actor_tpu.models.resnetfc import ResnetFC
    mlp = ResnetFC(d_out=4, n_blocks=3, d_latent=8, d_hidden=64,
                   combine_layer=2)
    mlp_q = ResnetFC(d_out=4, n_blocks=3, d_latent=8, d_hidden=64,
                     combine_layer=2, quantized=True)
    zx = jax.random.normal(jax.random.key(0), (32, 13))
    params = mlp.init(jax.random.key(1), zx)
    tree = jax.tree.map(lambda a: a.shape, params)
    assert tree == jax.tree.map(lambda a: a.shape, mlp_q.init(
        jax.random.key(1), zx))
    a, _ = mlp.apply(params, zx)
    b, _ = mlp_q.apply(params, zx)
    err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-8))
    assert err < 0.05, err


def test_quantized_resnetfc_fails_fast_under_grad():
    """Differentiating a quantized ResnetFC raises instead of training
    silently with jnp.round's zero gradient (ADVICE r2)."""
    import pytest
    from real_robot_nerf_actor_tpu.models.resnetfc import ResnetFC
    mlp_q = ResnetFC(d_out=4, n_blocks=2, d_latent=8, d_hidden=32,
                     combine_layer=1, quantized=True)
    zx = jax.random.normal(jax.random.key(0), (8, 13))
    params = mlp_q.init(jax.random.key(1), zx)

    def loss(p):
        out, _ = mlp_q.apply(p, zx)
        return jnp.sum(out ** 2)

    with pytest.raises(NotImplementedError, match="serving-only"):
        jax.grad(loss)(params)


def test_grip_proprio_scale_equals_manual_input_scaling():
    """grip_proprio_scale=s must equal feeding proprio with its last dim
    pre-multiplied by s into the unscaled model (the knob is pure input
    scaling at one choke point — train/eval/serving all inherit it), and
    the default 1.0 is exact parity."""
    import dataclasses
    cfg = _tiny_perceiver()
    net = PerceiverIO(cfg)
    vox = jnp.ones((1, 10, 10, 10, 10))
    lang = jnp.ones((1, 5, 16))
    proprio = jnp.asarray([[3.0, 7.0, 2.0, 11.0, 5.0, 9.0, 1.0]])
    params = net.init(jax.random.key(0), vox, proprio, lang)

    scaled_net = PerceiverIO(dataclasses.replace(cfg, grip_proprio_scale=50.0))
    out_knob = scaled_net.apply(params, vox, proprio, lang)
    manual = proprio.at[:, -1].mul(50.0)
    out_manual = net.apply(params, vox, manual, lang)
    for a, b in zip(out_knob, out_manual):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # the knob actually changes the computation when the bit is set
    out_base = net.apply(params, vox, proprio, lang)
    assert np.abs(np.asarray(out_knob[1]) - np.asarray(out_base[1])).max() > 0
