"""FeatureNeRF (pixel-aligned pixelNeRF + distillation) smoke tests."""
import numpy as np
import jax
import jax.numpy as jnp

from real_robot_nerf_actor_tpu.models.encoder2d import (
    SpatialEncoder, SpatialEncoderConfig, bilinear_sample_2d)
from real_robot_nerf_actor_tpu.models.pixelnerf import (
    PixelNerfConfig, PixelNerfNet)
from real_robot_nerf_actor_tpu.render.pixelnerf_renderer import (
    PixelNerfRenderer, PixelNerfRendererConfig)
from real_robot_nerf_actor_tpu.train.featurenerf import (
    FeatureNerfConfig, FeatureNerfTrainer)
from real_robot_nerf_actor_tpu.train.trainer import TrainConfig, OptimConfig

TINY_ENC = SpatialEncoderConfig(stage_features=(4, 4, 8), blocks_per_stage=1)
TINY = PixelNerfConfig(d_embed=6, d_hidden=16, n_blocks=2, combine_layer=1,
                       encoder=TINY_ENC)


def test_spatial_encoder_shapes():
    enc = SpatialEncoder(TINY_ENC)
    x = jnp.zeros((2, 32, 40, 3))
    params = enc.init(jax.random.key(0), x)
    out = enc.apply(params, x)
    assert out.shape == (2, 16, 20, 16)  # H/2, W/2, sum(features)


def test_bilinear_sample_2d_matches_torch():
    import pytest
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.default_rng(0)
    feat = rng.standard_normal((2, 6, 8, 5)).astype(np.float32)
    uv = rng.uniform(-1.2, 1.2, (2, 50, 2)).astype(np.float32)
    want = F.grid_sample(
        torch.as_tensor(feat.transpose(0, 3, 1, 2)),
        torch.as_tensor(uv)[:, None], align_corners=True,
        padding_mode="border", mode="bilinear",
    ).squeeze(2).permute(0, 2, 1).numpy()
    got = bilinear_sample_2d(jnp.asarray(feat), jnp.asarray(uv))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_pixelnerf_query_shapes():
    net = PixelNerfNet(TINY)
    imgs = jnp.zeros((2, 16, 16, 3))  # two source views
    w2c = jnp.broadcast_to(jnp.eye(4), (2, 4, 4))
    variables = net.init(jax.random.key(0), imgs, w2c,
                         jnp.asarray([20.0, -20.0]), jnp.zeros(2),
                         jnp.zeros((10, 3)), jnp.zeros((10, 3)),
                         method=net.encode_and_query)
    out = net.apply(variables, imgs, w2c, jnp.asarray([20.0, -20.0]),
                    jnp.zeros(2), jnp.ones((10, 3)) * 0.5,
                    jnp.ones((10, 3)), method=net.encode_and_query)
    assert out["rgb"].shape == (10, 3)
    assert out["embed"].shape == (10, 6)
    assert (np.asarray(out["sigma"]) >= 0).all()


def test_featurenerf_train_step_decreases():
    cfg = FeatureNerfConfig(
        model=TINY,
        renderer=PixelNerfRendererConfig(n_coarse=6, n_fine=4, n_fine_depth=2),
        ray_batch_size=32, z_near=0.5, z_far=3.0,
        train=TrainConfig(num_steps=2, optim=OptimConfig(lr=3e-3)))
    tr = FeatureNerfTrainer(cfg)
    state = tr.init_state(jax.random.key(0), image_shape=(16, 16))

    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.uniform(0, 1, (3, 16, 16, 3)), jnp.float32),
        "poses": jnp.asarray(np.broadcast_to(np.eye(4, dtype=np.float32),
                                             (3, 4, 4)).copy()),
        "focal": jnp.asarray(20.0),
        "features": jnp.asarray(rng.standard_normal((3, 4, 4, 6)), jnp.float32) * 0.1,
    }
    step = jax.jit(tr.train_step)
    losses = []
    for i in range(15):
        state, m = step(state, batch, jax.random.key(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[-5:]) < losses[0]


def test_extract_radiance():
    net = PixelNerfNet(TINY)
    imgs = jnp.zeros((1, 16, 16, 3))
    w2c = jnp.eye(4)[None]
    variables = net.init(jax.random.key(0), imgs, w2c,
                         jnp.asarray([20.0, -20.0]), jnp.zeros(2),
                         jnp.zeros((4, 3)), jnp.zeros((4, 3)),
                         method=net.encode_and_query)
    latent = net.apply(variables, imgs, method=net.encode)
    r = PixelNerfRenderer(PixelNerfRendererConfig(n_coarse=5, n_fine=0), net)
    rays = jnp.concatenate([
        jnp.zeros((7, 3)),
        jnp.tile(jnp.asarray([[0., 0., -1.]]), (7, 1)),
        jnp.full((7, 1), 0.5), jnp.full((7, 1), 2.0)], -1)
    enc = (latent, w2c, jnp.asarray([20.0, -20.0]), jnp.zeros(2), (16, 16))
    out = r.extract_radiance(variables, enc, rays, jax.random.key(1))
    assert out["points"].shape == (7, 5, 3)
    assert out["sigma"].shape == (7, 5)
    assert out["embed"].shape == (7, 5, 6)
