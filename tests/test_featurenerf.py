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


# ---------------------------------------------------------------------------
# FeatureNeRF parity: bbox sampling, multi-view encode, attn/coord losses
# (reference featurenerf/train/train_embed.py:147-151,185-346)
# ---------------------------------------------------------------------------

def test_sample_view_maps_matches_torch_grid_sample():
    import pytest
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from real_robot_nerf_actor_tpu.train.featurenerf import _sample_view_maps

    rng = np.random.default_rng(1)
    nv, hf, wf, c = 3, 5, 7, 4
    h, w = 24, 36
    maps = rng.standard_normal((nv, hf, wf, c)).astype(np.float32)
    r = 64
    v = rng.integers(0, nv, r)
    y = rng.integers(0, h, r)
    x = rng.integers(0, w, r)

    got = np.asarray(_sample_view_maps(
        jnp.asarray(maps), jnp.asarray(v), jnp.asarray(y), jnp.asarray(x),
        (h, w)))

    # independent torch reference: the grid_sample the reference performs
    # (align_corners=False, zero padding), with the axis-correct grid
    gx = x.astype(np.float32) / w * 2 - 1
    gy = y.astype(np.float32) / h * 2 - 1
    grid = torch.as_tensor(
        np.stack([gx, gy], -1)[None, None].repeat(nv, 0))  # (NV,1,R,2)
    t = F.grid_sample(torch.as_tensor(maps.transpose(0, 3, 1, 2)),
                      grid.float(), mode="bilinear",
                      padding_mode="zeros", align_corners=False)
    want = t[torch.as_tensor(v), :, 0, torch.arange(r)].numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_attention_norm_loss_matches_torch():
    import pytest
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from real_robot_nerf_actor_tpu.train.featurenerf import attention_norm_loss

    rng = np.random.default_rng(2)
    embed = rng.standard_normal((40, 16)).astype(np.float32)
    attn = rng.standard_normal((40, 6)).astype(np.float32)
    got = float(attention_norm_loss(jnp.asarray(embed), jnp.asarray(attn)))

    e = torch.as_tensor(embed)[None]
    a = torch.as_tensor(attn)[None]
    e_n = F.normalize(e.pow(1).mean(-1).view(e.size(0), -1))
    a_n = F.normalize(a.pow(1).mean(-1).view(a.size(0), -1))
    want = float((e_n - a_n).pow(2).mean())
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def _parity_batch(rng, nv=3, h=16, w=16, d=6, n_attn=4, bbox=None):
    batch = {
        "images": jnp.asarray(rng.uniform(0, 1, (nv, h, w, 3)), jnp.float32),
        "poses": jnp.asarray(np.broadcast_to(np.eye(4, dtype=np.float32),
                                             (nv, 4, 4)).copy()),
        "focal": jnp.asarray(20.0),
        "features": jnp.asarray(
            rng.standard_normal((nv, 4, 4, d)), jnp.float32) * 0.1,
        "cls_attn": jnp.asarray(
            rng.uniform(0, 1, (nv, 4, 4, n_attn)), jnp.float32),
    }
    if bbox is not None:
        batch["bbox"] = jnp.asarray(np.tile(bbox, (nv, 1)), jnp.int32)
    return batch


def test_bbox_sampling_switch():
    cfg = FeatureNerfConfig(model=TINY, ray_batch_size=64, no_bbox_step=100)
    tr = FeatureNerfTrainer(cfg)
    rng = np.random.default_rng(3)
    batch = _parity_batch(rng, bbox=np.asarray([5, 7, 5, 7]))  # 1-pixel bbox
    v, y, x = tr._sample_pixels(jax.random.key(0), batch, jnp.asarray(0))
    assert (np.asarray(x) == 5).all() and (np.asarray(y) == 7).all()
    v2, y2, x2 = tr._sample_pixels(jax.random.key(0), batch,
                                   jnp.asarray(100))  # past no_bbox_step
    assert not ((np.asarray(x2) == 5).all() and (np.asarray(y2) == 7).all())


def test_attn_and_coord_losses_wired():
    cfg = FeatureNerfConfig(
        model=TINY,
        renderer=PixelNerfRendererConfig(n_coarse=6, n_fine=4, n_fine_depth=2),
        ray_batch_size=32, z_near=0.5, z_far=3.0,
        lambda_attn=0.1, lambda_coord=0.25,
        train=TrainConfig(num_steps=1, optim=OptimConfig(lr=1e-3)))
    tr = FeatureNerfTrainer(cfg)
    assert tr.cfg.model.regress_coord  # auto-enabled by lambda_coord > 0
    state = tr.init_state(jax.random.key(0), image_shape=(16, 16))
    batch = _parity_batch(np.random.default_rng(4))
    state, m = jax.jit(tr.train_step)(state, batch, jax.random.key(1))
    for k in ("loss_attn", "loss_coord", "loss_embed", "loss_rgb"):
        assert k in m and np.isfinite(float(m[k])), k
    assert float(m["loss_attn"]) > 0
    assert float(m["loss_coord"]) > 0


def test_multi_source_view_encoding():
    cfg = FeatureNerfConfig(
        model=TINY,
        renderer=PixelNerfRendererConfig(n_coarse=4, n_fine=0),
        ray_batch_size=16, z_near=0.5, z_far=3.0, nviews=(1, 2),
        train=TrainConfig(num_steps=1, optim=OptimConfig(lr=1e-3)))
    tr = FeatureNerfTrainer(cfg)
    state = tr.init_state(jax.random.key(0), image_shape=(16, 16))
    rng = np.random.default_rng(5)
    batch = _parity_batch(rng)
    m_by_ns = {}
    for ns in (1, 2):
        b = dict(batch, src_ord=jnp.arange(ns, dtype=jnp.int32))
        _, m = jax.jit(tr.train_step)(state, b, jax.random.key(2))
        m_by_ns[ns] = float(m["loss"])
    assert np.isfinite(list(m_by_ns.values())).all()
    assert m_by_ns[1] != m_by_ns[2]  # second view actually participates


def test_scene_data_emits_src_ord_and_attn():
    from real_robot_nerf_actor_tpu.data.scene_dataset import Scene
    rng = np.random.default_rng(6)
    sc = Scene(
        images=rng.uniform(0, 1, (4, 8, 8, 3)).astype(np.float32),
        poses=np.broadcast_to(np.eye(4, dtype=np.float32), (4, 4, 4)).copy(),
        focal=20.0,
        features=rng.standard_normal((4, 2, 2, 6)).astype(np.float32),
        cls_attn=rng.uniform(0, 1, (4, 6, 2, 2)).astype(np.float32))
    cfg = FeatureNerfConfig(model=TINY, nviews=(1, 2))
    tr = FeatureNerfTrainer(cfg)
    it = tr.scene_data([sc], seed=0)
    seen_ns = set()
    for _ in range(10):
        b = next(it)
        assert b["cls_attn"].shape == (4, 2, 2, 6)  # transposed to NHWC
        seen_ns.add(int(b["src_ord"].shape[0]))
        assert len(set(np.asarray(b["src_ord"]).tolist())) == b["src_ord"].shape[0]
    assert seen_ns == {1, 2}


def test_augnerf_hooks_identity_off_and_perturb_on():
    """Aug-NeRF hooks (reference models_embed.py:106-110,186-187,298-299):
    identity when disabled or when train=False; train-time noise perturbs
    outputs when enabled."""
    import dataclasses

    def run(cfg, train, rngs=None, seed=0):
        net = PixelNerfNet(cfg)
        v = net.init(
            {"params": jax.random.key(0), "aug": jax.random.key(9)},
            jnp.zeros((1, 16, 16, 3)), jnp.eye(4)[None],
            jnp.asarray([10.0, -10.0]), jnp.zeros(2), jnp.zeros((8, 3)),
            jnp.zeros((8, 3)), method=net.encode_and_query)
        latent = net.apply(v, jnp.full((1, 16, 16, 3), 0.3),
                           method=net.encode)
        xyz = jax.random.normal(jax.random.key(1), (8, 3)) * 0.1
        dirs = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (8, 1))
        return net.apply(v, latent, jnp.eye(4)[None],
                         jnp.asarray([10.0, -10.0]), jnp.zeros(2), (16, 16),
                         xyz, dirs, train=train, rngs=rngs)

    off = TINY
    a = run(off, train=True)
    b = run(off, train=False)
    np.testing.assert_array_equal(np.asarray(a["rgb"]), np.asarray(b["rgb"]))

    on = dataclasses.replace(TINY, use_input_aug=True, use_output_aug=True,
                             aug_noise_scale=0.05)
    c = run(on, train=True, rngs={"aug": jax.random.key(2)})
    d = run(on, train=True, rngs={"aug": jax.random.key(3)})
    e = run(on, train=False)
    # different noise keys -> different outputs; eval mode -> matches off
    assert np.abs(np.asarray(c["sigma"]) - np.asarray(d["sigma"])).max() > 0 \
        or np.abs(np.asarray(c["rgb"]) - np.asarray(d["rgb"])).max() > 0
    np.testing.assert_array_equal(np.asarray(e["rgb"]), np.asarray(a["rgb"]))


def test_augnerf_through_renderer_and_trainstep():
    """The renderer/trainer plumbing passes train + aug rngs end to end
    (train step runs with hooks armed; eval render stays deterministic)."""
    import dataclasses
    cfg = FeatureNerfConfig(
        model=dataclasses.replace(TINY, use_input_aug=True,
                                  aug_noise_scale=0.02),
        renderer=PixelNerfRendererConfig(n_coarse=4, n_fine=2,
                                         n_fine_depth=0),
        ray_batch_size=8,
        train=TrainConfig(num_steps=1, prefetch=0))
    tr = FeatureNerfTrainer(cfg)
    state = tr.init_state(jax.random.key(0), image_shape=(16, 16))
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)),
                              jnp.float32),
        "poses": jnp.asarray(np.broadcast_to(np.eye(4, dtype=np.float32),
                                             (2, 4, 4)).copy()),
        "focal": jnp.asarray(20.0),
        "features": jnp.asarray(rng.standard_normal((2, 4, 4, 6)),
                                jnp.float32) * 0.1,
    }
    state, m = jax.jit(tr.train_step)(state, batch, jax.random.key(1))
    assert np.isfinite(float(m["loss"]))
