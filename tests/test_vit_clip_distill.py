"""DINO ViT, CLIP text tower, 2D distillation tests."""
import numpy as np
import jax
import jax.numpy as jnp

from real_robot_nerf_actor_tpu.models.vit import (
    DinoViT, ViTConfig, extract_dense_features)
from real_robot_nerf_actor_tpu.models.clip_text import (
    ClipTextConfig, ClipTextEncoder)
from real_robot_nerf_actor_tpu.train.distill2d import (
    Distill2DConfig, Student2DTrainer)
from real_robot_nerf_actor_tpu.train.trainer import OptimConfig, TrainConfig

TINY_VIT = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2,
                     image_size=32)


def test_vit_forward_and_layers():
    vit = DinoViT(TINY_VIT)
    x = jnp.zeros((2, 32, 32, 3))
    params = vit.init(jax.random.key(0), x, layers_to_return=(0, 1))
    out = vit.apply(params, x, layers_to_return=(0, 1))
    assert out["tokens"].shape == (2, 1 + 16, 32)
    assert out["grid"] == (4, 4)
    assert 0 in out["layers"] and 1 in out["layers"]
    assert out["layers"][1]["k"].shape == (2, 2, 17, 16)


def test_vit_pos_interpolation():
    """Non-native resolution works via pos-emb resize."""
    vit = DinoViT(TINY_VIT)
    x32 = jnp.zeros((1, 32, 32, 3))
    params = vit.init(jax.random.key(0), x32)
    out = vit.apply(params, jnp.zeros((1, 48, 40, 3)))
    assert out["tokens"].shape == (1, 1 + 6 * 5, 32)


def test_extract_dense_features():
    vit = DinoViT(TINY_VIT)
    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3))
    params = vit.init(jax.random.key(0), x, layers_to_return=(0, 1))
    feats, attn = extract_dense_features(vit, params, x, feature_layer=0,
                                         attn_layer=1)
    assert feats.shape == (2, 4, 4, 32)
    assert attn.shape == (2, 2, 4, 4)
    # attention rows are normalized over all tokens incl cls; patch part < 1
    assert (np.asarray(attn) >= 0).all()


def test_clip_text_encoder():
    cfg = ClipTextConfig(vocab_size=100, context_length=12, width=32,
                         heads=4, layers=2, embed_dim=64)
    enc = ClipTextEncoder(cfg)
    tokens = jnp.asarray([[1, 5, 7, 99, 0, 0, 0, 0, 0, 0, 0, 0]])
    params = enc.init(jax.random.key(0), tokens)
    pooled, per_token = enc.apply(params, tokens)
    assert pooled.shape == (1, 64)
    assert per_token.shape == (1, 12, 32)
    # causal: truncating the suffix must not change the prefix embeddings
    pooled2, per_token2 = enc.apply(params, tokens.at[:, 4:].set(0))
    np.testing.assert_allclose(np.asarray(per_token[:, :4]),
                               np.asarray(per_token2[:, :4]), atol=1e-5)


def test_student2d_distillation_learns():
    cfg = Distill2DConfig(
        d_feature=8, width=8,
        train=TrainConfig(num_steps=2, optim=OptimConfig(lr=3e-3)))
    tr = Student2DTrainer(cfg)
    state = tr.init_state(jax.random.key(0), image_shape=(16, 16))
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.uniform(0, 1, (4, 16, 16, 3)), jnp.float32),
        "features": jnp.asarray(rng.standard_normal((4, 4, 4, 8)) * 0.1,
                                jnp.float32),
    }
    step = jax.jit(tr.train_step)
    losses = []
    for i in range(25):
        state, m = step(state, batch, jax.random.key(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.9
