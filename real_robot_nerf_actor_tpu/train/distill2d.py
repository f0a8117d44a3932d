"""2-D student distillation + offline teacher feature extraction.

Reference behavior:
  - train_2d.py (featurenerf/train/train_2d.py:90-220 Student2DTrainer):
    distill DINO dense features into a small 2-D student encoder with an
    MSE loss on feature maps.
  - correspondence/extract_dino_feature.py etc.: batch-extract DINO dense
    features (+ cls attention) to npz for datasets; CLIP text features.

The teacher here is the in-framework DinoViT (models/vit.py) — run
`extract_teacher_features` offline to populate Scene.features, then
`Student2DTrainer` distills into a conv encoder.
"""
from __future__ import annotations

import dataclasses
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from real_robot_nerf_actor_tpu.models.vit import (
    DinoViT, ViTConfig, extract_dense_features)
from real_robot_nerf_actor_tpu.train.trainer import (
    TrainConfig, TrainState, Trainer, make_optimizer)


class Student2D(nn.Module):
    """Small conv encoder predicting the teacher's dense feature map."""

    d_out: int = 384
    width: int = 64

    @nn.compact
    def __call__(self, images):
        x = images
        for i, f in enumerate([self.width, self.width * 2]):
            x = nn.relu(nn.Conv(f, (3, 3), strides=(2, 2), padding=1)(x))
        x = nn.relu(nn.Conv(self.width * 2, (3, 3), padding=1)(x))
        return nn.Conv(self.d_out, (1, 1))(x)


def extract_teacher_features(vit_variables, images: np.ndarray,
                             cfg: ViTConfig = ViTConfig(),
                             feature_layer: int = 9, attn_layer: int = 11,
                             pca_components: int | None = None):
    """Batch DINO dense-feature extraction (correspondence/extract_dino_*):
    images (N, H, W, 3) in [0,1] -> (features (N, gh, gw, D), attn).

    pca_components: when set (and smaller than the teacher width), the
    feature maps are PCA-reduced like the reference's renderer-loss prep
    (neural_rendering.py:636-646) before being used as gt_embed."""
    vit = DinoViT(cfg)
    feats, attn = extract_dense_features(
        vit, vit_variables, jnp.asarray(images), feature_layer, attn_layer)
    if pca_components is not None and pca_components < feats.shape[-1]:
        from real_robot_nerf_actor_tpu.utils.pca import pca_fit_transform
        feats = pca_fit_transform(feats, pca_components)
    return np.asarray(feats), np.asarray(attn)


def extract_clip_features(clip_variables, images: np.ndarray,
                          cfg=None) -> np.ndarray:
    """Batch CLIP dense-feature extraction — the reference's CLIP dumper
    (correspondence/extract_clip_feature.py saves the visual tower's
    prepool (H/32, W/32, 2048) maps to features_clip_2048.npz).

    images (N, H, W, 3) in [0,1]; clip_variables from
    models.clip_visual.convert_clip_visual_weights.
    """
    import jax
    from real_robot_nerf_actor_tpu.models.clip_visual import (
        ClipVisualConfig, ClipVisualResNet)
    cfg = cfg or ClipVisualConfig()
    mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
    x = (np.asarray(images, np.float32) - mean) / std
    net = ClipVisualResNet(cfg)
    return np.asarray(jax.jit(net.apply)(clip_variables, jnp.asarray(x)))


@dataclasses.dataclass(frozen=True)
class Distill2DConfig:
    d_feature: int = 384
    width: int = 64
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)


class Student2DTrainer:
    def __init__(self, cfg: Distill2DConfig):
        self.cfg = cfg
        self.net = Student2D(cfg.d_feature, cfg.width)
        self.tx = make_optimizer(cfg.train.optim)

    def init_state(self, rng, image_shape=(64, 64)) -> TrainState:
        params = self.net.init(
            rng, jnp.zeros((1, *image_shape, 3)))["params"]
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=self.tx.init(params), extra={})

    def train_step(self, state: TrainState, batch, rng):
        """batch: images (B,H,W,3) in [0,1], features (B,hf,wf,D)."""

        def loss_fn(params):
            pred = self.net.apply({"params": params}, batch["images"])
            tgt = batch["features"]
            if pred.shape[1:3] != tgt.shape[1:3]:
                pred = jax.image.resize(
                    pred, (pred.shape[0], *tgt.shape[1:3], pred.shape[-1]),
                    method="bilinear")
            return jnp.mean((pred - tgt) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(step=state.step + 1, params=params,
                           opt_state=opt_state, extra=state.extra),
                {"loss": loss})

    def make_trainer(self, data: Iterator) -> Trainer:
        return Trainer(self.cfg.train, self.train_step, data, self.init_state)
