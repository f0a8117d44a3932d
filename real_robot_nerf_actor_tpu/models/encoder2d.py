"""2-D image encoders for pixel-aligned NeRF conditioning (flax).

Reference behavior: /root/reference/featurenerf_robo/featurenerf/src/model/encoder.py:
  - SpatialEncoder: ResNet18/34 backbone cut after `num_layers` stages;
    feature maps from every stage are upsampled to the stage-1 resolution
    (H/2 x W/2) and concatenated -> d_latent (64+64+128+256 = 512 for
    ResNet34 at num_layers=4; 64+64+128+256=512 for ResNet18 too)
  - index(uv): pixel-aligned latent lookup by projecting query points into
    the image and bilinearly sampling the feature map
  - ImageEncoder: global pooled feature vector

TPU design: the backbone is a compact flax ResNet (BasicBlock), NHWC
layout; `index` reuses the framework's vectorized bilinear sampler (one
fused gather instead of grid_sample calls per chunk).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=1, use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        if x.shape[-1] != self.features or self.stride != 1:
            x = nn.Conv(self.features, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
        return nn.relu(x + y)


@dataclasses.dataclass(frozen=True)
class SpatialEncoderConfig:
    stage_features: Tuple[int, ...] = (64, 64, 128, 256)
    blocks_per_stage: int = 2      # ResNet18-style
    upsample_to_stage: int = 0     # concat all stages at stage-0 resolution


class SpatialEncoder(nn.Module):
    """Multi-scale pixel-aligned feature extractor.

    images (B, H, W, 3) in [-1, 1] -> latent (B, H/2, W/2, d_latent) with
    d_latent = sum(stage_features).
    """

    cfg: SpatialEncoderConfig = SpatialEncoderConfig()

    @property
    def d_latent(self) -> int:
        return sum(self.cfg.stage_features)

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = self.cfg
        x = nn.Conv(c.stage_features[0], (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, name="stem")(images)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)

        feats = [x]
        for si, f in enumerate(c.stage_features[1:], start=1):
            stride = 2 if si > 1 else 1
            # stage 1 keeps resolution via maxpool like ResNet
            if si == 1:
                x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
            for bi in range(c.blocks_per_stage):
                x = BasicBlock(f, stride=stride if bi == 0 and si > 1 else 1,
                               name=f"stage{si}_block{bi}")(x, train)
            feats.append(x)

        target = feats[c.upsample_to_stage].shape[1:3]
        ups = []
        for f in feats:
            if f.shape[1:3] != target:
                f = jax.image.resize(
                    f, (f.shape[0], *target, f.shape[-1]), method="bilinear")
            ups.append(f)
        return jnp.concatenate(ups, axis=-1)


def bilinear_sample_2d(feat: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixel-aligned latent lookup (the reference's encoder.index).

    feat: (B, H, W, C); uv: (B, N, 2) normalized to [-1, 1] (x right,
    y down — torch grid_sample 2D convention, align_corners=True, border
    padding). Returns (B, N, C).
    """
    b, h, w, c = feat.shape
    x = (uv[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (uv[..., 1] + 1.0) * 0.5 * (h - 1)
    x = jnp.clip(x, 0, w - 1)
    y = jnp.clip(y, 0, h - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0)[..., None]
    ty = (y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)

    flatf = feat.reshape(b, h * w, c)

    def take(yi, xi):
        return jnp.take_along_axis(flatf, (yi * w + xi)[..., None], axis=1)

    v00, v01 = take(y0, x0), take(y0, x1)
    v10, v11 = take(y1, x0), take(y1, x1)
    v0 = v00 * (1 - tx) + v01 * tx
    v1 = v10 * (1 - tx) + v11 * tx
    return v0 * (1 - ty) + v1 * ty


class ImageEncoder(nn.Module):
    """Global image feature (reference encoder.py ImageEncoder)."""

    latent_size: int = 128
    cfg: SpatialEncoderConfig = SpatialEncoderConfig()

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = SpatialEncoder(self.cfg, name="backbone")(images, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.latent_size)(x)


class ConvEncoder(nn.Module):
    """Basic convolutional encoder with a global bottleneck and skip-concat
    up path (reference custom_encoder.py ConvEncoder).

    conv_in (k7/s2) -> 3 stride-2 down stages doubling channels (skips
    recorded) -> conv_mid (k4/s4) -> the bottleneck map is FLATTENED into
    one vector and broadcast over the coarsest skip's spatial grid -> up
    path deconv(k3/s2) over [broadcast|skip] concat -> deconv_last to
    `last_channels` at half input resolution. GroupNorm + LeakyReLU
    everywhere (the reference's default norm_layer is group norm; its
    'reflect' same-padding is folded into SAME conv padding here).

    Designed (like the reference) around 128x128 inputs, where the
    flattened bottleneck is 2*2*mid_channels = 512 = 4x the first down
    stage's channels.
    """

    dim_in: int = 3
    first_channels: int = 64
    mid_channels: int = 128
    last_channels: int = 128
    n_down_layers: int = 3
    use_skip_conn: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = lambda v: jax.nn.leaky_relu(v, 0.01)

        def gn(v):
            return nn.GroupNorm(num_groups=min(32, v.shape[-1]))(v)

        x = act(gn(nn.Conv(self.first_channels, (7, 7), strides=(2, 2),
                           padding="SAME", use_bias=False,
                           name="conv_in")(x)))
        inters = []
        ch = self.first_channels
        for i in range(self.n_down_layers):
            x = act(gn(nn.Conv(2 * ch, (3, 3), strides=(2, 2),
                               padding="SAME", use_bias=False,
                               name=f"conv{i}")(x)))
            inters.append(x)
            ch *= 2
        x = act(gn(nn.Conv(self.mid_channels, (4, 4), strides=(4, 4),
                           padding="SAME", use_bias=False,
                           name="conv_mid")(x)))
        # global bottleneck: flatten and broadcast over the coarsest skip
        b = x.shape[0]
        hw = inters[-1].shape[1:3]
        x = x.reshape(b, 1, 1, -1)
        x = jnp.broadcast_to(x, (b,) + hw + (x.shape[-1],))
        for i in reversed(range(self.n_down_layers)):
            if self.use_skip_conn:
                x = jnp.concatenate([x, inters[i]], axis=-1)
            ch //= 2
            x = act(gn(nn.ConvTranspose(ch, (3, 3), strides=(2, 2),
                                        padding="SAME", use_bias=False,
                                        name=f"deconv{i}")(x)))
        return nn.ConvTranspose(self.last_channels, (3, 3), strides=(2, 2),
                                padding="SAME", name="deconv_last")(x)
