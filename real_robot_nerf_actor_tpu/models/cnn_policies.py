"""CNN policy networks (the reference's network_utils actor heads).

Reference behavior: /root/reference/network_utils.py —
  SiameseNet (:479-518): shared conv trunk over multiple image streams;
  CNNAndFcsNet (:520-577): conv encoder + proprio-concat MLP head;
  CNNLangAndFcsNet (:580-668): same with FiLM language conditioning
  (Conv2DFiLMBlock, :112-127); ViT (:745-...) image encoder.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from real_robot_nerf_actor_tpu.models.blocks import act_fn, init_for


class Conv2DBlock(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    activation: Optional[str] = "relu"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel_size,) * 2,
                    strides=(self.stride,) * 2, padding="SAME",
                    kernel_init=init_for(self.activation))(x)
        return act_fn(self.activation)(x)


class FiLM(nn.Module):
    """Feature-wise linear modulation from a conditioning vector."""

    @nn.compact
    def __call__(self, x, cond):
        c = x.shape[-1]
        gb = nn.Dense(2 * c)(cond)
        gamma, beta = jnp.split(gb, 2, axis=-1)
        return x * (1.0 + gamma[:, None, None]) + beta[:, None, None]


class SiameseNet(nn.Module):
    """Shared conv trunk applied to each input stream, outputs concatenated."""

    filters: Sequence[int] = (32, 64)
    activation: str = "relu"

    @nn.compact
    def __call__(self, streams: Sequence[jnp.ndarray]) -> jnp.ndarray:
        trunk = [Conv2DBlock(f, 3, 2, self.activation, name=f"conv{i}")
                 for i, f in enumerate(self.filters)]
        outs = []
        for s in streams:
            x = s
            for blk in trunk:
                x = blk(x)
            outs.append(x.reshape(x.shape[0], -1))
        return jnp.concatenate(outs, axis=-1)


class CNNAndFcsNet(nn.Module):
    """Conv encoder + low-dim concat + MLP head -> action logits/values."""

    filters: Sequence[int] = (32, 32, 64)
    fc_layers: Sequence[int] = (256, 128)
    out_dim: int = 8
    activation: str = "relu"

    @nn.compact
    def __call__(self, observations: jnp.ndarray, low_dim_ins: jnp.ndarray):
        x = observations
        for i, f in enumerate(self.filters):
            x = Conv2DBlock(f, 3, 2, self.activation, name=f"conv{i}")(x)
        x = x.reshape(x.shape[0], -1)
        x = jnp.concatenate([x, low_dim_ins], axis=-1)
        for i, f in enumerate(self.fc_layers):
            x = act_fn(self.activation)(nn.Dense(f, name=f"fc{i}")(x))
        return nn.Dense(self.out_dim, name="head")(x)


class CNNLangAndFcsNet(nn.Module):
    """CNNAndFcsNet with FiLM language conditioning after each conv."""

    filters: Sequence[int] = (32, 32, 64)
    fc_layers: Sequence[int] = (256, 128)
    out_dim: int = 8
    activation: str = "relu"

    @nn.compact
    def __call__(self, observations, low_dim_ins, lang_goal_emb):
        x = observations
        for i, f in enumerate(self.filters):
            x = Conv2DBlock(f, 3, 2, self.activation, name=f"conv{i}")(x)
            x = FiLM(name=f"film{i}")(x, lang_goal_emb)
        x = x.reshape(x.shape[0], -1)
        x = jnp.concatenate([x, low_dim_ins], axis=-1)
        for i, f in enumerate(self.fc_layers):
            x = act_fn(self.activation)(nn.Dense(f, name=f"fc{i}")(x))
        return nn.Dense(self.out_dim, name="head")(x)


class SpatialSoftmax2D(nn.Module):
    """2-D soft-argmax keypoints (per-channel expected xy in [-1, 1])."""

    temperature: float = 0.01

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = feat.shape
        flat = feat.transpose(0, 3, 1, 2).reshape(b * c, h * w)
        att = jax.nn.softmax(flat / self.temperature, axis=-1)
        ys = jnp.linspace(-1, 1, h)
        xs = jnp.linspace(-1, 1, w)
        py, px = jnp.meshgrid(ys, xs, indexing="ij")
        ex = att @ px.reshape(-1)
        ey = att @ py.reshape(-1)
        return jnp.stack([ex, ey], -1).reshape(b, c * 2)
