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
from real_robot_nerf_actor_tpu.models.pointnet2 import PointNet2Encoder
from real_robot_nerf_actor_tpu.models.resnet import (
    RESNET18, RESNET34, RESNET50, TorchvisionResNet)
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
        # fold the registry name into the key: distinct zoo entries produce
        # distinct features even before pretrained weights are loaded
        import zlib
        key = jax.random.fold_in(key, zlib.crc32(self.name.encode()))
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
                   variables: Optional[dict] = None,
                   encoder_cfg: Optional[SpatialEncoderConfig] = None
                   ) -> Embedding:
    """Registry lookup. Names follow the reference's zoo. ``encoder_cfg``
    customizes the pixelnerf/featurenerf backbone (it must match the
    FeatureNerfTrainer checkpoint the variables come from)."""
    name = name.lower()

    def of(module, dim):
        return Embedding(name=name, module=module, out_dim=dim,
                         apply_fn=lambda v, o: module.apply(v, o))

    if name == "zero":
        return Embedding(name, None, out_dim or 1,
                         apply_fn=lambda v, o: jnp.zeros(
                             (np.shape(o)[0], out_dim or 1)))
    if name == "state":
        # identity passthrough for state observations (the reference's
        # state-BC baselines skip the visual encoder entirely)
        return Embedding(name, None, out_dim or -1,
                         apply_fn=lambda v, o: jnp.asarray(o, jnp.float32))
    if name == "simple":
        return of(SimpleCNN(out_dim or 64), out_dim or 64)
    # -- resnet class: torchvision-layout backbones; mocov2/pri3d share the
    # ResNet-50 architecture but load different pretrained checkpoints via
    # models.resnet.convert_{torch_resnet,mocov2}_weights
    # (reference resnet.py / mocov2.py / pri3d.py)
    if name == "resnet18":
        return of(TorchvisionResNet(RESNET18), RESNET18.out_dim)
    if name == "resnet34":
        return of(TorchvisionResNet(RESNET34), RESNET34.out_dim)
    if name in ("resnet50", "imgnet", "mocov2", "pri3d"):
        return of(TorchvisionResNet(RESNET50), RESNET50.out_dim)
    # -- nerf class: pixelnerf = the SpatialEncoder backbone; featurenerf =
    # the same encoder initialized from a FeatureNerfTrainer checkpoint
    # (see featurenerf_encoder_variables)
    if name in ("pixelnerf", "featurenerf"):
        cfg = encoder_cfg or SpatialEncoderConfig()
        dim = out_dim or sum(cfg.stage_features)
        return of(PooledResNet(cfg, 0 if out_dim is None else out_dim), dim)
    # -- transformer class
    if name == "dino":
        return of(DinoCLS(), 384)
    if name == "mvp":   # ViT-B/16 MAE backbone (reference mvp.py), CLS
        # token; pretrained MAE checkpoints load via mvp_encoder_variables
        return of(DinoCLS(MVP_VIT_CFG), 768)
    if name == "pointnet":
        return of(PointNet(out_dim or 128), out_dim or 128)
    if name == "pointnet2":
        return of(PointNet2Encoder(), 1024)
    if name in ("pointnerf", "fusion"):
        m = FusionNet(out_dim or 192)
        return Embedding(name, m, out_dim or 192,
                         apply_fn=lambda v, o: m.apply(v, o))
    raise ValueError(f"unknown embedding {name!r}")


MVP_VIT_CFG = ViTConfig(patch_size=16, embed_dim=768, depth=12,
                        num_heads=12)


def mvp_encoder_variables(checkpoint: dict) -> dict:
    """Variables for the 'mvp' zoo entry from an MAE/MVP torch checkpoint
    (the reference loads mvp.load("vitb-mae-egosoup"),
    featurenerf_robo/src/representations/mvp.py): convert the MAE-layout
    state dict (models/vit.convert_torch_mae_weights) and nest it under the
    DinoCLS wrapper's 'vit' scope."""
    from real_robot_nerf_actor_tpu.models.vit import convert_torch_mae_weights
    conv = convert_torch_mae_weights(checkpoint, MVP_VIT_CFG)
    return {"params": {"vit": conv["params"]}}


def featurenerf_encoder_variables(train_state) -> dict:
    """Variables for the 'featurenerf' zoo entry from a trained
    FeatureNerfTrainer TrainState: the pixelNeRF SpatialEncoder weights
    learned during DINO distillation (reference featurenerf.py: loads the
    pixelnerf checkpoint and keeps ``net.encoder``)."""
    out = {"params": {"SpatialEncoder_0": train_state.params["encoder"]}}
    stats = train_state.extra.get("batch_stats", {}).get("encoder")
    if stats is not None:
        out["batch_stats"] = {"SpatialEncoder_0": stats}
    return out


def probe_out_dim(emb: Embedding, obs_example, key=None) -> int:
    """The reference probes output dims with a dummy forward; same here."""
    key = key if key is not None else jax.random.key(0)
    v = emb.init(key, obs_example)
    out = emb(v, obs_example)
    return int(out.shape[-1])
