"""DINO Vision Transformer feature extractor (flax).

Reference behavior: /root/reference/dino.py:26-177 +
vision_transformer_flexible.py: a DINO ViT-S/8 (or B/16) whose layer-9 keys
serve as dense features and whose layer-11 cls attention map is an extra
supervision signal; inputs are ImageNet-normalized; positional embeddings
are bilinearly interpolated for non-native resolutions.

TPU redesign: one jitted forward that returns per-layer {tokens, q, k, v,
attn} for a requested set of layers (the reference's get_specific_tokens),
batched — no MAX_BATCH_SIZE chunk loop (dino.py:98-120); XLA handles any
batch. Weights can be converted from the public DINO torch checkpoint with
`convert_torch_dino_weights` when a file is available; otherwise random
init (feature-distillation targets can also be precomputed offline).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 8
    embed_dim: int = 384           # ViT-S
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    image_size: int = 224          # native pos-emb grid


class _Attention(nn.Module):
    num_heads: int

    @nn.compact
    def __call__(self, x, want_qkv: bool = False):
        b, n, c = x.shape
        h = self.num_heads
        qkv = nn.Dense(c * 3, name="qkv")(x).reshape(b, n, 3, h, c // h)
        qkv = qkv.transpose(2, 0, 3, 1, 4)  # (3, B, H, N, d)
        q, k, v = qkv[0], qkv[1], qkv[2]
        scale = (c // h) ** -0.5
        sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                         preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = nn.Dense(c, name="proj")(out)
        extras = {"q": q, "k": k, "v": v, "attn": attn} if want_qkv else None
        return out, extras


class _Block(nn.Module):
    num_heads: int
    mlp_ratio: float

    @nn.compact
    def __call__(self, x, want_qkv: bool = False):
        y, extras = _Attention(self.num_heads, name="attn")(
            nn.LayerNorm(name="norm1")(x), want_qkv)
        x = x + y
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(int(x.shape[-1] * self.mlp_ratio), name="fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(x.shape[-1], name="fc2")(h)
        return x + h, extras


class DinoViT(nn.Module):
    cfg: ViTConfig = ViTConfig()

    @nn.compact
    def __call__(self, images: jnp.ndarray,
                 layers_to_return: Sequence[int] = (),
                 normalize: bool = True) -> Dict:
        """images: (B, H, W, 3) in [0, 1]. Returns dict with 'tokens'
        (final, post-norm) and per-layer extras for layers_to_return:
        {layer: {'tokens','q','k','v','attn'}}. Token 0 is CLS."""
        c = self.cfg
        if normalize:
            mean = jnp.asarray(IMAGENET_MEAN)
            std = jnp.asarray(IMAGENET_STD)
            images = (images - mean) / std
        b, h, w, _ = images.shape
        p = c.patch_size
        x = nn.Conv(c.embed_dim, (p, p), strides=(p, p), name="patch_embed")(
            images)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, c.embed_dim)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, c.embed_dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, c.embed_dim)), x], 1)

        native = c.image_size // p
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, native * native + 1, c.embed_dim))
        pos_patch = pos[:, 1:].reshape(1, native, native, c.embed_dim)
        if (gh, gw) != (native, native):
            pos_patch = jax.image.resize(
                pos_patch, (1, gh, gw, c.embed_dim), method="bicubic")
        pos_all = jnp.concatenate(
            [pos[:, :1], pos_patch.reshape(1, gh * gw, c.embed_dim)], 1)
        x = x + pos_all

        want = set(layers_to_return)
        per_layer: Dict[int, Dict] = {}
        for i in range(c.depth):
            x, extras = _Block(c.num_heads, c.mlp_ratio, name=f"block_{i}")(
                x, want_qkv=i in want)
            if i in want:
                per_layer[i] = {"tokens": x, **extras}
        x = nn.LayerNorm(name="norm")(x)
        return {"tokens": x, "layers": per_layer, "grid": (gh, gw)}


def extract_dense_features(vit: DinoViT, variables, images: jnp.ndarray,
                           feature_layer: int = 9, attn_layer: int = 11):
    """The reference's extract_features_and_attn (dino.py:78-123): dense
    features = layer `feature_layer` keys (CLS dropped, heads flattened),
    reshaped to (B, gh, gw, D); cls attention = layer `attn_layer` attention
    from CLS to patches, (B, heads, gh, gw)."""
    out = vit.apply(variables, images,
                    layers_to_return=(feature_layer, attn_layer))
    gh, gw = out["grid"]
    k = out["layers"][feature_layer]["k"]          # (B, H, N, d)
    b, h, n, d = k.shape
    feats = k.transpose(0, 2, 1, 3).reshape(b, n, h * d)[:, 1:]
    feats = feats.reshape(b, gh, gw, h * d)
    attn = out["layers"][attn_layer]["attn"][:, :, 0, 1:]  # CLS -> patches
    attn = attn.reshape(b, -1, gh, gw)
    return feats, attn


def convert_torch_dino_weights(state_dict: dict, cfg: ViTConfig) -> dict:
    """Map a public DINO torch checkpoint to this module's flax params."""
    p: Dict = {}

    def put(path: List[str], arr):
        node = p
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(np.asarray(arr))

    sd = {k: v for k, v in state_dict.items()}
    put(["patch_embed", "kernel"],
        np.transpose(sd["patch_embed.proj.weight"], (2, 3, 1, 0)))
    put(["patch_embed", "bias"], sd["patch_embed.proj.bias"])
    put(["cls_token"], sd["cls_token"])
    put(["pos_embed"], sd["pos_embed"])
    for i in range(cfg.depth):
        t = f"blocks.{i}."
        blk = f"block_{i}"
        put([blk, "norm1", "scale"], sd[t + "norm1.weight"])
        put([blk, "norm1", "bias"], sd[t + "norm1.bias"])
        put([blk, "attn", "qkv", "kernel"], np.transpose(sd[t + "attn.qkv.weight"]))
        put([blk, "attn", "qkv", "bias"], sd[t + "attn.qkv.bias"])
        put([blk, "attn", "proj", "kernel"], np.transpose(sd[t + "attn.proj.weight"]))
        put([blk, "attn", "proj", "bias"], sd[t + "attn.proj.bias"])
        put([blk, "norm2", "scale"], sd[t + "norm2.weight"])
        put([blk, "norm2", "bias"], sd[t + "norm2.bias"])
        put([blk, "fc1", "kernel"], np.transpose(sd[t + "mlp.fc1.weight"]))
        put([blk, "fc1", "bias"], sd[t + "mlp.fc1.bias"])
        put([blk, "fc2", "kernel"], np.transpose(sd[t + "mlp.fc2.weight"]))
        put([blk, "fc2", "bias"], sd[t + "mlp.fc2.bias"])
    put(["norm", "scale"], sd["norm.weight"])
    put(["norm", "bias"], sd["norm.bias"])
    return {"params": p}


def convert_torch_mae_weights(checkpoint: dict, cfg: ViTConfig) -> dict:
    """Map an MAE/MVP torch checkpoint to this module's flax params.

    The MVP encoders (reference featurenerf_robo/src/representations/mvp.py,
    `mvp.load("vitb-mae-egosoup")`) are MAE-pretrained ViT-B/16 models whose
    ENCODER keys share the timm layout the DINO converter handles. What MAE
    checkpoints add on top:
      - the state dict is usually wrapped under a "model" (or "state_dict")
        key, sometimes with a "module." DDP prefix;
      - decoder-side keys (decoder_*, mask_token) that must be dropped;
      - fine-tuned variants store the final norm as "fc_norm".
    This normalizes all of that and delegates to convert_torch_dino_weights.
    """
    sd = checkpoint
    for wrapper in ("model", "state_dict"):
        if wrapper in sd and isinstance(sd[wrapper], dict):
            sd = sd[wrapper]
    sd = {(k[len("module."):] if k.startswith("module.") else k): v
          for k, v in sd.items()}
    sd = {k: v for k, v in sd.items()
          if not (k.startswith("decoder_") or k == "mask_token")}
    if "norm.weight" not in sd and "fc_norm.weight" in sd:
        sd["norm.weight"] = sd.pop("fc_norm.weight")
        sd["norm.bias"] = sd.pop("fc_norm.bias")
    return convert_torch_dino_weights(sd, cfg)
