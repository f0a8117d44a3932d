"""CLIP visual tower (ModifiedResNet RN50) — dense feature dumper + pooled
embedding.

Reference behavior: /root/reference/featurenerf_robo/correspondence/clip.py:128-230
(ModifiedResNet: 3-conv stem with avgpool, anti-aliased strided bottlenecks
where an avgpool precedes the stride-1 conv, attention pooling) and
extract_clip_feature.py (the dumper calls ``forward`` = ``prepool``: the
(B, H/32, W/32, 2048) dense map BEFORE attnpool is what gets saved to npz).

Weights are data: `convert_clip_visual_weights` maps the visual half of an
OpenAI CLIP RN50 state_dict (golden-tested against an independent torch
forward in tests/test_clip_visual.py). NHWC, frozen batch-norm statistics.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class ClipVisualConfig:
    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)   # RN50
    width: int = 64
    output_dim: int = 1024
    heads: int = 32
    input_resolution: int = 224

    @property
    def feat_dim(self) -> int:
        return self.width * 32        # 2048 for RN50


def _bn(name: str):
    return nn.BatchNorm(use_running_average=True, momentum=0.9,
                        epsilon=1e-5, name=name)


def _avg_pool(x, k):
    return nn.avg_pool(x, (k, k), (k, k))


class _ClipBottleneck(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        r = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(_bn("bn1")(y))
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        y = nn.relu(_bn("bn2")(y))
        if self.stride > 1:           # anti-aliased: avgpool, stride-1 conv
            y = _avg_pool(y, self.stride)
        y = _bn("bn3")(nn.Conv(out_ch, (1, 1), use_bias=False,
                               name="conv3")(y))
        if self.stride > 1 or x.shape[-1] != out_ch:
            if self.stride > 1:
                r = _avg_pool(r, self.stride)
            r = _bn("down_bn")(nn.Conv(out_ch, (1, 1), use_bias=False,
                                       name="down_conv")(r))
        return nn.relu(y + r)


class ClipAttentionPool(nn.Module):
    heads: int
    output_dim: int

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        """feats: (B, H, W, C) -> (B, output_dim). Query = mean token."""
        b, h, w, c = feats.shape
        toks = feats.reshape(b, h * w, c)
        toks = jnp.concatenate([toks.mean(1, keepdims=True), toks], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(c ** -0.5), (h * w + 1, c))
        toks = toks + pos[None]
        q = nn.Dense(c, name="q_proj")(toks[:, :1])
        k = nn.Dense(c, name="k_proj")(toks)
        v = nn.Dense(c, name="v_proj")(toks)
        hd = c // self.heads
        q = q.reshape(b, 1, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, -1, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, -1, self.heads, hd).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd), axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, c)
        return nn.Dense(self.output_dim, name="c_proj")(out)


class ClipVisualResNet(nn.Module):
    cfg: ClipVisualConfig = ClipVisualConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray, pool: bool = False) -> jnp.ndarray:
        """x: (B, H, W, 3) normalized images. pool=False returns the dense
        prepool map (B, H/32, W/32, 2048) — the dumper's output; pool=True
        returns the attention-pooled (B, output_dim) embedding."""
        c = self.cfg
        w = c.width
        for i, (ch, stride) in enumerate(((w // 2, 2), (w // 2, 1), (w, 1))):
            x = nn.Conv(ch, (3, 3), (stride, stride), padding=1,
                        use_bias=False, name=f"conv{i + 1}")(x)
            x = nn.relu(_bn(f"bn{i + 1}")(x))
        x = _avg_pool(x, 2)
        for stage, n_blocks in enumerate(c.layers):
            planes = w * (2 ** stage)
            for i in range(n_blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                x = _ClipBottleneck(planes, stride,
                                    name=f"layer{stage + 1}_{i}")(x)
        if pool:
            return ClipAttentionPool(c.heads, c.output_dim,
                                     name="attnpool")(x)
        return x


def convert_clip_visual_weights(state_dict: Dict,
                                cfg: ClipVisualConfig = ClipVisualConfig()
                                ) -> dict:
    """Map the ``visual.*`` entries of an OpenAI CLIP state_dict (or an
    already-stripped visual state_dict) to this module's variables."""
    sd = {}
    for k, v in state_dict.items():
        sd[k[len("visual."):] if k.startswith("visual.") else k] = v
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(np.asarray(val))

    def conv(dst, src):
        put(params, dst + ["kernel"],
            np.asarray(sd[src + ".weight"]).transpose(2, 3, 1, 0))

    def bn(dst, src):
        put(params, dst + ["scale"], sd[src + ".weight"])
        put(params, dst + ["bias"], sd[src + ".bias"])
        put(stats, dst + ["mean"], sd[src + ".running_mean"])
        put(stats, dst + ["var"], sd[src + ".running_var"])

    for i in (1, 2, 3):
        conv([f"conv{i}"], f"conv{i}")
        bn([f"bn{i}"], f"bn{i}")
    for stage, n_blocks in enumerate(cfg.layers):
        for i in range(n_blocks):
            t = f"layer{stage + 1}.{i}"
            d = f"layer{stage + 1}_{i}"
            for cidx in (1, 2, 3):
                conv([d, f"conv{cidx}"], f"{t}.conv{cidx}")
                bn([d, f"bn{cidx}"], f"{t}.bn{cidx}")
            if f"{t}.downsample.0.weight" in sd:
                conv([d, "down_conv"], f"{t}.downsample.0")
                bn([d, "down_bn"], f"{t}.downsample.1")
    if "attnpool.positional_embedding" in sd:
        ap = params.setdefault("attnpool", {})
        ap["positional_embedding"] = jnp.asarray(
            np.asarray(sd["attnpool.positional_embedding"]))
        for name in ("q_proj", "k_proj", "v_proj", "c_proj"):
            ap[name] = {
                "kernel": jnp.asarray(
                    np.asarray(sd[f"attnpool.{name}.weight"]).T),
                "bias": jnp.asarray(np.asarray(sd[f"attnpool.{name}.bias"])),
            }
    return {"params": params, "batch_stats": stats}
