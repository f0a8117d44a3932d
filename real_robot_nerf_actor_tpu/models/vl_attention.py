"""Visual-language fusion modules.

Reference behavior: /root/reference/network_utils.py:1017-1131
(LanguageInformedVisualAttention, VLCrossAttention) and attention.py
(Visual3DLangTransformer) — cross-attention from visual tokens (voxel or
point features) to language tokens with gating; the reference wires these
into ResnetFC behind a disabled flag (resnetfc.py:115-118) and uses gated
variants in its VL agents.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class VLCrossAttention(nn.Module):
    """Visual queries attend to language tokens; output gated residual."""

    n_heads: int = 6
    d_head: int = 64
    gated: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, visual: jnp.ndarray, lang: jnp.ndarray) -> jnp.ndarray:
        """visual: (B, Nv, Dv); lang: (B, Nl, Dl) -> (B, Nv, Dv)."""
        dv = visual.shape[-1]
        inner = self.n_heads * self.d_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(
            nn.LayerNorm()(visual))
        ln = nn.LayerNorm(name="norm_lang")(lang)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ln)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ln)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.n_heads, self.d_head).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        sim = jnp.einsum("bhid,bhjd->bhij", qh, kh,
                         preferred_element_type=jnp.float32)
        sim = sim * (self.d_head ** -0.5)
        attn = jax.nn.softmax(sim, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(visual.shape[0], -1, inner)
        out = nn.Dense(dv, dtype=self.dtype, name="to_out")(out)
        if self.gated:
            gate = self.param("gate", nn.initializers.zeros, (1,))
            out = out * jnp.tanh(gate)
        return visual + out.astype(visual.dtype)


class Visual3DLangTransformer(nn.Module):
    """Stacked VL cross-attention + FF (the reference's 3D VL transformer)."""

    depth: int = 1
    n_heads: int = 6
    d_head: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, visual: jnp.ndarray, lang: jnp.ndarray) -> jnp.ndarray:
        x = visual
        for i in range(self.depth):
            x = VLCrossAttention(self.n_heads, self.d_head, dtype=self.dtype,
                                 name=f"vl_{i}")(x, lang)
            h = nn.LayerNorm()(x)
            h = nn.Dense(x.shape[-1] * 4, dtype=self.dtype)(h)
            h = nn.gelu(h)
            h = nn.Dense(x.shape[-1], dtype=self.dtype)(h)
            x = x + h.astype(x.dtype)
        return x


class LanguageInformedVisualAttention(nn.Module):
    """Per-location language-conditioned gating over a spatial feature map
    (FiLM-style attention, network_utils.py:1017-1063)."""

    @nn.compact
    def __call__(self, feat: jnp.ndarray, lang_pooled: jnp.ndarray):
        """feat: (B, ..., C) spatial map; lang_pooled: (B, Dl)."""
        c = feat.shape[-1]
        g = nn.Dense(c, name="lang_proj")(lang_pooled)
        while g.ndim < feat.ndim:
            g = g[:, None]
        attn = jax.nn.sigmoid(jnp.sum(feat * g, axis=-1, keepdims=True)
                              / jnp.sqrt(float(c)))
        return feat * attn
