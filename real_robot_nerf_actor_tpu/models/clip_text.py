"""CLIP text tower (flax) + BPE-free tokenizer interface.

Reference behavior: /root/reference/train_peract_single_kitchen_single_task.py:361-373
(_clip_encode_text): token embedding + positional embedding -> causal
transformer -> final LayerNorm; returns BOTH the per-token embeddings
(B, 77, 512) — the PerceiverIO language conditioning — and the pooled
EOT-projected feature.

Tokenization: `tokenize` dispatches to the real BPE
(`models.clip_bpe.ClipBPETokenizer`) when a merges file path is supplied
(the standard ``bpe_simple_vocab_16e6.txt.gz``), and otherwise to the
deterministic `tokenize_simple` stand-in. The module also supports
  (a) weight conversion from an open CLIP torch state_dict
      (`convert_torch_clip_text_weights`), and
  (b) precomputed-embedding operation (the reference treats language
      features as per-task constants — data/ supplies them).
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def tokenize_simple(texts, context_length: int = 77,
                    vocab_size: int = 49408) -> np.ndarray:
    """Deterministic stand-in tokenizer with CLIP's framing (SOT ... EOT,
    zero-padded, EOT has the highest id so argmax pooling works).

    The real CLIP BPE needs its merges file (not bundled, zero-egress);
    this hashes whitespace tokens into the vocab range. Swap in a real BPE
    via any callable with the same (texts) -> (B, 77) int32 contract when
    converting pretrained CLIP weights.
    """
    if isinstance(texts, str):
        texts = [texts]
    sot, eot = vocab_size - 2, vocab_size - 1
    out = np.zeros((len(texts), context_length), np.int64)
    for i, t in enumerate(texts):
        ids = [sot]
        for w in t.lower().strip().split():
            h = 0
            for ch in w:
                h = (h * 131 + ord(ch)) % (vocab_size - 3)
            ids.append(1 + h)
        ids = ids[: context_length - 1] + [eot]
        out[i, : len(ids)] = ids
    return out.astype(np.int32)


_BPE_CACHE: Dict[str, object] = {}


def tokenize(texts, context_length: int = 77, bpe_path: str | None = None
             ) -> np.ndarray:
    """(B, context_length) int32 token ids with CLIP SOT/EOT framing.

    With ``bpe_path`` (the standard merges file), this is the real CLIP
    tokenizer — identical ids to the reference
    (correspondence/clip.py:642) — required for end-to-end parity with a
    converted checkpoint. Without it, the hash stand-in keeps synthetic
    pipelines deterministic.
    """
    if bpe_path is not None:
        tok = _BPE_CACHE.get(bpe_path)
        if tok is None:
            from real_robot_nerf_actor_tpu.models.clip_bpe import (
                ClipBPETokenizer)
            tok = _BPE_CACHE[bpe_path] = ClipBPETokenizer.from_file(bpe_path)
        return tok.tokenize(texts, context_length)
    return tokenize_simple(texts, context_length)


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 1024   # RN50 projection dim


class _ClipBlock(nn.Module):
    heads: int

    @nn.compact
    def __call__(self, x, mask):
        h = nn.LayerNorm(name="ln_1")(x)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, name="attn")(h, h, mask=mask)
        x = x + attn
        h = nn.LayerNorm(name="ln_2")(x)
        h = nn.Dense(x.shape[-1] * 4, name="fc")(h)
        h = h * jax.nn.sigmoid(1.702 * h)  # QuickGELU (CLIP)
        h = nn.Dense(x.shape[-1], name="proj")(h)
        return x + h


class ClipTextEncoder(nn.Module):
    cfg: ClipTextConfig = ClipTextConfig()

    @nn.compact
    def __call__(self, tokens: jnp.ndarray):
        """tokens: (B, 77) int32. Returns (pooled (B, embed_dim),
        per_token (B, 77, width))."""
        c = self.cfg
        b, n = tokens.shape
        emb = nn.Embed(c.vocab_size, c.width, name="token_embedding")(tokens)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01), (c.context_length, c.width))
        x = emb + pos[None, :n]
        causal = jnp.tril(jnp.ones((n, n), bool))[None, None]
        for i in range(c.layers):
            x = _ClipBlock(c.heads, name=f"resblock_{i}")(x, causal)
        x = nn.LayerNorm(name="ln_final")(x)
        per_token = x
        eot = jnp.argmax(tokens, axis=-1)  # EOT has the highest token id
        pooled = x[jnp.arange(b), eot]
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (c.width, c.embed_dim))
        return pooled @ proj, per_token


def convert_torch_clip_text_weights(state_dict: dict, cfg: ClipTextConfig) -> dict:
    """Map an open CLIP torch checkpoint's text tower to flax params."""
    p: Dict = {}

    def put(path, arr):
        node = p
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(np.asarray(arr))

    sd = state_dict
    put(["token_embedding", "embedding"], sd["token_embedding.weight"])
    put(["positional_embedding"], sd["positional_embedding"])
    put(["text_projection"], sd["text_projection"])
    put(["ln_final", "scale"], sd["ln_final.weight"])
    put(["ln_final", "bias"], sd["ln_final.bias"])
    w = cfg.width
    for i in range(cfg.layers):
        t = f"transformer.resblocks.{i}."
        blk = f"resblock_{i}"
        put([blk, "ln_1", "scale"], sd[t + "ln_1.weight"])
        put([blk, "ln_1", "bias"], sd[t + "ln_1.bias"])
        wqkv = np.asarray(sd[t + "attn.in_proj_weight"])   # (3w, w)
        bqkv = np.asarray(sd[t + "attn.in_proj_bias"])
        h = cfg.heads
        hd = w // h
        for j, nmm in enumerate(["query", "key", "value"]):
            put([blk, "attn", nmm, "kernel"],
                np.transpose(wqkv[j * w:(j + 1) * w]).reshape(w, h, hd))
            put([blk, "attn", nmm, "bias"], bqkv[j * w:(j + 1) * w].reshape(h, hd))
        put([blk, "attn", "out", "kernel"],
            np.transpose(sd[t + "attn.out_proj.weight"]).reshape(h, hd, w))
        put([blk, "attn", "out", "bias"], sd[t + "attn.out_proj.bias"])
        put([blk, "ln_2", "scale"], sd[t + "ln_2.weight"])
        put([blk, "ln_2", "bias"], sd[t + "ln_2.bias"])
        put([blk, "fc", "kernel"], np.transpose(sd[t + "mlp.c_fc.weight"]))
        put([blk, "fc", "bias"], sd[t + "mlp.c_fc.bias"])
        put([blk, "proj", "kernel"], np.transpose(sd[t + "mlp.c_proj.weight"]))
        put([blk, "proj", "bias"], sd[t + "mlp.c_proj.bias"])
    return {"params": p}
