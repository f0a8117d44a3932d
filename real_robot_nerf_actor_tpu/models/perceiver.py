"""PerceiverIO language-conditioned voxel Q-network (flax).

Reference architecture (/root/reference/train_peract_single_kitchen_single_task.py:393-656
and the nerfact variant train_nerfact_multi_kitchen.py:570-772):

  voxel grid (B, 100^3, 10ch channel-last)
    -> input preprocess: 1x1x1 conv (peract) or 3-level UNet (nerfact) -> 64ch  [d0]
    -> patchify 5^3 stride-5 conv -> (B, 20^3, 64)
    -> concat broadcast proprio embedding (Dense 7->64) -> 128ch
    -> flatten to 8000 tokens; prepend 77 language tokens (Dense 512->128)
    -> + learned positional embedding (8077, 128)
    -> 1x cross-attention into `num_latents` latents (latent_dim 512)
    -> depth x self-attention (8 heads, 64 dim/head) with pre-LN residuals
    -> decoder cross-attention back to the 8077 tokens -> drop language
    -> reshape (20^3, 128) -> conv-upsample x5 -> skip-concat with d0
    -> trans head: 3^3 conv -> (B, 100^3) Q_trans
    -> rot/grip/collision head: [spatial-softmax + global-max feats of
       d0 / decoded latents / final] -> MLP -> (B, 3*72+2+2)

TPU-first redesign:
  - channel-last NDHWC everywhere; patchify as reshape+matmul (pure MXU)
  - attention is jnp.einsum with fp32 softmax; a Pallas flash-attention
    kernel covers the 2048x8077 cross-attention (ops/attention_pallas)
  - dropout omitted by default (reference uses 0.1 on attention; exposed
    via `dropout_rate` and `deterministic`)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from real_robot_nerf_actor_tpu.models.blocks import (
    ContractFirstConv3D, Conv3DBlock, Conv3DUpsampleBlock, DenseBlock,
    MultiLayer3DEncoderShallow, PatchifyConv3D)
from real_robot_nerf_actor_tpu.ops.spatial_softmax import spatial_softmax_3d


@dataclasses.dataclass(frozen=True)
class PerceiverConfig:
    depth: int = 6
    voxel_size: int = 100
    initial_dim: int = 10
    low_dim_size: int = 7           # proprio dims (trans idx 3 + rot 3 + grip 1)
    num_rotation_classes: int = 72
    num_grip_classes: int = 2
    num_collision_classes: int = 2
    num_latents: int = 2048
    latent_dim: int = 512
    im_channels: int = 64
    cross_heads: int = 1
    latent_heads: int = 8
    cross_dim_head: int = 64
    latent_dim_head: int = 64
    voxel_patch_size: int = 5
    final_dim: int = 64
    lang_emb_dim: int = 512
    lang_max_seq_len: int = 77
    activation: str = "lrelu"
    input_encoder: str = "conv1"    # "conv1" (peract) | "unet" (nerfact)
    return_voxel_feat: bool = False  # nerfact variant returns d0
    dropout_rate: float = 0.0
    compute_dtype: str = "float32"   # "float32" | "bfloat16"
    use_flash_attention: bool = False  # Pallas flash kernel (TPU)
    # "transpose" (fastest on v5e: 34.0 vs subpixel 39.1 ms/forward),
    # "subpixel" (voxel-shuffle), "trilinear" (the reference's op sequence)
    upsample_mode: str = "transpose"
    conv_padding: str = "zeros"      # "zeros" (TPU) | "replicate" (ref)
    # the Pallas k3 kernel wins standalone (3.1 vs ~11 ms) but loses
    # in-graph (layout materialization at the pallas_call boundary +
    # pad copies outweigh it: 48.5 vs 41.5 ms full forward). "conv2d"
    # computes each k3/s1 Conv3D as three 2-D convs over (H,W) slabs with
    # z-shifted adds (exact; ZDecomposedConv3D) — depth folds into batch so
    # XLA keeps the canonical image layout instead of split-spatial 3-D
    # conv layouts: 29.4 vs 34.0 ms bf16 policy forward on v5e (round 4)
    # "xla" | "pallas" | "conv2d" | "conv2d_packed" (odd k, s1; _packed
    # issues one k*Cout-wide conv — full-MXU tap packing, exact vs conv2d)
    conv_backend: str = "conv2d"
    # backend for up0's k5 convs (separate knob so flipping it cannot
    # silently change the numerics of checkpoints trained before it
    # existed; see BENCH_NOTES conv2d borderline-argmax note)
    upsample_conv_backend: str = "xla"
    stats_backend: str = "xla"       # "xla" | "pallas" spatial-softmax stats
    # auxiliary coarse translation head: 20^3 logits read directly off the
    # decoder tokens (before upsample). The 100^3 CE gradient for a target
    # in EMPTY space reaches the trunk only through one voxel's conv
    # window; a coarse CE at the patch resolution gives the trunk a dense,
    # well-supported signal for exactly those free-space targets (round-4
    # forensics: the k3 retreat keyframe — empty-region regression —
    # oscillated for 20k+ steps). Decode semantics are UNCHANGED (argmax
    # still reads the fine head); the aux head only shapes training.
    aux_trans_head: bool = False
    # scale on the LAST proprio dim (the 0/1 gripper bit). The reference
    # feeds raw voxel indices (0..100) + rot bins (0..71) + grip (0/1)
    # straight into proprio_preprocess (train_peract_single_kitchen_
    # single_task.py:907), leaving the grip input ~1/100 the scale of its
    # neighbors — at bs=1 the network can stay grip-blind for 40k+ steps
    # (round-4 forensics: k3 retreat decoded at the grasp voxel). >1
    # rescales the bit to a comparable magnitude; 1.0 = reference parity.
    grip_proprio_scale: float = 1.0

    @property
    def spatial_size(self) -> int:
        return self.voxel_size // self.voxel_patch_size

    @property
    def input_dim_before_seq(self) -> int:
        return self.im_channels * 2


class MHAttention(nn.Module):
    """Multi-head attention with separate context (cross) or self mode.

    q projects from query_dim, kv from context_dim; inner = heads*dim_head;
    output projects back to query_dim. Softmax in fp32.
    """

    heads: int
    dim_head: int
    out_dim: int
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, context=None, deterministic: bool = True):
        context = x if context is None else context
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name="to_q", dtype=self.dtype)(x)
        kv = nn.Dense(inner * 2, use_bias=False, name="to_kv",
                      dtype=self.dtype)(context)
        k, v = jnp.split(kv, 2, axis=-1)

        def split_heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))
        if self.use_flash and self.dropout_rate == 0:
            from real_robot_nerf_actor_tpu.ops.attention_pallas import (
                flash_attention)
            out = flash_attention(q, k, v)
        else:
            # tp: heads sharded over 'model' (to_q/to_kv column-parallel,
            # to_out row-parallel); no-op outside a tensor_parallel context
            from real_robot_nerf_actor_tpu.parallel.constraints import (
                shard_hidden)
            q, k, v = (shard_hidden(t, dim=1) for t in (q, k, v))
            scale = self.dim_head ** -0.5
            sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                             preferred_element_type=jnp.float32) * scale
            attn = jax.nn.softmax(sim.astype(jnp.float32),
                                  axis=-1).astype(v.dtype)
            if self.dropout_rate > 0:
                attn = nn.Dropout(self.dropout_rate)(
                    attn, deterministic=deterministic)
            out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1], inner)
        from real_robot_nerf_actor_tpu.parallel.constraints import shard_hidden
        out = shard_hidden(out)
        return nn.Dense(self.out_dim, name="to_out",
                        dtype=self.dtype)(out).astype(jnp.float32)


class GEGLUFeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim * self.mult * 2, dtype=self.dtype)(x)
        h, gates = jnp.split(h, 2, axis=-1)
        # tp: Megatron cut — first Dense column-parallel, the gated hidden
        # stays sharded, second Dense row-parallel (one psum per FF)
        from real_robot_nerf_actor_tpu.parallel.constraints import shard_hidden
        h = shard_hidden(h * jax.nn.gelu(gates))
        return nn.Dense(self.dim, dtype=self.dtype)(h).astype(jnp.float32)


class PreNormAttn(nn.Module):
    heads: int
    dim_head: int
    out_dim: int
    cross: bool = False
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, context=None, deterministic: bool = True):
        xn = nn.LayerNorm()(x)
        cn = nn.LayerNorm(name="norm_context")(context) if self.cross else None
        return MHAttention(self.heads, self.dim_head, self.out_dim,
                           self.dropout_rate, self.dtype,
                           self.use_flash)(xn, cn, deterministic)


class PreNormFF(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return GEGLUFeedForward(self.dim, dtype=self.dtype)(nn.LayerNorm()(x))


class PerceiverIO(nn.Module):
    cfg: PerceiverConfig

    @nn.compact
    def __call__(self, voxel_grid: jnp.ndarray, proprio: jnp.ndarray,
                 lang_goal_embs: jnp.ndarray, train: bool = False,
                 deterministic: bool = True):
        """voxel_grid: (B, V, V, V, initial_dim) channel-last.
        proprio: (B, low_dim_size). lang_goal_embs: (B, 77, lang_emb_dim).
        Returns (q_trans (B,V,V,V), q_rot_grip (B,3R+2), q_collision (B,2)
        [, voxel_feat (B,V,V,V,im_channels)])."""
        c = self.cfg
        dt = jnp.dtype(c.compute_dtype)
        b = voxel_grid.shape[0]
        v = c.voxel_size
        s = c.spatial_size

        # ---- input preprocess -> d0
        if c.input_encoder == "unet":
            d0 = MultiLayer3DEncoderShallow(c.im_channels, name="encoder_3d")(
                voxel_grid, train=train)
        else:
            d0 = Conv3DBlock(c.im_channels, 1, 1, c.activation, dtype=dt,
                             padding=c.conv_padding,
                             name="input_preprocess")(voxel_grid)

        def ssm(x):
            if (c.stats_backend == "pallas" and x.shape[1] == x.shape[2]
                    == x.shape[3] and x.shape[1] % 4 == 0):
                from real_robot_nerf_actor_tpu.ops.stats_pallas import (
                    spatial_softmax_3d_pallas)
                return spatial_softmax_3d_pallas(x)
            return spatial_softmax_3d(x)

        feats = [ssm(d0), jnp.max(d0, axis=(1, 2, 3))]

        # ---- patchify + proprio + language sequence
        ins = PatchifyConv3D(c.im_channels, c.voxel_patch_size, c.activation,
                             dtype=dt, name="patchify")(d0)  # (B, s,s,s, 64)
        if c.grip_proprio_scale != 1.0:
            proprio = proprio.at[:, -1].mul(c.grip_proprio_scale)
        p = DenseBlock(c.im_channels, c.activation,
                       name="proprio_preprocess")(proprio)
        p = jnp.broadcast_to(p[:, None, None, None, :], ins.shape[:-1] + (c.im_channels,))
        ins = jnp.concatenate([ins, p], axis=-1)            # (B, s,s,s, 128)
        ins = ins.reshape(b, s ** 3, c.input_dim_before_seq)

        lang = nn.Dense(c.input_dim_before_seq, name="lang_preprocess")(lang_goal_embs)
        seq = jnp.concatenate([lang, ins], axis=1)          # (B, 77+s^3, 128)

        pos_emb = self.param(
            "pos_encoding", nn.initializers.normal(1.0),
            (1, c.lang_max_seq_len + s ** 3, c.input_dim_before_seq))
        seq = seq + pos_emb

        # ---- perceiver core
        latents = self.param("latents", nn.initializers.normal(1.0),
                             (c.num_latents, c.latent_dim))
        x = jnp.broadcast_to(latents[None], (b,) + latents.shape)

        x = PreNormAttn(c.cross_heads, c.cross_dim_head, c.latent_dim,
                        cross=True, dropout_rate=c.dropout_rate, dtype=dt,
                        use_flash=c.use_flash_attention,
                        name="cross_attend")(x, seq, deterministic) + x
        x = PreNormFF(c.latent_dim, dtype=dt, name="cross_ff")(x) + x

        for i in range(c.depth):
            x = PreNormAttn(c.latent_heads, c.latent_dim_head, c.latent_dim,
                            dropout_rate=c.dropout_rate, dtype=dt,
                            use_flash=c.use_flash_attention,
                            name=f"self_attn_{i}")(x, None, deterministic) + x
            x = PreNormFF(c.latent_dim, dtype=dt, name=f"self_ff_{i}")(x) + x

        # ---- decoder cross attention back to the token sequence
        dec = PreNormAttn(c.cross_heads, c.cross_dim_head,
                          c.input_dim_before_seq, cross=True, dtype=dt,
                          use_flash=c.use_flash_attention,
                          name="decoder_cross_attn")(seq, x, deterministic)
        dec = dec[:, c.lang_max_seq_len:]                  # drop language tokens
        dec = dec.reshape(b, s, s, s, c.input_dim_before_seq)

        feats.extend([ssm(dec), jnp.max(dec, axis=(1, 2, 3))])

        # ---- upsample + UNet-style skip + heads
        u0 = Conv3DUpsampleBlock(c.final_dim, c.voxel_patch_size,
                                 c.voxel_patch_size, c.activation, dtype=dt,
                                 mode=c.upsample_mode,
                                 backend=c.upsample_conv_backend,
                                 name="up0")(dec)           # (B, V,V,V, 64)
        u = Conv3DBlock(c.im_channels, 3, 1, c.activation, dtype=dt,
                        padding=c.conv_padding, backend=c.conv_backend,
                        name="final")(jnp.concatenate([d0, u0], axis=-1))
        # 1-output-channel conv can't fill the MXU; contract-first form
        # (exact conv) is ~10x faster at 100^3
        q_trans = ContractFirstConv3D(1, 3, None, dtype=dt,
                                      name="trans_decoder")(
            u)[..., 0].astype(jnp.float32)

        feats.extend([ssm(u), jnp.max(u, axis=(1, 2, 3))])

        h = DenseBlock(256, c.activation, name="dense0")(
            jnp.concatenate(feats, axis=-1))
        h = DenseBlock(c.final_dim, c.activation, name="dense1")(h)
        rgc = DenseBlock(c.num_rotation_classes * 3 + c.num_grip_classes
                         + c.num_collision_classes, None,
                         name="rot_grip_collision_ff")(h)
        q_rot_grip = rgc[:, : -c.num_collision_classes]
        q_collision = rgc[:, -c.num_collision_classes:]

        outputs = [q_trans, q_rot_grip, q_collision]
        if c.return_voxel_feat:
            outputs.append(d0)
        if c.aux_trans_head:
            # (B, s^3) coarse logits straight off the decoder tokens
            q_trans_aux = nn.Dense(1, name="aux_trans_decoder")(
                dec.astype(jnp.float32))[..., 0].reshape(b, -1)
            outputs.append(q_trans_aux)
        return tuple(outputs)
