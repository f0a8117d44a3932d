"""Voxel-conditioned NeRF field (the reference's PixelNeRFEmbedNet,
/root/reference/models_embed.py:16-471) as a pure flax module.

Pipeline per query point:
  world xyz -> canonical [0,1]^3 (bounding-box normalize)
            -> trilinear sample of the PerceiverIO voxel feature grid
               (the `latent`, d_latent channels)
  canonical xyz -> sinusoidal positional code (6 freqs, factor 1.5,
                   include_input -> 39 dims), concat raw viewdirs (3)
  [latent, code, viewdirs] -> ResnetFC (5 blocks, d_hidden 512, latent
                   injected per block, combine at 3)
  -> [sigmoid(rgb), relu(sigma), embed(d_embed)]

Functional redesign: `encode` is not stateful — the voxel grid is an
explicit argument, so the whole render step jits as one graph.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from real_robot_nerf_actor_tpu.ops.grid_sample import sample_in_canonical_voxel
from real_robot_nerf_actor_tpu.ops.rays import (
    PositionalEncodingSpec, positional_encoding)
from real_robot_nerf_actor_tpu.models.resnetfc import ResnetFC


@dataclasses.dataclass(frozen=True)
class NerfFieldConfig:
    d_latent: int = 64          # voxel feature channels
    d_embed: int = 512          # distilled foundation-feature channels
    d_hidden: int = 512
    n_blocks: int = 5
    combine_layer: int = 3
    use_viewdirs: bool = True
    use_code: bool = True
    num_freqs: int = 6
    freq_factor: float = 1.5
    regress_coord: bool = False
    regress_attention: bool = False
    coord_bounds: Tuple[float, ...] = (-0.1, -0.3, -0.2, 0.8, 0.7, 0.7)
    compute_dtype: str = "float32"   # "float32" | "bfloat16" MLP compute
    # proposal sampler (opt-in perf mode): a small rgb+sigma MLP replaces
    # the full field for the coarse pass (mip-NeRF-360-style); the fine
    # pass then composites only its well-placed samples
    use_proposal: bool = False
    proposal_hidden: int = 128
    proposal_blocks: int = 2
    # latent-free proposal: the coarse sampler MLP sees only the positional
    # code (+viewdirs), skipping the voxel-grid gather for coarse samples
    # entirely (~1M gather rows/render at the flagship config) — the
    # sampler learns scene geometry through training instead
    proposal_use_latent: bool = True
    # serving-only int8 mode: the ResnetFC block matmuls run W8A8 on the
    # v5e int8 MXU (2x the bf16 rate; the parity MLP is at the bf16
    # roofline). Same param tree — any checkpoint serves quantized.
    # Changes numerics (measured, see BENCH_NOTES); do not train with it.
    quantized: bool = False
    # "pallas_int8" / "pallas_bf16": the renderer's serving path runs the
    # WHOLE ResnetFC as one fused Pallas kernel (weights resident in VMEM
    # — ops/resnetfc_pallas.py) with W8A8 int8 or bf16 block matmuls.
    # Forward/serving only; training and non-compact paths use XLA.
    mlp_backend: str = "xla"  # "xla" | "pallas_int8" | "pallas_bf16"
    # static per-layer int8 ACTIVATION scales (pallas_int8 only): calibrate
    # once per scene via NeuralRenderer.calibrate_int8_act() and the
    # per-row amax reduce+divide inside the kernel collapses to one
    # multiply+round against a compile-time scalar. SEMANTICS CHANGE vs
    # dynamic quant: rows hotter than the calibration range saturate at
    # +-127 (quality-gated at serving like every int8 delta; see
    # tests/test_resnetfc_pallas.py::test_static_act_scales*).
    int8_static_act: bool = False
    # gather-fused serving kernel (pallas_int8/pallas_bf16 only): corner
    # gather + trilinear lerp + the whole ResnetFC run as ONE kernel whose
    # double-buffered row DMAs hide the gather's descriptor-floor cost and
    # the lerp behind the MXU block matmuls (ops/resnetfc_pallas.py
    # fused_gather_resnetfc_int8). EXACT vs the unfused fused-MLP path
    # (bit-equal in tests); off by default until TPU-measured.
    gather_fused_mlp: bool = False
    # hard-zero sigma for points outside coord_bounds (instant-NGP-style
    # bounded domain). The reference field (models_embed.py) is unbounded:
    # grid_sample clamps the latent, so a trained field can paint density
    # BEYOND the voxel grid from clamped latents + raw position. That
    # out-of-box density breaks occupancy-based sample compaction (the
    # occupied-AABB tighten assumes all density is in-box — measured on the
    # round-3 flagship: GT surface at the box's far side, ~80% of ray
    # opacity past the exit, occ renders black). Off by default for
    # reference parity; the flagship nerfact config enables it.
    mask_outside: bool = False

    @property
    def d_in(self) -> int:
        d = 3
        if self.use_code:
            d = PositionalEncodingSpec(self.num_freqs, 3, self.freq_factor, True).d_out
        if self.use_viewdirs:
            d += 3
        return d

    @property
    def d_out(self) -> int:
        d = 4 + self.d_embed
        if self.regress_coord:
            d += 3
        if self.regress_attention:
            d += 6
        return d


class VoxelNerfField(nn.Module):
    cfg: NerfFieldConfig
    share_mlp: bool = True

    def setup(self):
        c = self.cfg
        dt = jnp.dtype(c.compute_dtype)
        self.mlp_coarse = ResnetFC(
            d_out=c.d_out, n_blocks=c.n_blocks, d_latent=c.d_latent,
            d_hidden=c.d_hidden, combine_layer=c.combine_layer, dtype=dt,
            quantized=c.quantized)
        if not self.share_mlp:
            self.mlp_fine = ResnetFC(
                d_out=c.d_out, n_blocks=c.n_blocks, d_latent=c.d_latent,
                d_hidden=c.d_hidden, combine_layer=c.combine_layer, dtype=dt,
                quantized=c.quantized)
        if c.use_proposal:
            self.mlp_proposal = ResnetFC(
                d_out=4, n_blocks=c.proposal_blocks,
                d_latent=c.d_latent if c.proposal_use_latent else 0,
                d_hidden=c.proposal_hidden, combine_layer=1000, dtype=dt)

    def init_all(self, voxel_feat, xyz, viewdirs=None):
        """Init helper touching every submodule (coarse/proposal + fine)."""
        out_c = self(voxel_feat, xyz, viewdirs, coarse=True)
        out_f = self(voxel_feat, xyz, viewdirs, coarse=False)
        return out_c, out_f

    def world_to_canonical(self, xyz: jnp.ndarray) -> jnp.ndarray:
        bounds = jnp.asarray(self.cfg.coord_bounds, dtype=xyz.dtype)
        bb_min, bb_max = bounds[:3], bounds[3:]
        return (xyz - bb_min) / (bb_max - bb_min)

    def __call__(self, voxel_feat: jnp.ndarray, xyz: jnp.ndarray,
                 viewdirs: Optional[jnp.ndarray] = None, coarse: bool = True,
                 ret_last_feat: bool = False, expanded: bool = False,
                 compact_heads: bool = False):
        """voxel_feat: (SB, V, V, V, d_latent) channel-last feature grid —
        or its corner-expanded (SB, V, V, V, 8*d_latent) form when
        expanded=True (ops.grid_sample.expand_corners; one TPU gather
        instead of eight). xyz: (SB, B, 3) world points; viewdirs: (SB, B, 3).
        Returns dict with rgb (SB,B,3), sigma (SB,B), embed (SB,B,d_embed)
        [, coord_residual, attention, last_feat]."""
        c = self.cfg
        sb, b, _ = xyz.shape
        canon = self.world_to_canonical(xyz)
        canon = jax.lax.stop_gradient(canon)
        if c.mask_outside:
            _inb = jnp.all((canon >= 0.0) & (canon <= 1.0), axis=-1)

            def _mask(s):
                return jnp.where(_inb, s, 0.0)
        else:
            def _mask(s):
                return s

        proposal_pass = coarse and c.use_proposal

        feat = canon
        if c.use_code:
            spec = PositionalEncodingSpec(c.num_freqs, 3, c.freq_factor, True)
            feat = positional_encoding(canon, spec)
        if c.use_viewdirs:
            assert viewdirs is not None
            feat = jnp.concatenate([feat, viewdirs], axis=-1)

        if proposal_pass and not c.proposal_use_latent:
            mlp_in = feat.reshape(sb * b, -1)
        else:
            latent = sample_in_canonical_voxel(
                voxel_feat, canon, expanded=expanded,
                out_channels=c.d_latent)  # (SB, B, dl)
            # NOTE: ResnetFC also accepts (latent, feat) as a tuple (no
            # concat materialization) — measured SLOWER here (105.5 vs
            # 103.3 ms/render: XLA re-fuses the lerp into an N-minor
            # first-layer fusion that costs more than the concat copy)
            mlp_in = jnp.concatenate([latent, feat], axis=-1).reshape(
                sb * b, -1)
        if proposal_pass:
            out, _ = self.mlp_proposal(mlp_in, ret_last_feat=False)
            out = out.reshape(sb, b, 4)
            return {
                "rgb": jax.nn.sigmoid(out[..., :3].astype(jnp.float32)),
                "sigma": _mask(jax.nn.relu(out[..., 3].astype(jnp.float32))),
                "embed": jnp.zeros((sb, b, c.d_embed), out.dtype),
            }
        mlp = self.mlp_coarse if (coarse or self.share_mlp) else self.mlp_fine
        if compact_heads:
            # late embed projection: the embed head is LINEAR in the last
            # hidden, so the renderer composites relu(last) per ray and
            # projects once with the same lin_out params (exact; see
            # RendererConfig.late_embed). Only rgb+sigma are computed here.
            assert not (c.regress_coord or c.regress_attention), (
                "compact_heads supports the rgb/sigma/embed head layout")
            out, last = mlp(mlp_in, ret_last_feat=False, head_dims=4)
            out = out.reshape(sb, b, 4)
            return {
                "rgb": jax.nn.sigmoid(out[..., :3].astype(jnp.float32)),
                "sigma": _mask(jax.nn.relu(out[..., 3].astype(jnp.float32))),
                "hidden": jax.nn.relu(last).reshape(sb, b, -1),
            }
        out, last = mlp(mlp_in, ret_last_feat=False)
        out = out.reshape(sb, b, c.d_out)

        res = {
            # rgb/sigma in fp32 (compositing statistics); the wide embed
            # channel stays in the MLP compute dtype to halve HBM traffic
            "rgb": jax.nn.sigmoid(out[..., :3].astype(jnp.float32)),
            "sigma": _mask(jax.nn.relu(out[..., 3].astype(jnp.float32))),
        }
        rest = out[..., 4:]
        if c.regress_coord and c.regress_attention:
            res["embed"] = rest[..., :-9]
            res["coord_residual"] = rest[..., -9:-6] - canon
            res["attention"] = rest[..., -6:]
        elif c.regress_coord:
            res["embed"] = rest[..., :-3]
            res["coord_residual"] = rest[..., -3:] - canon
        elif c.regress_attention:
            res["embed"] = rest[..., :-6]
            res["attention"] = rest[..., -6:]
        else:
            res["embed"] = rest
        if ret_last_feat:
            res["last_feat"] = last.reshape(sb, b, -1)
        return res
