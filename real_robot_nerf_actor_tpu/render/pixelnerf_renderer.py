"""Coarse/fine volume renderer for the image-conditioned pixelNeRF field.

Reference behavior: /root/reference/featurenerf_robo/featurenerf/src/render/nerf_embed.py
(NeRFEmbedRenderer): same sampling/compositing math as the voxel renderer
plus `extract_radience` (per-point radiance export for NeRF->pointcloud).
The reference parallelizes with torch DataParallel over the ray dim
(:412-429); here rays are just an array axis — shard it over the mesh
'data' axis for the same effect.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from real_robot_nerf_actor_tpu.models.pixelnerf import PixelNerfNet
from real_robot_nerf_actor_tpu.ops.compositing import composite
from real_robot_nerf_actor_tpu.ops.sampling import (
    sample_coarse, sample_fine, sample_fine_depth)


@dataclasses.dataclass(frozen=True)
class PixelNerfRendererConfig:
    n_coarse: int = 64
    n_fine: int = 32
    n_fine_depth: int = 16
    depth_std: float = 0.001
    white_bkgd: bool = False
    lindisp: bool = False


class PixelNerfRenderer:
    def __init__(self, cfg: PixelNerfRendererConfig, net: PixelNerfNet):
        self.cfg = cfg
        self.net = net

    def _eval(self, variables, enc, rays, z_samp, train=False,
              aug_key=None):
        latent, poses_w2c, focal, c, image_shape = enc
        r, k = z_samp.shape
        pts = rays[:, None, :3] + z_samp[..., None] * rays[:, None, 3:6]
        dirs = jnp.broadcast_to(rays[:, None, 3:6], pts.shape)
        out = self.net.apply(variables, latent, poses_w2c, focal, c,
                             image_shape, pts.reshape(r * k, 3),
                             dirs.reshape(r * k, 3), train=train,
                             rngs=({"aug": aug_key} if aug_key is not None
                                   else None))
        rgbs = out["rgb"].reshape(r, k, 3)
        sigmas = out["sigma"].reshape(r, k)
        embeds = out["embed"].reshape(r, k, -1)
        return composite(z_samp, rays, rgbs, sigmas, embeds,
                         white_bkgd=self.cfg.white_bkgd), out

    def render_rays(self, variables, enc, rays, key, train=False):
        """rays: (R, 8); enc: tuple from encode (latent, w2c, focal, c, hw).

        When the field regresses coord residuals, each level also yields a
        '<level>_coord' entry: the plain per-ray MEAN of the residual over
        samples — not alpha-composited — matching the reference
        (nerf_embed.py:279 coord_final = mean over the sample dim).

        train=True enables the field's Aug-NeRF perturbation hooks
        (PixelNerfConfig.use_input_aug/use_output_aug) with per-pass rngs.
        """
        c = self.cfg
        k1, k2, k3, ka1, ka2 = jax.random.split(key, 5)
        aug = (self.net.cfg.use_input_aug or self.net.cfg.use_output_aug)
        aug_keys = (ka1, ka2) if (train and aug) else (None, None)
        z_coarse = sample_coarse(k1, rays, c.n_coarse, c.lindisp)
        coarse, raw = self._eval(variables, enc, rays, z_coarse,
                                 train=train, aug_key=aug_keys[0])
        out = {"coarse": coarse}
        if "coord_residual" in raw:
            out["coarse_coord"] = raw["coord_residual"].reshape(
                *z_coarse.shape, 3).mean(axis=1)
        if c.n_fine > 0:
            samps = [z_coarse]
            if c.n_fine - c.n_fine_depth > 0:
                samps.append(sample_fine(k2, rays, coarse.weights,
                                         c.n_fine - c.n_fine_depth,
                                         c.n_coarse, c.lindisp))
            if c.n_fine_depth > 0:
                samps.append(sample_fine_depth(
                    k3, rays, jax.lax.stop_gradient(coarse.depth),
                    c.n_fine_depth, c.depth_std))
            z_all = jnp.sort(jnp.concatenate(samps, -1), -1)
            out["fine"], raw_f = self._eval(variables, enc, rays, z_all,
                                            train=train,
                                            aug_key=aug_keys[1])
            if "coord_residual" in raw_f:
                out["fine_coord"] = raw_f["coord_residual"].reshape(
                    *z_all.shape, 3).mean(axis=1)
        return out

    def extract_radiance(self, variables, enc, rays, key):
        """Per-point (pnts, rgb, sigma, embed) export along rays — the
        NeRF->pointcloud path (nerf_embed.py:432-516 / extract_nerf_feat).
        Returns dict with points (R,K,3), rgb, sigma, embed, weights."""
        c = self.cfg
        z = sample_coarse(key, rays, c.n_coarse, c.lindisp)
        comp, raw = self._eval(variables, enc, rays, z)
        r, k = z.shape
        pts = rays[:, None, :3] + z[..., None] * rays[:, None, 3:6]
        return {
            "points": pts,
            "rgb": raw["rgb"].reshape(r, k, 3),
            "sigma": raw["sigma"].reshape(r, k),
            "embed": raw["embed"].reshape(r, k, -1),
            "weights": comp.weights,
            "z": z,
        }
