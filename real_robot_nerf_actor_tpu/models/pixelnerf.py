"""Image-conditioned pixelNeRF field (flax) — the featurenerf pretraining
model family.

Reference behavior: /root/reference/featurenerf_robo/featurenerf/src/model/models_embed.py
(PixelNeRFEmbedNet with SpatialEncoder): query world points are transformed
into each source view's camera frame, projected to pixels, the encoder's
multi-scale latent is bilinearly sampled there, concatenated with the
positional-encoded point (+viewdirs) and pushed through ResnetFC with
per-block latent injection and multi-view averaging at combine_layer.
Outputs rgb + sigma + embed (distilled DINO feature) [+ coord residual,
+ attention] like the voxel variant.

TPU design: fully batched — (SB objects, NS views, B points) evaluated as
one (SB*NS*B, .) MLP batch; the multiview reduction is a reshape-mean at
combine_layer inside ResnetFC (num_views argument).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from real_robot_nerf_actor_tpu.models.encoder2d import (
    SpatialEncoder, SpatialEncoderConfig, bilinear_sample_2d)
from real_robot_nerf_actor_tpu.models.resnetfc import ResnetFC
from real_robot_nerf_actor_tpu.ops.rays import (
    PositionalEncodingSpec, positional_encoding)


@dataclasses.dataclass(frozen=True)
class PixelNerfConfig:
    d_embed: int = 384            # DINO ViT-S feature dim
    d_hidden: int = 512
    n_blocks: int = 5
    combine_layer: int = 3
    num_freqs: int = 6
    freq_factor: float = 1.5
    use_viewdirs: bool = True
    regress_coord: bool = False
    # Aug-NeRF perturbation hooks (reference featurenerf models_embed.py:
    # 106-110,186-187,298-299): train-time gaussian noise on the world
    # query points (input aug) and on the raw MLP output (output aug),
    # identity when off or when train=False. (The reference also reads a
    # use_layer_aug flag but never applies it — a dead flag, not ported.)
    # Noise draws from the flax "aug" rng collection: pass
    # rngs={"aug": key} to apply() when enabled.
    use_input_aug: bool = False
    use_output_aug: bool = False
    aug_noise_scale: float = 0.0
    encoder: SpatialEncoderConfig = SpatialEncoderConfig()

    @property
    def d_latent(self) -> int:
        return sum(self.encoder.stage_features)

    @property
    def d_out(self) -> int:
        return 4 + self.d_embed + (3 if self.regress_coord else 0)


class PixelNerfNet(nn.Module):
    cfg: PixelNerfConfig = PixelNerfConfig()

    def setup(self):
        self.encoder = SpatialEncoder(self.cfg.encoder)
        self.mlp = ResnetFC(d_out=self.cfg.d_out, n_blocks=self.cfg.n_blocks,
                            d_latent=self.cfg.d_latent,
                            d_hidden=self.cfg.d_hidden,
                            combine_layer=self.cfg.combine_layer)

    def encode(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """images: (NS, H, W, 3) in [-1, 1] -> latent (NS, H/2, W/2, C)."""
        return self.encoder(images, train=train)

    def encode_and_query(self, images, poses_w2c, focal, c, xyz, viewdirs,
                         train: bool = False):
        """Convenience single entry (also used for param init): encode the
        source views then query the field."""
        latent = self.encode(images, train=train)
        return self(latent, poses_w2c, focal, c, images.shape[1:3], xyz,
                    viewdirs, train=train)

    def __call__(self, latent: jnp.ndarray, poses_w2c: jnp.ndarray,
                 focal: jnp.ndarray, c: jnp.ndarray, image_shape: Tuple[int, int],
                 xyz: jnp.ndarray, viewdirs: Optional[jnp.ndarray] = None,
                 train: bool = False):
        """latent: (NS, Hf, Wf, C) encoded source views (one object).
        poses_w2c: (NS, 4, 4) world->camera. focal: (2,) [fx, fy] (fy sign
        already flipped per the reference's convention). c: (2,) principal
        point. image_shape: (H, W) of the source images.
        xyz: (B, 3) world query points; viewdirs: (B, 3).
        Returns dict rgb/sigma/embed[/coord_residual] with leading dim B.
        """
        cfg = self.cfg
        ns = latent.shape[0]
        b = xyz.shape[0]
        h, w = image_shape

        if cfg.use_input_aug and train and cfg.aug_noise_scale > 0:
            xyz = xyz + jax.random.normal(
                self.make_rng("aug"), xyz.shape, xyz.dtype) \
                * cfg.aug_noise_scale

        # world -> each source camera
        xyz_rep = jnp.broadcast_to(xyz[None], (ns, b, 3))
        rot = poses_w2c[:, :3, :3]
        trans = poses_w2c[:, :3, 3]
        xyz_cam = jnp.einsum("nij,nbj->nbi", rot, xyz_rep) + trans[:, None]

        # project to normalized uv in [-1, 1] (pinhole, reference convention:
        # uv = -xy/z * focal + c, normalized by image size)
        uv = -xyz_cam[..., :2] / jnp.where(
            jnp.abs(xyz_cam[..., 2:]) < 1e-8, 1e-8, xyz_cam[..., 2:])
        uv = uv * focal[None, None] + c[None, None]
        uv = uv / jnp.asarray([w, h], uv.dtype) * 2.0  # center-origin -> [-1,1]

        lat = bilinear_sample_2d(latent, uv)  # (NS, B, C)

        feat = positional_encoding(
            xyz_cam, PositionalEncodingSpec(cfg.num_freqs, 3, cfg.freq_factor,
                                            True))
        if cfg.use_viewdirs:
            assert viewdirs is not None
            vd = jnp.broadcast_to(viewdirs[None], (ns, b, 3))
            vd = jnp.einsum("nij,nbj->nbi", rot, vd)
            feat = jnp.concatenate([feat, vd], axis=-1)

        mlp_in = jnp.concatenate([lat, feat], axis=-1)
        # interleave views: (NS, B, D) -> (B*NS, D) so combine averages views
        mlp_in = mlp_in.transpose(1, 0, 2).reshape(b * ns, -1)
        out, _ = self.mlp(mlp_in, num_views=ns)
        out = out.reshape(b, cfg.d_out)
        if cfg.use_output_aug and train and cfg.aug_noise_scale > 0:
            out = out + jax.random.normal(
                self.make_rng("aug"), out.shape, out.dtype) \
                * cfg.aug_noise_scale

        res = {
            "rgb": jax.nn.sigmoid(out[..., :3]),
            "sigma": jax.nn.relu(out[..., 3]),
        }
        if cfg.regress_coord:
            res["embed"] = out[..., 4:-3]
            # residual vs the camera-frame (canonical) query point, view-
            # averaged to match the view-combined MLP output (reference:
            # models_embed.py:315-316 coord - canon_xyz; exact at NS=1).
            res["coord_residual"] = out[..., -3:] - xyz_cam.mean(axis=0)
        else:
            res["embed"] = out[..., 4:]
        return res
