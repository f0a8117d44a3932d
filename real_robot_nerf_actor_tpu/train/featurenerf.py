"""FeatureNeRF pretraining: pixelNeRF + foundation-feature distillation.

Reference behavior: /root/reference/featurenerf_robo/featurenerf/train/train_embed.py
(PixelNeRFTrainer.calc_losses, :159-346):
  - rays are sampled across ALL views of the scene (a random view per ray),
    bbox-biased until ``no_bbox_step`` (util.bbox_sample, util.py:220-235);
  - 1..k source views (``nviews``) are encoded with multi-view combining;
  - teacher features AND the DINO cls-attention maps are bilinearly sampled
    at the ray pixels (align_corners=False, zero padding);
  - losses: lambda_coarse/fine * MSE(rgb)
      + lambda_embed * (MSE(embed) coarse + fine)
      + lambda_attn  * attention-norm loss (:147-151): MSE between the
        L2-normalized per-ray means of the rendered embedding and of the
        teacher cls-attention
      + lambda_coord * MSE(coord_residual, 0) (coarse + fine), where the
        field's coord head regresses the canonical query point;
  - optional foreground masking of feat/attn targets (mask_feat).

The reference divides the (x, y) grid by (H, W) when building the
grid_sample grid (train_embed.py:252-255) — correct only for square
images; here the mapping uses the matching axis size.

TPU design: the whole step (encode source views -> render rays -> losses ->
update) is one jitted function; the random view/pixel selection uses
explicit PRNG keys; the bbox-vs-uniform switch is a data-dependent
``jnp.where`` on the sampled coordinates (no Python branching on step).
The number of source views is the length of the host-supplied
``batch['src_ord']`` (the data iterator samples it from ``nviews``); each
distinct length compiles once.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Tuple

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
    lambda_coarse: float = 1.0
    lambda_fine: float = 1.0
    lambda_embed: float = 0.1
    lambda_attn: float = 0.1
    lambda_coord: float = 0.0
    no_bbox_step: int = 100_000   # bbox-biased sampling until this step
    nviews: Tuple[int, ...] = (1,)
    mask_feat: bool = False
    mask_white_bkgd: bool = True
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)


class FeatureNerfTrainer:
    def __init__(self, cfg: FeatureNerfConfig):
        if cfg.lambda_coord > 0 and not cfg.model.regress_coord:
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, regress_coord=True))
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

    # ------------------------------------------------------------- sampling
    def _sample_pixels(self, key, batch, step):
        """(v, y, x) int32 (R,) each: a random view per ray; within the
        view's bbox while step < no_bbox_step (when bboxes are given)."""
        cfg = self.cfg
        nv, h, w, _ = batch["images"].shape
        kv, ky, kx, kb = jax.random.split(key, 4)
        r = cfg.ray_batch_size
        v = jax.random.randint(kv, (r,), 0, nv)
        y = jax.random.randint(ky, (r,), 0, h)
        x = jax.random.randint(kx, (r,), 0, w)
        if "bbox" in batch and cfg.no_bbox_step > 0:
            # bbox rows: (cmin, rmin, cmax, rmax) per view (util.py:220-235)
            bb = batch["bbox"][v].astype(jnp.float32)
            ub = jax.random.uniform(kb, (r, 2))
            xb = (ub[:, 0] * (bb[:, 2] + 1 - bb[:, 0]) + bb[:, 0])
            yb = (ub[:, 1] * (bb[:, 3] + 1 - bb[:, 1]) + bb[:, 1])
            use_bbox = step < cfg.no_bbox_step
            x = jnp.where(use_bbox, xb.astype(jnp.int32), x)
            y = jnp.where(use_bbox, yb.astype(jnp.int32), y)
        return v, y, x

    # --------------------------------------------------------------- losses
    def compute_losses(self, variables, batch, step, v, y, x, src_ord,
                       k_render) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Pure loss computation given sampled ray pixels (v, y, x) and
        source-view indices — the goldenable core of train_step."""
        cfg = self.cfg
        nv, h, w, _ = batch["images"].shape

        src_imgs = batch["images"][src_ord] * 2.0 - 1.0
        latent = self.net.apply(variables, src_imgs, method=self.net.encode)
        w2c = jnp.linalg.inv(batch["poses"][src_ord])
        focal = jnp.stack([batch["focal"], -batch["focal"]])
        enc = (latent, w2c, focal, jnp.zeros(2), (h, w))

        rays_all = gen_rays(batch["poses"], w, h, batch["focal"],
                            cfg.z_near, cfg.z_far)            # (NV, H, W, 8)
        rays = rays_all[v, y, x]
        # train=True arms the Aug-NeRF perturbation hooks when the model
        # config enables them (identity otherwise)
        out = self.renderer.render_rays(variables, enc, rays, k_render,
                                        train=True)

        gt_rgb = batch["images"][v, y, x]
        coarse, fine = out["coarse"], out.get("fine", out["coarse"])
        loss_rgb = (cfg.lambda_coarse * jnp.mean((coarse.rgb - gt_rgb) ** 2)
                    + cfg.lambda_fine * jnp.mean((fine.rgb - gt_rgb) ** 2))
        loss = loss_rgb
        metrics = {"loss_rgb": loss_rgb, "psnr": psnr(fine.rgb, gt_rgb)}

        fg = None
        if cfg.mask_feat:
            bkgd = 1.0 if cfg.mask_white_bkgd else 0.0
            fg = 1.0 - jnp.all(gt_rgb == bkgd, axis=-1).astype(jnp.float32)

        if cfg.lambda_embed > 0 and "features" in batch:
            gt_embed = _sample_view_maps(batch["features"], v, y, x, (h, w))
            if fg is not None:
                gt_embed = gt_embed * fg[:, None]
            loss_embed = cfg.lambda_embed * (
                jnp.mean((coarse.embed - gt_embed) ** 2)
                + jnp.mean((fine.embed - gt_embed) ** 2))
            loss = loss + loss_embed
            metrics["loss_embed"] = loss_embed

        if cfg.lambda_attn > 0 and "cls_attn" in batch:
            gt_attn = _sample_view_maps(batch["cls_attn"], v, y, x, (h, w))
            if fg is not None:
                gt_attn = gt_attn * fg[:, None]
            loss_attn = cfg.lambda_attn * (
                attention_norm_loss(coarse.embed, gt_attn)
                + attention_norm_loss(fine.embed, gt_attn))
            loss = loss + loss_attn
            metrics["loss_attn"] = loss_attn

        if cfg.lambda_coord > 0:
            loss_coord = cfg.lambda_coord * (
                jnp.mean(out["coarse_coord"] ** 2)
                + jnp.mean(out.get("fine_coord", out["coarse_coord"]) ** 2))
            loss = loss + loss_coord
            metrics["loss_coord"] = loss_coord

        metrics["loss"] = loss
        return loss, metrics

    # ----------------------------------------------------------------- step
    def train_step(self, state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """batch (single scene):
          images (NV, H, W, 3) in [0,1]; poses (NV, 4, 4) c2w; focal ();
          features (NV, hf, wf, D) teacher features [optional];
          cls_attn (NV, ha, wa, A) teacher cls-attention [optional];
          bbox (NV, 4) (cmin, rmin, cmax, rmax) [optional];
          src_ord (NS,) int source-view indices [optional; default: one
          random view].
        """
        k_src, k_pix, k_render = jax.random.split(rng, 3)
        if "src_ord" in batch:
            src_ord = batch["src_ord"]
        else:
            nv = batch["images"].shape[0]
            src_ord = jax.random.randint(k_src, (1,), 0, nv)
        v, y, x = self._sample_pixels(k_pix, batch, state.step)
        data = {k: b for k, b in batch.items() if k != "src_ord"}

        def loss_fn(params, extra):
            variables = {"params": params, **extra}
            return self.compute_losses(variables, data, state.step,
                                       v, y, x, src_ord, k_render)

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.extra)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(step=state.step + 1, params=params,
                           opt_state=opt_state, extra=state.extra), metrics)

    # ---------------------------------------------------------------- data
    def scene_data(self, scenes, seed: int = 0) -> Iterator[Dict[str, jnp.ndarray]]:
        """Scene batches with everything static staged on device ONCE.

        A scene's images/features/attn maps (~3 MB at 12x128^2+teacher)
        re-uploaded per step would dominate the host loop on a remote
        link (every host->device transfer is a ~25-40 ms tunnel round
        trip — CLAUDE.md); only the tiny per-step src_ord changes."""
        rng = np.random.default_rng(seed)
        nviews = self.cfg.nviews
        staged = []
        for sc in scenes:
            dev = {
                "images": jnp.asarray(sc.images),
                "poses": jnp.asarray(sc.poses),
                "focal": jnp.asarray(sc.focal, jnp.float32),
            }
            if sc.features is not None:
                dev["features"] = jnp.asarray(sc.features)
            if getattr(sc, "cls_attn", None) is not None:
                # Scene stores (N, heads, hf, wf) for a ViT teacher, or
                # (N, hf, wf) single-channel saliency from the contrastive
                # teacher (train/teacher.py feature_maps); step wants NHWC.
                attn = np.asarray(sc.cls_attn)
                dev["cls_attn"] = jnp.asarray(
                    attn[..., None] if attn.ndim == 3
                    else attn.transpose(0, 2, 3, 1))
            staged.append(dev)
        while True:
            dev = staged[int(rng.integers(0, len(staged)))]
            nv = dev["images"].shape[0]
            ns = min(int(nviews[rng.integers(0, len(nviews))]), nv)
            batch = dict(dev)
            batch["src_ord"] = jnp.asarray(
                rng.choice(nv, size=ns, replace=False), jnp.int32)
            yield batch

    def make_trainer(self, data) -> Trainer:
        return Trainer(self.cfg.train, self.train_step, data, self.init_state)


def attention_norm_loss(embed: jnp.ndarray, attn: jnp.ndarray) -> jnp.ndarray:
    """MSE between the L2-normalized per-ray means of the rendered embedding
    and of the teacher cls-attention (train_embed.py:147-151, n_pow=1)."""
    e = embed.mean(axis=-1)
    a = attn.mean(axis=-1)
    e = e / jnp.maximum(jnp.linalg.norm(e), 1e-12)
    a = a / jnp.maximum(jnp.linalg.norm(a), 1e-12)
    return jnp.mean((e - a) ** 2)


def _sample_view_maps(maps: jnp.ndarray, v, y, x,
                      image_shape: Tuple[int, int]) -> jnp.ndarray:
    """Bilinearly sample per-view maps (NV, hf, wf, C) at image pixels
    (v, y, x) of an (H, W) image — torch grid_sample align_corners=False /
    zero-padding semantics (train_embed.py:252-259), with the x/y grid
    normalized by the matching axis (the reference normalizes both by
    (H, W), exact only for square images)."""
    h, w = image_shape
    nv, hf, wf, _ = maps.shape
    yf = (y.astype(jnp.float32) + 0.0) / h * hf - 0.5
    xf = (x.astype(jnp.float32) + 0.0) / w * wf - 0.5
    y0 = jnp.floor(yf)
    x0 = jnp.floor(xf)
    ty = (yf - y0)[:, None]
    tx = (xf - x0)[:, None]

    def tap(yi, xi):
        inside = ((yi >= 0) & (yi < hf) & (xi >= 0) & (xi < wf))
        yc = jnp.clip(yi, 0, hf - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, wf - 1).astype(jnp.int32)
        return maps[v, yc, xc] * inside[:, None].astype(maps.dtype)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    v0 = v00 * (1 - tx) + v01 * tx
    v1 = v10 * (1 - tx) + v11 * tx
    return v0 * (1 - ty) + v1 * ty
