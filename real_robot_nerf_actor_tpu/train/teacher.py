"""Geometry-guided contrastive teacher for FeatureNeRF distillation.

The reference distills PRETRAINED DINO ViT-S/8 features into its NeRF
(/root/reference/dino.py:26-124, featurenerf/train/train_embed.py:252-338).
This sandbox has no egress and no DINO checkpoint, so round 4 distilled a
random-init ViT — the pipeline worked but the teacher features were not
view-invariant (correspondence 0.9% @2px). This module trains a teacher
IN-REPO with the property that actually matters for the correspondence
benchmark: pixels observing the same 3D point (known exactly from the
raycaster's depth + poses) must embed near each other, pixels observing
different points must not. That is Pri3D's geometry-guided contrastive
pretraining (the reference's own representation zoo carries Pri3D,
src/representations/utils_pri3d), realized here with InfoNCE over
depth-reprojection-matched pixel pairs across orbit views.

Reprojection conventions match scripts/eval_novel.py:99-130 (z-depth,
principal point at (n-1)/2 — envs/rendering.py raycaster).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from real_robot_nerf_actor_tpu.models.encoder2d import (
    SpatialEncoder, SpatialEncoderConfig, bilinear_sample_2d)


@dataclasses.dataclass(frozen=True)
class TeacherConfig:
    d_embed: int = 64
    temperature: float = 0.1
    n_pairs: int = 256          # matched pixel pairs per step
    lr: float = 1e-3
    steps: int = 3000
    seed: int = 0
    depth_tol: float = 0.02     # relative occlusion-check tolerance
    encoder: SpatialEncoderConfig = dataclasses.field(
        default_factory=SpatialEncoderConfig)


class ContrastiveTeacher(nn.Module):
    """SpatialEncoder + linear projection -> (B, H/2, W/2, d_embed)."""

    cfg: TeacherConfig = TeacherConfig()

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        lat = SpatialEncoder(self.cfg.encoder)(images * 2.0 - 1.0,
                                               train=train)
        return nn.Dense(self.cfg.d_embed, name="proj")(lat)


def match_pixels(poses: np.ndarray, focal: float, depth: np.ndarray,
                 i: int, j: int, n: int, rng: np.random.Generator,
                 depth_tol: float = 0.02
                 ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Ground-truth pixel correspondences view i -> view j via depth
    unprojection + reprojection (eval_novel.py conventions). Returns
    (uv_i (n, 2) float [x, y], uv_j (n, 2)) or None if too few matches.
    """
    h, w = depth.shape[1:3]
    cx, cy, f = (w - 1) / 2.0, (h - 1) / 2.0, float(focal)
    dA, dB = depth[i], depth[j]
    ys, xs = np.nonzero(np.isfinite(dA))
    if len(ys) < 8:
        return None
    take = rng.choice(len(ys), size=min(4 * n, len(ys)), replace=False)
    ys, xs = ys[take], xs[take]
    dirs = np.stack([(xs - cx) / f, -(ys - cy) / f,
                     -np.ones_like(xs, np.float64)], -1)
    t = dA[ys, xs] / (-dirs[:, 2])
    pts = (dirs * t[:, None]) @ poses[i][:3, :3].T + poses[i][:3, 3]
    pc = (pts - poses[j][:3, 3]) @ poses[j][:3, :3]
    zb = -pc[:, 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        xb = pc[:, 0] / zb * f + cx
        yb = -pc[:, 1] / zb * f + cy
    xi, yi = np.round(xb).astype(int), np.round(yb).astype(int)
    inb = (zb > 0) & (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    vis = inb.copy()
    vis[inb] &= np.isfinite(dB[yi[inb], xi[inb]])
    vis[inb] &= np.abs(np.where(np.isfinite(dB[yi[inb], xi[inb]]),
                                dB[yi[inb], xi[inb]], 1e9) - zb[inb]) \
        < depth_tol * zb[inb]
    if vis.sum() < n // 2:
        return None
    keep = np.nonzero(vis)[0][:n]
    uv_i = np.stack([xs[keep], ys[keep]], -1).astype(np.float32)
    uv_j = np.stack([xb[keep], yb[keep]], -1).astype(np.float32)
    if len(keep) < n:                      # pad by repetition (static shape)
        pad = rng.integers(0, len(keep), n - len(keep))
        uv_i = np.concatenate([uv_i, uv_i[pad]])
        uv_j = np.concatenate([uv_j, uv_j[pad]])
    return uv_i, uv_j


class TeacherTrainer:
    """InfoNCE over matched pixels: two views of one scene per step."""

    def __init__(self, cfg: TeacherConfig):
        self.cfg = cfg
        self.net = ContrastiveTeacher(cfg)
        self.tx = optax.adam(cfg.lr)

    def init_state(self, rng, image_hw: Tuple[int, int]):
        h, w = image_hw
        variables = self.net.init(rng, jnp.zeros((1, h, w, 3)), train=False)
        params = variables["params"]
        extra = {k: v for k, v in variables.items() if k != "params"}
        return {"params": params, "extra": extra,
                "opt": self.tx.init(params)}

    def _loss(self, params, extra, imgs, uv_a, uv_b, train: bool):
        c = self.cfg
        variables = {"params": params, **extra}
        if "batch_stats" in extra and train:
            feat, new_vars = self.net.apply(variables, imgs, train=True,
                                            mutable=["batch_stats"])
        else:
            feat, new_vars = self.net.apply(variables, imgs), extra
        # feature maps live at half the image resolution;
        # bilinear_sample_2d wants [-1, 1]-normalized coords
        fh, fw = feat.shape[1], feat.shape[2]

        def norm_uv(uv):
            xf, yf = uv[:, 0] / 2.0, uv[:, 1] / 2.0
            return jnp.stack([2.0 * xf / (fw - 1) - 1.0,
                              2.0 * yf / (fh - 1) - 1.0], -1)

        za = bilinear_sample_2d(feat[0:1], norm_uv(uv_a)[None])[0]  # (P, D)
        zb = bilinear_sample_2d(feat[1:2], norm_uv(uv_b)[None])[0]
        za = za / (jnp.linalg.norm(za, axis=-1, keepdims=True) + 1e-6)
        zb = zb / (jnp.linalg.norm(zb, axis=-1, keepdims=True) + 1e-6)
        logits = za @ zb.T / c.temperature                 # (P, P)
        labels = jnp.arange(logits.shape[0])
        ce = optax.softmax_cross_entropy_with_integer_labels
        loss = (ce(logits, labels).mean()
                + ce(logits.T, labels).mean()) * 0.5
        pos = jnp.mean(jnp.sum(za * zb, axis=-1))
        acc = jnp.mean(jnp.argmax(logits, -1) == labels)
        return loss, (new_vars, {"loss": loss, "pos_sim": pos,
                                 "pair_acc": acc})

    def make_step(self):
        def step(state, imgs, uv_a, uv_b):
            (loss, (new_extra, metrics)), grads = jax.value_and_grad(
                self._loss, has_aux=True)(state["params"], state["extra"],
                                          imgs, uv_a, uv_b, True)
            updates, opt = self.tx.update(grads, state["opt"],
                                          state["params"])
            params = optax.apply_updates(state["params"], updates)
            return ({"params": params, "extra": new_extra, "opt": opt},
                    metrics)

        return jax.jit(step)

    # -------------------------------------------------------------- dump
    def feature_maps(self, state, images: np.ndarray, batch: int = 8
                     ) -> Tuple[np.ndarray, np.ndarray]:
        """(N, H, W, 3) in [0,1] -> (features (N, H/2, W/2, D) f32,
        attn (N, H/2, W/2) f32 in [0, 1] — feature-energy saliency, the
        stand-in for DINO's cls attention)."""
        variables = {"params": state["params"], **state["extra"]}
        apply = jax.jit(lambda imgs: self.net.apply(variables, imgs))
        outs = []
        for s in range(0, len(images), batch):
            outs.append(np.asarray(apply(jnp.asarray(images[s:s + batch]))))
        feats = np.concatenate(outs).astype(np.float32)
        energy = np.linalg.norm(feats, axis=-1)
        lo = np.percentile(energy, 5)
        hi = np.percentile(energy, 95) + 1e-6
        attn = np.clip((energy - lo) / (hi - lo), 0.0, 1.0)
        return feats, attn.astype(np.float32)


def teacher_quality(state, trainer: TeacherTrainer, scenes: List,
                    rng: np.random.Generator, n_pairs: int = 128
                    ) -> Dict[str, float]:
    """View-invariance metrics of the TEACHER itself on held-out scenes:
    matched-pixel cosine vs random-pixel cosine, and nearest-neighbor
    correspondence accuracy @2px in feature-map space."""
    sims_pos, sims_rand, hits, total = [], [], 0, 0
    for sc in scenes:
        feats, _ = trainer.feature_maps(state, sc.images)
        v = len(sc.images)
        i, j = rng.choice(v, 2, replace=False)
        m = match_pixels(sc.poses, sc.focal, sc.depth, int(i), int(j),
                         n_pairs, rng)
        if m is None:
            continue
        uv_a, uv_b = m
        fa, fb = feats[int(i)], feats[int(j)]
        ga = fa[np.clip((uv_a[:, 1] / 2).astype(int), 0, fa.shape[0] - 1),
                np.clip((uv_a[:, 0] / 2).astype(int), 0, fa.shape[1] - 1)]
        gb = fb[np.clip((uv_b[:, 1] / 2).astype(int), 0, fb.shape[0] - 1),
                np.clip((uv_b[:, 0] / 2).astype(int), 0, fb.shape[1] - 1)]
        na = ga / (np.linalg.norm(ga, axis=-1, keepdims=True) + 1e-6)
        nb = gb / (np.linalg.norm(gb, axis=-1, keepdims=True) + 1e-6)
        sims_pos.append(float(np.mean(np.sum(na * nb, -1))))
        sims_rand.append(float(np.mean(
            na @ nb[rng.permutation(len(nb))].T) ))
        # NN correspondence in view j's full feature map
        flat = fb.reshape(-1, fb.shape[-1])
        flat = flat / (np.linalg.norm(flat, axis=-1, keepdims=True) + 1e-6)
        nn_idx = np.argmax(na @ flat.T, axis=-1)
        ny, nx = nn_idx // fb.shape[1], nn_idx % fb.shape[1]
        err = np.hypot(ny * 2 - uv_b[:, 1], nx * 2 - uv_b[:, 0])
        hits += int((err <= 2.0).sum())
        total += len(err)
    return {
        "matched_cosine": float(np.mean(sims_pos)) if sims_pos else 0.0,
        "random_cosine": float(np.mean(sims_rand)) if sims_rand else 0.0,
        "teacher_corr_at2px": hits / total if total else 0.0,
    }
