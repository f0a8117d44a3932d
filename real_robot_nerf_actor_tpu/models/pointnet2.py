"""PointNet++ (set abstraction) point-cloud encoder — flax, static shapes.

Reference behavior: /root/reference/featurenerf_robo/src/representations/pointnet2.py
(get_model: three PointNetSetAbstraction levels — (npoint=512, r=0.2, k=32,
mlp 64/64/128), (128, 0.4, 64, mlp 128/128/256), (group_all, mlp
256/512/1024) — returning the 1024-d global feature) over
utils_pointnet2's farthest point sampling + ball query grouping.

TPU design: everything is static-shape dense math —
  - farthest point sampling is a ``lax.scan`` over the npoint centroids
    (argmax of running min-distance), O(npoint * N) vectorized;
  - ball query sorts point indices with out-of-radius entries pushed to the
    end and keeps the first ``nsample`` (identical semantics to the
    reference's index-sort formulation), padding misses with the group's
    first hit;
  - the per-group MLPs are Dense layers over the channel axis of the dense
    (B, npoint, nsample, C) grouping — MXU-shaped batched matmuls.
Batch-norm runs with frozen statistics (zoo encoders are feature
extractors); `convert_torch_pointnet2_weights` maps the reference's
pretrained classification checkpoint.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def farthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """xyz: (B, N, 3) -> (B, npoint) int32 indices. Deterministic start at
    point 0 (the reference seeds with a random point; parity tests inject
    indices, and determinism is jit-friendlier)."""
    b, n, _ = xyz.shape

    def step(carry, _):
        min_d, last = carry
        d = jnp.sum((xyz - jnp.take_along_axis(
            xyz, last[:, None, None], axis=1)) ** 2, axis=-1)
        min_d = jnp.minimum(min_d, d)
        nxt = jnp.argmax(min_d, axis=-1).astype(jnp.int32)
        return (min_d, nxt), last

    init = (jnp.full((b, n), jnp.inf), jnp.zeros((b,), jnp.int32))
    _, idx = jax.lax.scan(step, init, None, length=npoint)
    return idx.T  # (B, npoint)


def ball_query(xyz: jnp.ndarray, centers: jnp.ndarray, radius: float,
               nsample: int) -> jnp.ndarray:
    """Indices (B, M, nsample) of the first-nsample points of ``xyz``
    within ``radius`` of each center; misses padded with the first hit."""
    n = xyz.shape[1]
    d2 = jnp.sum((centers[:, :, None] - xyz[:, None]) ** 2, -1)  # (B, M, N)
    order = jnp.where(d2 <= radius * radius,
                      jnp.arange(n, dtype=jnp.int32)[None, None], n)
    order = jnp.sort(order, axis=-1)[..., :nsample]
    first = order[..., :1]
    return jnp.where(order == n, first, order).astype(jnp.int32)


def _gather_points(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """feats (B, N, C), idx (B, ...) -> (B, ..., C)."""
    return jax.vmap(lambda f, i: f[i])(feats, idx)


class SetAbstraction(nn.Module):
    """One PointNet++ SA level: sample centroids, group neighbors, shared
    MLP, max-pool over the group."""

    npoint: Optional[int]          # None -> group_all
    radius: Optional[float]
    nsample: Optional[int]
    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, feats: Optional[jnp.ndarray],
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.npoint is None:                       # group all
            grouped = xyz[:, None]                    # (B, 1, N, 3)
            if feats is not None:
                grouped = jnp.concatenate([grouped, feats[:, None]], -1)
            new_xyz = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)
        else:
            fps = farthest_point_sample(xyz, self.npoint)
            new_xyz = _gather_points(xyz, fps)        # (B, M, 3)
            idx = ball_query(xyz, new_xyz, self.radius, self.nsample)
            grouped = _gather_points(xyz, idx) - new_xyz[:, :, None]
            if feats is not None:
                grouped = jnp.concatenate(
                    [grouped, _gather_points(feats, idx)], -1)
        y = grouped
        for i, f in enumerate(self.mlp):
            y = nn.Dense(f, name=f"mlp{i}")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn{i}")(y)
            y = nn.relu(y)
        return new_xyz, jnp.max(y, axis=2)            # (B, M, mlp[-1])


class PointNet2Encoder(nn.Module):
    """Reference classification-backbone stack -> (B, 1024) global feature."""

    @nn.compact
    def __call__(self, pts: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        xyz = pts[..., :3]
        feats = pts[..., 3:] if pts.shape[-1] > 3 else None
        xyz, f = SetAbstraction(512, 0.2, 32, (64, 64, 128),
                                name="sa1")(xyz, feats, train)
        xyz, f = SetAbstraction(128, 0.4, 64, (128, 128, 256),
                                name="sa2")(xyz, f, train)
        _, f = SetAbstraction(None, None, None, (256, 512, 1024),
                              name="sa3")(xyz, f, train)
        return f[:, 0]


def convert_torch_pointnet2_weights(state_dict: Dict) -> dict:
    """Map the reference's pretrained pointnet2_cls checkpoint
    (sa{i}.mlp_convs.{j} 1x1 Conv2d + sa{i}.mlp_bns.{j} BatchNorm2d) to
    this module's variables; fc head ignored."""
    params: Dict = {}
    stats: Dict = {}
    n_layers = {"sa1": 3, "sa2": 3, "sa3": 3}
    for sa, n in n_layers.items():
        for j in range(n):
            w = np.asarray(state_dict[f"{sa}.mlp_convs.{j}.weight"])
            params.setdefault(sa, {})[f"mlp{j}"] = {
                "kernel": jnp.asarray(w[:, :, 0, 0].T),
                "bias": jnp.asarray(np.asarray(
                    state_dict[f"{sa}.mlp_convs.{j}.bias"]))}
            bn = f"{sa}.mlp_bns.{j}"
            params[sa][f"bn{j}"] = {
                "scale": jnp.asarray(np.asarray(state_dict[bn + ".weight"])),
                "bias": jnp.asarray(np.asarray(state_dict[bn + ".bias"]))}
            stats.setdefault(sa, {})[f"bn{j}"] = {
                "mean": jnp.asarray(np.asarray(
                    state_dict[bn + ".running_mean"])),
                "var": jnp.asarray(np.asarray(
                    state_dict[bn + ".running_var"]))}
    return {"params": params, "batch_stats": stats}
