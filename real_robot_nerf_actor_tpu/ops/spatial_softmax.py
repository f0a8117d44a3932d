"""3-D spatial soft-argmax keypoints.

Reference behavior: /root/reference/network_utils.py:977-1015
(SpatialSoftmax3D): per-channel softmax over the flattened volume at
temperature 0.01, then expected (x, y, z) in [-1, 1] per channel.

Note the reference flattens with channels folded into the batch dim
(`view(-1, H*W*D)`), so the position grids must follow the same
meshgrid(linspace, linspace, linspace) layout; we reproduce that exactly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _pos_grids(d: int, h: int, w: int, dtype=jnp.float32):
    # matches np.meshgrid(linspace(d), linspace(h), linspace(w)) default ('xy')
    px, py, pz = np.meshgrid(
        np.linspace(-1.0, 1.0, d), np.linspace(-1.0, 1.0, h),
        np.linspace(-1.0, 1.0, w))
    return (jnp.asarray(px.reshape(-1), dtype),
            jnp.asarray(py.reshape(-1), dtype),
            jnp.asarray(pz.reshape(-1), dtype))


def spatial_softmax_3d(feature: jnp.ndarray, temperature: float = 0.01) -> jnp.ndarray:
    """feature: (B, D, H, W, C) channel-last -> (B, C*3) expected keypoints.

    Equivalent to the reference applied to the channel-first tensor
    (B, C, D, H, W): each channel's volume is softmaxed independently.

    Layout note: computed channel-last as ONE fused multiply-reduce over a
    [1, x, y, z] basis — exp/scale stay inline in fp32 inside the reduction
    (needed: at temperature 0.01 a bf16 softmax loses the mode), so no
    channel-first transpose or fp32 copy of the 100^3 volume materializes
    (those copies were ~20%% of the policy forward).
    """
    b, d, h, w, c = feature.shape
    px, py, pz = _pos_grids(d, h, w, jnp.float32)
    ones = jnp.ones_like(px)
    basis = jnp.stack([ones, px, py, pz], axis=-1).reshape(d, h, w, 1, 4)
    m = jnp.max(feature, axis=(1, 2, 3), keepdims=True)
    e = jnp.exp((feature - m).astype(jnp.float32) / temperature)
    sums = jnp.sum(e[..., None] * basis[None], axis=(1, 2, 3))  # (B, C, 4)
    kp = sums[..., 1:] / sums[..., :1]
    return kp.reshape(b, c * 3)
