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
    """
    b, d, h, w, c = feature.shape
    px, py, pz = _pos_grids(d, h, w, jnp.float32)
    # fp32: at temperature 0.01 over 1e6 elements bf16 softmax loses the mode
    flat = feature.transpose(0, 4, 1, 2, 3).reshape(
        b * c, d * h * w).astype(jnp.float32)
    att = jax.nn.softmax(flat / temperature, axis=-1)
    ex = att @ px
    ey = att @ py
    ez = att @ pz
    kp = jnp.stack([ex, ey, ez], axis=-1)  # (B*C, 3)
    return kp.reshape(b, c * 3)
