"""Camera ray generation and NeRF positional encoding.

Pure, vmappable functions with static shapes (jit/TPU-friendly).

Parity targets:
  - unproj_map / gen_rays: /root/reference/utils.py:444-507
  - PositionalEncoding:    /root/reference/utils.py:521-567
Ray layout is the reference's 8-dim convention:
  [origin(3), direction(3), near(1), far(1)].
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


def unproj_map(width: int, height: int, focal, c=None, dtype=jnp.float32) -> jnp.ndarray:
    """Per-pixel unit ray directions in the camera frame (OpenGL convention:
    +x right, +y up, camera looks down -z). Returns (H, W, 3)."""
    focal = jnp.asarray(focal, dtype=dtype)
    if focal.ndim == 0:
        fx = fy = focal
    else:
        focal = focal.reshape(-1)
        fx, fy = (focal[0], focal[0]) if focal.shape[0] == 1 else (focal[0], focal[1])
    if c is None:
        cx, cy = width * 0.5, height * 0.5
    else:
        c = jnp.asarray(c, dtype=dtype).reshape(-1)
        cx, cy = c[0], c[1]
    ys = jnp.arange(height, dtype=dtype) - cy
    xs = jnp.arange(width, dtype=dtype) - cx
    Y, X = jnp.meshgrid(ys, xs, indexing="ij")
    X = X / fx
    Y = Y / fy
    Z = jnp.ones_like(X)
    d = jnp.stack([X, -Y, -Z], axis=-1)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def gen_rays(poses: jnp.ndarray, width: int, height: int, focal, z_near: float,
             z_far: float, c=None) -> jnp.ndarray:
    """Camera rays for each pixel of each pose.

    poses: (B, 4, 4) camera-to-world (OpenGL).
    Returns (B, H, W, 8): [origin, direction, near, far].
    """
    dirs_cam = unproj_map(width, height, focal, c=c, dtype=poses.dtype)  # (H, W, 3)
    # rotate: (B,1,1,3,3) @ (H,W,3,1)
    dirs_world = jnp.einsum("bij,hwj->bhwi", poses[:, :3, :3], dirs_cam)
    origins = jnp.broadcast_to(poses[:, None, None, :3, 3], dirs_world.shape)
    near = jnp.full(dirs_world.shape[:-1] + (1,), z_near, dtype=poses.dtype)
    far = jnp.full(dirs_world.shape[:-1] + (1,), z_far, dtype=poses.dtype)
    return jnp.concatenate([origins, dirs_world, near, far], axis=-1)


@dataclasses.dataclass(frozen=True)
class PositionalEncodingSpec:
    """NeRF sinusoidal positional encoding spec.

    freqs are freq_factor * 2**i; output interleaves (sin, cos) per frequency
    and optionally prepends the raw input — matching the reference layout
    sin(f0 x), cos(f0 x), sin(f1 x), ... per input dim block.
    """

    num_freqs: int = 6
    d_in: int = 3
    freq_factor: float = 1.5
    include_input: bool = True

    @property
    def d_out(self) -> int:
        d = self.num_freqs * 2 * self.d_in
        return d + self.d_in if self.include_input else d


def positional_encoding(x: jnp.ndarray, spec: PositionalEncodingSpec) -> jnp.ndarray:
    """Apply sinusoidal encoding. x: (..., d_in) -> (..., spec.d_out).

    Layout matches the reference: for each frequency f (ordered f0..fK, each
    repeated as [sin, cos]) the whole d_in block is emitted:
      [x?, sin(f0*x), cos(f0*x), sin(f1*x), cos(f1*x), ...] with each entry a
    d_in-wide block.
    """
    freqs = spec.freq_factor * (2.0 ** jnp.arange(spec.num_freqs, dtype=x.dtype))
    # (..., 1, d_in) * (num_freqs, 1) -> (..., num_freqs, d_in)
    scaled = x[..., None, :] * freqs[:, None]
    sin = jnp.sin(scaled)
    cos = jnp.cos(scaled)
    # interleave sin/cos per frequency: (..., num_freqs, 2, d_in)
    enc = jnp.stack([sin, cos], axis=-2)
    enc = enc.reshape(*x.shape[:-1], spec.num_freqs * 2 * spec.d_in)
    if spec.include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
