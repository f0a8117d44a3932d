"""Ray-depth samplers: stratified coarse, importance (CDF-inversion) fine,
and depth-guided fine.

All static-shape, explicit-PRNG functions (reference used implicit torch RNG:
/root/reference/neural_rendering.py:159-221).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_coarse(key: jax.Array, rays: jnp.ndarray, n_coarse: int,
                  lindisp: bool = False) -> jnp.ndarray:
    """Stratified sampling. rays: (B, 8) -> z samples (B, Kc)."""
    near, far = rays[:, -2:-1], rays[:, -1:]
    b = rays.shape[0]
    step = 1.0 / n_coarse
    z_steps = jnp.linspace(0.0, 1.0 - step, n_coarse, dtype=rays.dtype)[None]
    z_steps = z_steps + jax.random.uniform(key, (b, n_coarse), dtype=rays.dtype) * step
    if not lindisp:
        return near * (1.0 - z_steps) + far * z_steps
    return 1.0 / (1.0 / near * (1.0 - z_steps) + 1.0 / far * z_steps)


def sample_fine(key: jax.Array, rays: jnp.ndarray, weights: jnp.ndarray,
                n_fine: int, n_coarse: int, lindisp: bool = False) -> jnp.ndarray:
    """Importance sampling from coarse weights via inverse-CDF.

    rays: (B, 8); weights: (B, Kc) (detached by caller). Returns (B, n_fine).
    """
    b = rays.shape[0]
    weights = jax.lax.stop_gradient(weights) + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (B, Kc+1)

    k_u, k_jitter = jax.random.split(key)
    u = jax.random.uniform(k_u, (b, n_fine), dtype=rays.dtype)
    # searchsorted(right) as a compare+reduce (the vmapped binary search
    # lowers to a serial while loop on TPU; this is one vectorized pass)
    inds = jnp.sum(cdf[:, None, :] <= u[:, :, None], axis=-1)
    inds = jnp.maximum(inds.astype(rays.dtype) - 1.0, 0.0)
    z_steps = (inds + jax.random.uniform(k_jitter, (b, n_fine), dtype=rays.dtype)) / n_coarse

    near, far = rays[:, -2:-1], rays[:, -1:]
    if not lindisp:
        return near * (1.0 - z_steps) + far * z_steps
    return 1.0 / (1.0 / near * (1.0 - z_steps) + 1.0 / far * z_steps)


def sample_importance_z(key: jax.Array, z: jnp.ndarray, weights: jnp.ndarray,
                        n_fine: int) -> jnp.ndarray:
    """Importance sampling over ARBITRARY sorted coarse positions.

    sample_fine assumes the coarse pass was uniform-stratified (bin i maps
    linearly back to [near, far]); occupancy-placed coarse samples are not
    uniform, so here the CDF is inverted over the actual intervals
    [z_i, z_{i+1}] weighted by the coarse compositing weights.

    z: (B, K) sorted; weights: (B, K). Returns (B, n_fine), unsorted.
    """
    b, k = z.shape
    w = jax.lax.stop_gradient(weights[:, :-1]) + 1e-5     # interval i = [z_i, z_{i+1}]
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)
    k_u, k_j = jax.random.split(key)
    u = jax.random.uniform(k_u, (b, n_fine), dtype=z.dtype)
    inds = jnp.sum(cdf[:, None, :] <= u[:, :, None], axis=-1)
    inds = jnp.clip(inds - 1, 0, k - 2)
    z_lo = jnp.take_along_axis(z, inds, axis=-1)
    z_hi = jnp.take_along_axis(z, inds + 1, axis=-1)
    t = jax.random.uniform(k_j, (b, n_fine), dtype=z.dtype)
    return z_lo + t * (z_hi - z_lo)


def sample_fine_depth(key: jax.Array, rays: jnp.ndarray, depth: jnp.ndarray,
                      n_fine_depth: int, depth_std: float = 0.001) -> jnp.ndarray:
    """Gaussian samples around a per-ray depth estimate, clamped to [near, far].

    rays: (B, 8); depth: (B,). Returns (B, n_fine_depth).
    """
    z = jnp.repeat(depth[:, None], n_fine_depth, axis=1)
    z = z + jax.random.normal(key, z.shape, dtype=rays.dtype) * depth_std
    return jnp.clip(z, rays[:, -2:-1], rays[:, -1:])
