"""NeRF alpha compositing along rays.

Reference behavior: /root/reference/neural_rendering.py:224-396 (composite):
  deltas from sorted z samples (last delta = far - z_last), alpha =
  1 - exp(-delta * relu(sigma)), transmittance = cumprod of shifted
  (1 - alpha + 1e-10), weights = alpha * T, then weighted sums for rgb /
  embed / depth.

TPU design: fully vectorized over (rays, samples); the cumprod is a small
log-space scan XLA handles natively. The model evaluation is done by the
caller in one batched MLP pass (no point-chunk loop).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CompositeOut(NamedTuple):
    weights: jnp.ndarray   # (B, K)
    rgb: jnp.ndarray       # (B, 3)
    embed: jnp.ndarray     # (B, D)
    depth: jnp.ndarray     # (B,)


def composite(z_samp: jnp.ndarray, rays: jnp.ndarray, rgbs: jnp.ndarray,
              sigmas: jnp.ndarray, embeds: jnp.ndarray,
              white_bkgd: bool = False) -> CompositeOut:
    """Alpha-composite per-sample radiance into per-ray outputs.

    z_samp: (B, K) sorted depths; rays: (B, 8); rgbs: (B, K, 3);
    sigmas: (B, K) (pre-activation or relu'd — relu is idempotent);
    embeds: (B, K, D).
    """
    deltas = z_samp[:, 1:] - z_samp[:, :-1]
    delta_inf = rays[:, -1:] - z_samp[:, -1:]
    deltas = jnp.concatenate([deltas, delta_inf], axis=-1)  # (B, K)

    alphas = 1.0 - jnp.exp(-deltas * jax.nn.relu(sigmas))
    alphas_shifted = jnp.concatenate(
        [jnp.ones_like(alphas[:, :1]), 1.0 - alphas + 1e-10], axis=-1)
    transmittance = jnp.cumprod(alphas_shifted, axis=-1)  # (B, K+1)
    weights = alphas * transmittance[:, :-1]

    rgb = jnp.sum(weights[..., None] * rgbs, axis=-2)
    embed = jnp.sum(weights[..., None] * embeds, axis=-2)
    depth = jnp.sum(weights * z_samp, axis=-1)

    if white_bkgd:
        pix_alpha = jnp.sum(weights, axis=1)
        rgb = rgb + (1.0 - pix_alpha[..., None])
    return CompositeOut(weights=weights, rgb=rgb, embed=embed, depth=depth)
