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


def compute_weights(z_sorted: jnp.ndarray, sigmas_sorted: jnp.ndarray,
                    rays: jnp.ndarray) -> jnp.ndarray:
    """Per-sample compositing weights from SORTED depths + matching sigmas."""
    deltas = z_sorted[:, 1:] - z_sorted[:, :-1]
    delta_inf = rays[:, -1:] - z_sorted[:, -1:]
    deltas = jnp.concatenate([deltas, delta_inf], axis=-1)  # (B, K)

    alphas = 1.0 - jnp.exp(-deltas * jax.nn.relu(sigmas_sorted))
    alphas_shifted = jnp.concatenate(
        [jnp.ones_like(alphas[:, :1]), 1.0 - alphas + 1e-10], axis=-1)
    transmittance = jnp.cumprod(alphas_shifted, axis=-1)  # (B, K+1)
    return alphas * transmittance[:, :-1]


def composite(z_samp: jnp.ndarray, rays: jnp.ndarray, rgbs: jnp.ndarray,
              sigmas: jnp.ndarray, embeds: jnp.ndarray,
              white_bkgd: bool = False) -> CompositeOut:
    """Alpha-composite per-sample radiance into per-ray outputs.

    z_samp: (B, K) sorted depths; rays: (B, 8); rgbs: (B, K, 3);
    sigmas: (B, K) (pre-activation or relu'd — relu is idempotent);
    embeds: (B, K, D).
    """
    weights = compute_weights(z_samp, sigmas, rays)

    rgb = jnp.sum(weights[..., None] * rgbs, axis=-2)
    embed = jnp.sum(weights[..., None] * embeds, axis=-2)
    depth = jnp.sum(weights * z_samp, axis=-1)

    if white_bkgd:
        pix_alpha = jnp.sum(weights, axis=1)
        rgb = rgb + (1.0 - pix_alpha[..., None])
    return CompositeOut(weights=weights, rgb=rgb, embed=embed, depth=depth)


def composite_unsorted(z_samp: jnp.ndarray, rays: jnp.ndarray,
                       rgbs: jnp.ndarray, sigmas: jnp.ndarray,
                       embeds: jnp.ndarray,
                       white_bkgd: bool = False) -> CompositeOut:
    """Composite samples given in ARBITRARY depth order.

    Only scalars (z, sigma, weights) are sorted/unsorted; the weighted sums
    over rgb/embed are order-invariant, so the wide per-sample value arrays
    are never reordered. This is what lets the fine pass reuse the coarse
    pass's MLP evaluations instead of re-evaluating the sorted union
    (the reference re-runs all Kc+Kf points, neural_rendering.py:452-467).
    Weights are returned in the INPUT sample order.
    """
    order = jnp.argsort(z_samp, axis=-1)
    z_sorted = jnp.take_along_axis(z_samp, order, axis=-1)
    sig_sorted = jnp.take_along_axis(sigmas, order, axis=-1)
    w_sorted = compute_weights(z_sorted, sig_sorted, rays)
    inv = jnp.argsort(order, axis=-1)
    weights = jnp.take_along_axis(w_sorted, inv, axis=-1)

    rgb = jnp.sum(weights[..., None] * rgbs, axis=-2)
    embed = jnp.sum(weights[..., None] * embeds, axis=-2)
    depth = jnp.sum(weights * z_samp, axis=-1)
    if white_bkgd:
        pix_alpha = jnp.sum(weights, axis=1)
        rgb = rgb + (1.0 - pix_alpha[..., None])
    return CompositeOut(weights=weights, rgb=rgb, embed=embed, depth=depth)
