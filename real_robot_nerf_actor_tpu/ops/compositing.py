"""NeRF alpha compositing along rays.

Reference behavior: /root/reference/neural_rendering.py:224-396 (composite):
  deltas from sorted z samples (last delta = far - z_last), alpha =
  1 - exp(-delta * relu(sigma)), transmittance = cumprod of shifted
  (1 - alpha + 1e-10), weights = alpha * T, then weighted sums for rgb /
  embed / depth.

TPU design: fully vectorized over (rays, samples); transmittance is an
exclusive cumsum of the optical depth x = delta * relu(sigma) in log
space — exactly the reference's cumprod of (1 - alpha) but without its
+1e-10 guard, whose backward is a ~300x gradient cliff once fp32 rounds
a saturated alpha to 1.0 (x > 17.3). The model evaluation is done by the
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
    """Per-sample compositing weights from SORTED depths + matching sigmas.

    Transmittance is computed in log space from the optical depth x
    directly: T_i = exp(-sum_{j<i} x_j) with x = delta * relu(sigma).
    This is EXACTLY prod(1 - alpha_j) (log(1 - alpha) == -x identically),
    but unlike the textbook cumprod(1 - alpha + 1e-10) it has no
    saturation cliff: once x > ~17.3, fp32 rounds alpha to exactly 1.0
    and the eps-guarded backward -1/(1-alpha+eps) * d(alpha)/d(sigma)
    amplifies the true gradient by up to ~300x (and produced a NaN in
    the fused TPU backward at x=18.9 — the round-3 flagship divergence
    at step 3547). d(-x)/d(sigma) = -delta is exact and bounded.
    """
    deltas = z_sorted[:, 1:] - z_sorted[:, :-1]
    delta_inf = rays[:, -1:] - z_sorted[:, -1:]
    deltas = jnp.concatenate([deltas, delta_inf], axis=-1)  # (B, K)

    x = deltas * jax.nn.relu(sigmas_sorted)
    alphas = 1.0 - jnp.exp(-x)
    # exclusive cumsum: optical depth of strict predecessors
    log_t = jnp.cumsum(x, axis=-1) - x
    return alphas * jnp.exp(-log_t)


def composite(z_samp: jnp.ndarray, rays: jnp.ndarray, rgbs: jnp.ndarray,
              sigmas: jnp.ndarray, embeds: jnp.ndarray,
              white_bkgd: bool = False,
              embeds_kmajor: bool = False) -> CompositeOut:
    """Alpha-composite per-sample radiance into per-ray outputs.

    z_samp: (B, K) sorted depths; rays: (B, 8); rgbs: (B, K, 3);
    sigmas: (B, K) (pre-activation or relu'd — relu is idempotent);
    embeds: (B, K, D) — or (K, B, D) when embeds_kmajor (the int8 serving
    kernels emit sample-major rows; the weighted sum contracts K either
    way, so no 1.6 GB transpose of the wide hidden array is needed).
    """
    weights = compute_weights(z_samp, sigmas, rays)

    rgb = jnp.sum(weights[..., None] * rgbs, axis=-2)
    if embeds_kmajor:
        embed = jnp.einsum("bk,kbd->bd", weights, embeds)
    else:
        embed = jnp.sum(weights[..., None] * embeds, axis=-2)
    depth = jnp.sum(weights * z_samp, axis=-1)

    if white_bkgd:
        pix_alpha = jnp.sum(weights, axis=1)
        rgb = rgb + (1.0 - pix_alpha[..., None])
    return CompositeOut(weights=weights, rgb=rgb, embed=embed, depth=depth)


def compute_weights_unsorted(z_samp: jnp.ndarray, sigmas: jnp.ndarray,
                             rays: jnp.ndarray) -> jnp.ndarray:
    """Compositing weights for samples in ARBITRARY order, without sorting.

    TPU gathers cost ~11 ns per row even for scalars, so applying an
    argsort permutation to (rays, K) arrays costs tens of ms. Instead:
      delta_i = (depth of i's sorted successor) - z_i  -> a masked min
      T_i     = prod over sorted predecessors of (1 - alpha_j)
              = exp( -M @ x ),  x_j = delta_j * relu(sigma_j)  -> a masked
                                                                  matmul
    with the predecessor mask M_ij = [z_j < z_i or (z_j == z_i and j < i)]
    (ties broken by index = stable-argsort semantics). Exact same weights
    as sorting; two fused (B, K, K) ops instead of three scalar gathers.

    The log-transmittance is the optical depth -x directly (exactly
    log(1 - alpha)); see compute_weights for why the eps-guarded
    log(1 - alpha + 1e-10) form is a gradient cliff once fp32 rounds a
    saturated alpha to 1.0 (the round-3 flagship NaN at step 3547 came
    from THIS path's backward at x = 18.9).
    """
    b, k = z_samp.shape
    idx = jnp.arange(k)
    zi = z_samp[:, :, None]   # i (queries)
    zj = z_samp[:, None, :]   # j (keys)
    before = (zj < zi) | ((zj == zi) & (idx[None, :, None] > idx[None, None, :]))
    # successor depth: min over strict successors (ties: larger index)
    after = (zj > zi) | ((zj == zi) & (idx[None, :, None] < idx[None, None, :]))
    big = rays[:, -1:][..., None]  # far as the "no successor" value
    succ_z = jnp.min(jnp.where(after, zj, big), axis=-1)
    deltas = succ_z - z_samp

    x = deltas * jax.nn.relu(sigmas)
    alphas = 1.0 - jnp.exp(-x)
    # T_i = exp(-sum over predecessors of x_j)
    transmittance = jnp.exp(-jnp.einsum(
        "bij,bj->bi", before.astype(x.dtype), x))
    return alphas * transmittance


def composite_unsorted(z_samp: jnp.ndarray, rays: jnp.ndarray,
                       rgbs: jnp.ndarray, sigmas: jnp.ndarray,
                       embeds: jnp.ndarray,
                       white_bkgd: bool = False) -> CompositeOut:
    """Composite samples given in ARBITRARY depth order.

    Only the scalar weight computation depends on depth order, and it is
    done WITHOUT sorting (compute_weights_unsorted); the weighted sums over
    rgb/embed are order-invariant, so the wide per-sample value arrays are
    never reordered. This is what lets the fine pass reuse the coarse
    pass's MLP evaluations instead of re-evaluating the sorted union
    (the reference re-runs all Kc+Kf points, neural_rendering.py:452-467).
    Weights are returned in the INPUT sample order.
    """
    weights = compute_weights_unsorted(z_samp, sigmas, rays)

    rgb = jnp.sum(weights[..., None] * rgbs, axis=-2)
    embed = jnp.sum(weights[..., None] * embeds, axis=-2)
    depth = jnp.sum(weights * z_samp, axis=-1)
    if white_bkgd:
        pix_alpha = jnp.sum(weights, axis=1)
        rgb = rgb + (1.0 - pix_alpha[..., None])
    return CompositeOut(weights=weights, rgb=rgb, embed=embed, depth=depth)
