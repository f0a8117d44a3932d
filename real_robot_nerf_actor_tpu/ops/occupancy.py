"""Occupancy-based sample compaction for the neural renderer.

The reference renderer spends its samples uniformly along each ray
(/root/reference/neural_rendering.py:159-178): on a table-top scene most of
them land in empty air and still pay a full MLP evaluation. The voxelizer
already knows where matter is — its occupancy channel
(ops/voxelize.py, channel -1, mirroring voxel_grid_real.py's occupancy
feature) — so serving can skip empty space. Two mechanisms, both opt-in
(RendererConfig.sampling_mode = "occupancy"), both static-shape/TPU-native:

1. ray tightening (ZERO gathers): intersect every ray with the axis-aligned
   bounding box of the occupied cells and shrink its [near, far] to that
   slab. Pure vector math; on a table-top scene the sampled interval drops
   ~10x before any per-sample work happens.
2. occupancy-weighted placement: probe a max-pooled + dilated occupancy
   grid at P points along the (tightened) ray — one thin gather per probe,
   P << MLP sample cost — and place the per-ray sample budget by inverse
   CDF over (occupancy + floor). Samples concentrate in occupied space;
   the floor keeps a trickle of coverage everywhere the probe saw nothing.

Like the proposal sampler this CHANGES sampling semantics (documented perf
mode, not the parity config): quality is measured against the full
stratified render on a trained checkpoint (tests/test_occupancy.py,
BENCH_NOTES r3).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pool_occupancy(occ: jnp.ndarray, pool: int = 4, dilate: int = 1
                   ) -> jnp.ndarray:
    """Max-pool a (V, V, V) occupancy grid by `pool` and dilate the result
    by `dilate` cells (3^3 max filter applied `dilate` times). Dilation is
    the safety margin: geometry near a pooled-cell border stays covered by
    the neighboring cell, and the occupied-AABB inherits the margin."""
    v = occ.shape[-1]
    assert v % pool == 0, (v, pool)
    vp = v // pool
    p = occ.reshape(vp, pool, vp, pool, vp, pool)
    p = p.max(axis=(1, 3, 5))
    for _ in range(dilate):
        p = jax.lax.reduce_window(
            p, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1),
            [(1, 1)] * 3)
    return (p > 0.0).astype(jnp.float32)


def occupied_aabb(occ_pooled: jnp.ndarray) -> jnp.ndarray:
    """Canonical-coordinate AABB of the occupied cells of a pooled grid.

    occ_pooled: (Vp, Vp, Vp) in {0, 1}. Returns (2, 3): [lo, hi] in [0, 1]
    canonical units (cell outer edges). An empty grid degrades to the full
    box (no tightening), never to an invalid interval.
    """
    vp = occ_pooled.shape[0]
    out = []
    for ax in range(3):
        v = occ_pooled.max(axis=tuple(a for a in range(3) if a != ax))
        any_occ = v.max() > 0.0
        lo = jnp.argmax(v)                       # first occupied cell
        hi = vp - jnp.argmax(v[::-1])            # one past last occupied
        lo = jnp.where(any_occ, lo, 0)
        hi = jnp.where(any_occ, hi, vp)
        out.append(jnp.stack([lo.astype(jnp.float32) / vp,
                              hi.astype(jnp.float32) / vp]))
    return jnp.stack(out, axis=-1)               # (2, 3)


def tighten_rays(rays: jnp.ndarray, aabb: jnp.ndarray,
                 coord_bounds: jnp.ndarray) -> jnp.ndarray:
    """Shrink each ray's [near, far] to its intersection with the occupied
    AABB (slab method, zero gathers). rays: (R, 8) reference layout
    [origin, dir, near, far]; aabb: (2, 3) canonical; coord_bounds: (6,).

    Rays missing the box get near = far = original far: their samples land
    at the far plane (outside occupied space) and composite to background.
    """
    bmin = coord_bounds[:3]
    bmax = coord_bounds[3:]
    w_lo = bmin + aabb[0] * (bmax - bmin)
    w_hi = bmin + aabb[1] * (bmax - bmin)
    o, d = rays[:, :3], rays[:, 3:6]
    near, far = rays[:, 6], rays[:, 7]
    safe_d = jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
    t0 = (w_lo - o) / safe_d
    t1 = (w_hi - o) / safe_d
    tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), near)
    tf = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=-1), far)
    miss = tn >= tf
    tn = jnp.where(miss, far, tn)
    tf = jnp.where(miss, far, tf)
    return jnp.concatenate(
        [rays[:, :6], tn[:, None], tf[:, None]], axis=-1)


def sample_occupancy(key: jax.Array, rays: jnp.ndarray,
                     occ_pooled: jnp.ndarray, n_samples: int,
                     coord_bounds: jnp.ndarray, n_probe: int = 32,
                     floor: float = 0.002) -> jnp.ndarray:
    """Place `n_samples` z values per ray by inverse-CDF over probed
    occupancy (+ floor), stratified within the chosen probe bins.

    rays: (R, 8) — typically ALREADY tightened (tighten_rays); the probe
    then resolves structure inside the occupied slab. Returns (R, K) z,
    sorted ascending (stratified u is monotone through a monotone CDF).
    Probe cost: R * n_probe rows of one float each (~11.4 ns/row on v5e,
    the thin-gather descriptor floor) — far below the per-sample MLP cost
    it displaces.
    """
    r = rays.shape[0]
    vp = occ_pooled.shape[0]
    near, far = rays[:, 6:7], rays[:, 7:8]
    bmin = coord_bounds[:3]
    inv_span = 1.0 / (coord_bounds[3:] - bmin)

    # probe bin midpoints
    t_mid = near + (jnp.arange(n_probe, dtype=rays.dtype)[None] + 0.5) \
        / n_probe * (far - near)                               # (R, P)
    pts = rays[:, None, :3] + t_mid[..., None] * rays[:, None, 3:6]
    canon = (pts - bmin) * inv_span
    cell = jnp.clip((canon * vp).astype(jnp.int32), 0, vp - 1)
    inb = jnp.all((canon >= 0.0) & (canon < 1.0), axis=-1)
    flat = (cell[..., 0] * vp + cell[..., 1]) * vp + cell[..., 2]
    occ = jnp.take(occ_pooled.reshape(-1), flat.reshape(-1),
                   mode="clip").reshape(r, n_probe)
    w = occ * inb.astype(occ.dtype) + floor

    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)
    k_u, k_j = jax.random.split(key)
    # stratified u: even coverage of the CDF -> sorted z out
    u = (jnp.arange(n_samples, dtype=rays.dtype)[None]
         + jax.random.uniform(k_u, (r, n_samples), dtype=rays.dtype)) \
        / n_samples
    inds = jnp.sum(cdf[:, None, :] <= u[:, :, None], axis=-1)
    inds = jnp.clip(inds.astype(rays.dtype) - 1.0, 0.0, n_probe - 1.0)
    z_steps = (inds + jax.random.uniform(k_j, (r, n_samples),
                                         dtype=rays.dtype)) / n_probe
    z = near + z_steps * (far - near)
    return jnp.sort(z, axis=-1)
