"""Pallas TPU kernel: ray -> per-sample field expansion for the int8
serving renderer.

The fused int8 ResnetFC kernel left ~16 ms/render of XLA "assembly" ops:
canonical coords, wrapped pos-enc phases, lerp weights and gather indices
are all (N, k<128)-shaped, and XLA tile-pads their lanes to 128 so every
elementwise op runs as a full-width pass. This kernel computes ALL of
them in their natural lane-major layouts instead:

    zT (K, R), raysT (8, R)  ->  auxT (24, K, R) bf16   [canon|dirs|theta]
                                 w8T  (8, K, R) f32     [lerp weights]
                                 flatT   (K, R) int32   [gather rows]

Every field is a (K, bn_r) elementwise expression over fully-packed
blocks — no (N, 3) arrays exist anywhere. Sample order is K-MAJOR
(n = k*R + r): reshapes of the outputs to (N,)/(8, N)/(24, N) are free,
and the downstream consumers (gather rows, corner_lerp, the fused MLP)
treat rows independently, so only the final per-ray compositing
transposes the small (K, R) sigma/rgb arrays back.

Weight/index math matches ops/grid_sample.grid_sample_3d_fused exactly
(fp32, same clipping/mask rules); phases are wrapped to [-pi, pi) like
ops/resnetfc_pallas.pack_mlp_input. Forward-only (serving).

Reference behavior covered: models_embed.py:259-293 sampling semantics +
utils.py PositionalEncoding (see ops/grid_sample.py, ops/rays.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(raysT_ref, zT_ref, aux_ref, w8_ref, flat_ref, *,
            dims: tuple, bounds: tuple, num_freqs: int, freq_factor: float):
    d, h, w = dims
    lo = bounds[:3]
    ext = (bounds[3] - bounds[0], bounds[4] - bounds[1],
           bounds[5] - bounds[2])
    z = zT_ref[...].astype(jnp.float32)                 # (K, bn)

    canon = []
    for i in range(3):
        o = raysT_ref[i].astype(jnp.float32)            # (bn,)
        dr = raysT_ref[3 + i].astype(jnp.float32)
        p = o[None, :] + z * dr[None, :]
        canon.append((p - lo[i]) / ext[i])

    # grid-space coords (canon -> [-1,1] -> align_corners unnormalize is
    # just canon * (size-1)); torch convention: canon[0]=x indexes W
    gx = canon[0] * (w - 1)
    gy = canon[1] * (h - 1)
    gz = canon[2] * (d - 1)
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    z0 = jnp.floor(gz)
    tx, ty, tz = gx - x0, gy - y0, gz - z0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)
    wxs = (1.0 - tx, tx)
    wys = (1.0 - ty, ty)
    wzs = (1.0 - tz, tz)
    for k in range(8):
        dz, dy, dx = k >> 2, (k >> 1) & 1, k & 1
        zi, yi, xi = z0i + dz, y0i + dy, x0i + dx
        inb = ((zi >= 0) & (zi < d) & (yi >= 0) & (yi < h)
               & (xi >= 0) & (xi < w))
        w8_ref[k] = (wzs[dz] * wys[dy] * wxs[dx]
                     * inb.astype(jnp.float32))
    hp, wp = h + 1, w + 1
    x0c = jnp.clip(x0i, -1, w - 1) + 1
    y0c = jnp.clip(y0i, -1, h - 1) + 1
    z0c = jnp.clip(z0i, -1, d - 1) + 1
    flat_ref[...] = (z0c * hp + y0c) * wp + x0c

    # aux rows: [canon(3) | dirs(3) | wrapped phases (3 per freq, f-major)]
    for i in range(3):
        aux_ref[i] = canon[i].astype(jnp.bfloat16)
    for i in range(3):
        dr = raysT_ref[3 + i].astype(jnp.float32)
        aux_ref[3 + i] = jnp.broadcast_to(
            dr[None, :], z.shape).astype(jnp.bfloat16)
    two_pi = 2.0 * np.pi
    for f in range(num_freqs):
        fr = np.float32(freq_factor * (2.0 ** f))
        for i in range(3):
            t = canon[i] * fr
            aux_ref[6 + f * 3 + i] = (
                t - two_pi * jnp.round(t / two_pi)).astype(jnp.bfloat16)


def ray_expand(rays: jnp.ndarray, z_samp: jnp.ndarray, grid_dims: tuple,
               coord_bounds: tuple, num_freqs: int = 6,
               freq_factor: float = 1.5, bn: int = 256):
    """rays: (R, 8) [o, d, near, far]; z_samp: (R, K). Returns
    (auxT (24, K, Rp) bf16, w8T (8, K, Rp) f32, flatT (K, Rp) int32, Rp)
    with R padded to a multiple of bn (padded rays repeat row 0; callers
    slice sample rows [: K*R] after the k-major reshape ONLY if Rp == R —
    otherwise keep Rp and mask at compositing; the renderer pads R
    upstream so Rp == R)."""
    r, k = z_samp.shape
    assert r % bn == 0, "pad the ray batch to a multiple of bn upstream"
    n_aux = 6 + num_freqs * 3
    d, h, w = grid_dims
    bounds = tuple(float(b) for b in coord_bounds)

    auxT, w8T, flatT = pl.pallas_call(
        functools.partial(_kernel, dims=(d, h, w), bounds=bounds,
                          num_freqs=num_freqs, freq_factor=freq_factor),
        grid=(r // bn,),
        in_specs=[
            pl.BlockSpec((8, bn), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_aux, k, bn), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, k, bn), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_aux, k, r), jnp.bfloat16),
            jax.ShapeDtypeStruct((8, k, r), jnp.float32),
            jax.ShapeDtypeStruct((k, r), jnp.int32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(rays[:, :8].T, z_samp.T)
    return auxT, w8T, flatT
