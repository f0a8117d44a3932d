"""Pallas TPU kernel: 3-D spatial-softmax statistics in one pass.

The policy computes soft-argmax keypoints over three ~100^3 x 64ch volumes
(reference SpatialSoftmax3D, network_utils.py:977-1015). The XLA lowering
materializes an fp32 copy of each volume for the exp (plus a layout copy)
— ~15-20% of the policy forward. This kernel streams the bf16 volume
through VMEM once, computing exp((x - max_c)/T) in registers and reducing
against the [1, x, y, z] position basis on the fly.

Kernel shapes are strictly 2-D (rows = y, lanes = x*C): Mosaic rejects
3-D middle-axis reductions here ("invalid relayout"), so the volume is
viewed as (z, y, x*C), the x/c position weights are host-precomputed
per-lane vectors, and the tiny (x, C) fold of the four statistic vectors
happens in XLA afterwards.

Matches ops.spatial_softmax.spatial_softmax_3d exactly in semantics,
including the reference's meshgrid('xy') quirk: for a feature at (z, y, x)
the three expected-coordinate weights are linspace[y], linspace[z],
linspace[x] respectively (exact for cubic volumes, which is the only case
the policy uses; non-cubic falls back to the XLA path).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stats_kernel(x_ref, mx_ref, lx_ref, out_ref, *, temperature: float,
                  v: int, zt: int):
    p = pl.program_id(0)
    # linspace(-1, 1, V) down the sublane (y) axis; Mosaic only allows
    # integer iota, so build it from an int32 iota
    lin_y = (jax.lax.broadcasted_iota(jnp.int32, (v, 1), 0)
             .astype(jnp.float32) * (2.0 / (v - 1)) - 1.0)
    mx = mx_ref[0]                                       # (v*c,) f32
    lx = lx_ref[0]                                       # (v*c,) f32

    def body(dz, acc):
        plane = x_ref[dz].astype(jnp.float32)            # (v, v*c)
        e = jnp.exp((plane - mx[None, :]) / temperature)
        col = jnp.sum(e, axis=0)                         # (v*c,)
        ny = jnp.sum(e * lin_y, axis=0)                  # linspace[y] weight
        lz = jnp.float32(p * zt + dz) * (2.0 / (v - 1)) - 1.0
        s0, sx, sy, sz = acc
        return (s0 + col, sx + ny, sy + col * lz, sz + col * lx)

    zero = jnp.zeros((x_ref.shape[-1],), jnp.float32)
    s0, sx, sy, sz = jax.lax.fori_loop(
        0, zt, body, (zero, zero, zero, zero))
    out_ref[0, 0] = s0
    out_ref[0, 1] = sx
    out_ref[0, 2] = sy
    out_ref[0, 3] = sz


def spatial_stats_3d(feature: jnp.ndarray, temperature: float = 0.01,
                     zt: int = 4) -> jnp.ndarray:
    """feature: (B, V, V, V, C) bf16/f32 -> (B, C, 4) fp32 sums
    [denominator, x, y, z numerators] of the spatial softmax expectation."""
    b, d, h, w, c = feature.shape
    assert d == h == w and d % zt == 0, "cubic volume, zt | V"
    v = d
    mx = jnp.max(feature, axis=(1, 2, 3)).astype(jnp.float32)  # (B, C)
    mx_lane = jnp.tile(mx, (1, v))                             # (B, v*c)
    # per-lane linspace[x] weight: lane = x*C + c
    lx_lane = jnp.asarray(
        np.repeat(np.linspace(-1.0, 1.0, v), c), jnp.float32)[None]

    grid = v // zt

    def one(x_b, mx_b):
        partials = pl.pallas_call(
            lambda x_ref, mx_ref, lx_ref, out_ref: _stats_kernel(
                x_ref, mx_ref, lx_ref, out_ref, temperature=temperature,
                v=v, zt=zt),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((zt, v, v * c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, v * c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, v * c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 4, v * c), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid, 4, v * c), jnp.float32),
        )(x_b.reshape(v, v, v * c), mx_b[None], lx_lane)
        # fold the x axis out of the lane dim: (4, v, c) -> (4, c)
        return partials.sum(axis=0).reshape(4, v, c).sum(axis=1).T  # (c, 4)

    return jax.vmap(one)(feature, mx_lane)


def spatial_softmax_3d_pallas(feature: jnp.ndarray,
                              temperature: float = 0.01) -> jnp.ndarray:
    """Drop-in for ops.spatial_softmax.spatial_softmax_3d (cubic volumes)."""
    b, d, h, w, c = feature.shape
    sums = spatial_stats_3d(feature, temperature)
    kp = sums[..., 1:] / sums[..., :1]
    return kp.reshape(b, c * 3)
