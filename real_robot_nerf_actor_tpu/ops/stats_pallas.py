"""Pallas TPU kernel: 3-D spatial-softmax statistics in one pass.

The policy computes soft-argmax keypoints over three ~100^3 x 64ch volumes
(reference SpatialSoftmax3D, network_utils.py:977-1015). The XLA lowering
materializes an fp32 copy of each volume for the exp (plus a layout copy)
— ~15-20% of the policy forward. This kernel streams the bf16 volume
through VMEM once, computing exp((x - max_c)/T) in registers and reducing
against the [1, x, y, z] position basis on the fly.

Matches ops.spatial_softmax.spatial_softmax_3d exactly in semantics,
including the reference's meshgrid('xy') quirk: for a feature at (z, y, x)
the three expected-coordinate weights are linspace[y], linspace[z],
linspace[x] respectively (exact for cubic volumes, which is the only case
the policy uses; non-cubic falls back to the XLA path).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stats_kernel(x_ref, mx_ref, out_ref, *, temperature: float, v: int,
                  zt: int):
    p = pl.program_id(0)
    lin = (jax.lax.broadcasted_iota(jnp.float32, (v, 1), 0)
           * (2.0 / (v - 1)) - 1.0)                      # linspace(-1,1,V)
    mx = mx_ref[0]                                       # (C,) f32

    def body(dz, acc):
        plane = x_ref[dz].astype(jnp.float32)            # (V, V, C)
        e = jnp.exp((plane - mx[None, None]) / temperature)
        s_x = jnp.sum(e, axis=1)                         # (V=y, C)
        s0 = jnp.sum(s_x, axis=0)                        # (C,)
        sx = jnp.sum(s_x * lin, axis=0)                  # E-num over l[y]
        sz = jnp.sum(jnp.sum(e * lin[None], axis=1), axis=0)  # l[x]
        lz = (jnp.float32(p * zt + dz) * (2.0 / (v - 1)) - 1.0)
        sy = s0 * lz                                     # l[z]
        return acc + jnp.stack([s0, sx, sy, sz], axis=-1)

    out_ref[0] = jax.lax.fori_loop(
        0, zt, body, jnp.zeros(out_ref.shape[1:], jnp.float32))


def spatial_stats_3d(feature: jnp.ndarray, temperature: float = 0.01,
                     zt: int = 4) -> jnp.ndarray:
    """feature: (B, V, V, V, C) bf16/f32 -> (B, C, 4) fp32 sums
    [denominator, x, y, z numerators] of the spatial softmax expectation."""
    b, d, h, w, c = feature.shape
    assert d == h == w and d % zt == 0, "cubic volume, zt | V"
    v = d
    mx = jnp.max(feature, axis=(1, 2, 3)).astype(jnp.float32)  # (B, C)

    grid = v // zt

    def one(x_b, mx_b):
        partials = pl.pallas_call(
            lambda x_ref, mx_ref, out_ref: _stats_kernel(
                x_ref, mx_ref, out_ref, temperature=temperature, v=v, zt=zt),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((zt, v, v, c), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, c, 4), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid, c, 4), jnp.float32),
        )(x_b, mx_b[None])
        return partials.sum(axis=0)

    return jax.vmap(one)(feature, mx)


def spatial_softmax_3d_pallas(feature: jnp.ndarray,
                              temperature: float = 0.01) -> jnp.ndarray:
    """Drop-in for ops.spatial_softmax.spatial_softmax_3d (cubic volumes)."""
    b, d, h, w, c = feature.shape
    sums = spatial_stats_3d(feature, temperature)
    kp = sums[..., 1:] / sums[..., :1]
    return kp.reshape(b, c * 3)
