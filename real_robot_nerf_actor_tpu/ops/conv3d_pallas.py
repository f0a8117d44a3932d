"""Pallas TPU 3-D convolution (k3, stride 1, NDHWC, zero padding).

XLA's general 3-D conv at 100^3 runs at ~25-40% MXU and surrounds itself
with layout copies (see BENCH_NOTES.md). This kernel tiles the volume into
(tz, ty, W) slabs, DMAs each slab + 1-voxel halo from HBM into VMEM
(manual async copy — halos overlap, which BlockSpec partitions can't
express), and computes the conv as 27 tap matmuls accumulating in fp32 (Mosaic
cannot concatenate offset slices, so taps are not packed into K).

Scope: kernel_size 3, stride 1, zero padding; used for the PerceiverIO
`final` conv (128->64 @ 100^3). General shapes fall back to XLA.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, o_ref, scratch, sem, *, tz: int, ty: int,
            w_out: int, cin: int, cout: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    copy = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * tz, tz + 2), pl.ds(j * ty, ty + 2), :, :],
        scratch, sem)  # full (tile-aligned) W and C dims
    copy.start()
    copy.wait()

    acc = jnp.zeros((tz * ty * w_out, cout), jnp.float32)
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                xin = scratch[dz:dz + tz, dy:dy + ty, dx:dx + w_out, :]
                xin = xin.reshape(tz * ty * w_out, cin)
                acc = acc + jax.lax.dot(
                    xin, w_ref[dz, dy, dx],
                    preferred_element_type=jnp.float32)
    o_ref[...] = acc.reshape(tz, ty, w_out, cout).astype(o_ref.dtype)


def conv3d_k3_pallas(x: jnp.ndarray, kernel: jnp.ndarray,
                     bias: Optional[jnp.ndarray] = None,
                     tz: int = 4, ty: int = 10,
                     out_dtype=None,
                     interpret: Optional[bool] = None) -> jnp.ndarray:
    """x: (B, D, H, W, Cin); kernel: (3, 3, 3, Cin, Cout) (flax nn.Conv
    layout). Returns (B, D, H, W, Cout). Zero padding, stride 1."""
    b, d, h, w, cin = x.shape
    cout = kernel.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dz_pad = (-d) % tz
    dy_pad = (-h) % ty
    # the W axis is the sublane-tiled dim of the HBM layout: DMA slices
    # must be tile-aligned there, so pad W+2 up to the dtype's tile
    sublane = {2: 16, 4: 8}.get(jnp.dtype(x.dtype).itemsize, 8)
    wp = -(-(w + 2) // sublane) * sublane
    xp = jnp.pad(x, ((0, 0), (1, 1 + dz_pad), (1, 1 + dy_pad),
                     (1, wp - w - 1), (0, 0)))
    dp = d + dz_pad
    hp = h + dy_pad
    wk = kernel.astype(x.dtype)

    grid = (dp // tz, hp // ty)

    def one_batch(xb):
        return pl.pallas_call(
            functools.partial(_kernel, tz=tz, ty=ty, w_out=w, cin=cin,
                              cout=cout),
            out_shape=jax.ShapeDtypeStruct((dp, hp, w, cout),
                                           out_dtype or x.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),      # full padded volume
                pl.BlockSpec((3, 3, 3, cin, cout),
                             lambda i, j: (0, 0, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((tz, ty, w, cout),
                                   lambda i, j: (i, j, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((tz + 2, ty + 2, wp, cin), x.dtype),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(xb, wk)

    out = jax.vmap(one_batch)(xp)
    out = out[:, :d, :h]
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _xla_conv3d(x, kernel, bias):
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(1, 1, 1),
        padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


@jax.custom_vjp
def conv3d_k3(x: jnp.ndarray, kernel: jnp.ndarray,
              bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """k3/s1/zero-pad 3-D conv: Pallas forward on TPU (3.6x the in-graph
    XLA conv at 100^3), XLA fallback elsewhere; XLA convs for the backward
    (a custom_vjp — pallas_call has no autodiff)."""
    if jax.default_backend() == "tpu":
        return conv3d_k3_pallas(x, kernel, bias)
    return _xla_conv3d(x, kernel, bias)


def _conv3d_k3_fwd(x, kernel, bias):
    return conv3d_k3(x, kernel, bias), (x, kernel, bias is not None)


def _conv3d_k3_bwd(res, g):
    x, kernel, has_bias = res
    bias0 = jnp.zeros((kernel.shape[-1],), x.dtype)
    _, vjp = jax.vjp(_xla_conv3d, x, kernel, bias0)
    dx, dk, db = vjp(g)
    return dx, dk, (db if has_bias else None)


conv3d_k3.defvjp(_conv3d_k3_fwd, _conv3d_k3_bwd)
