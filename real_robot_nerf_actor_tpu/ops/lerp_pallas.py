"""Pallas TPU kernel: trilinear corner lerp over corner-expanded gather rows.

Motivation: XLA lays out the renderer's lerp stage N-minor (the MXU wants
the downstream MLP's LHS M-minor) and pays for the transition with a
TRANSPOSED COPY of the whole (N, 8C) gather output (~4.7 ms/render at the
flagship config). This kernel pins the lerp to canonical layouts at both
pallas_call boundaries so the transition lands on the 8x smaller output.

MEASURED RESULT (v5e, flagship render): NET NEGATIVE — the kernel itself
hits the HBM floor (~3.6 ms for coarse+fine) and the transposed copies do
disappear, but materializing the weight operands at the kernel boundary
costs more than the copies did (117-120 vs 103 ms/render even after
moving all weight math to fully-packed (8, N) transposed shapes; XLA's
fused-elementwise lerp never materializes the weights at all). Kept as an
opt-in (ops.grid_sample.FUSED_LERP_BACKEND="pallas") and as the record of
the experiment; see BENCH_NOTES.md round 2.

Math (identical to ops.grid_sample's "flat" lerp mode, fp32 accumulation):
    out[n, c] = sum_k rows[n, k*C + c] * w_T[k, n]      k in [0, 8)
where w_T packs the per-axis lerp weights and the out-of-bounds corner
masks, TRANSPOSED so its lanes pack fully. Backward runs the
straightforward XLA formulation via custom_vjp (pallas_call has no
autodiff).

Reference behavior covered: models_embed.py:259-293 trilinear sampling
(see ops/grid_sample.py for the semantics contract and exactness tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lerp_kernel(rows_ref, w_ref, out_ref, *, c: int):
    # w arrives TRANSPOSED as (8, bn): an (N, 8) array would tile-pad its
    # 8 lanes to 128 (16x memory/bandwidth inflation) at every XLA op that
    # touches it; (8, N) lanes are fully packed. One small per-block
    # transpose puts the weights back row-major.
    wt = w_ref[...].T                                    # (bn, 8) f32
    acc = rows_ref[:, 0 * c:1 * c].astype(jnp.float32) * wt[:, 0:1]
    for k in range(1, 8):
        acc += rows_ref[:, k * c:(k + 1) * c].astype(jnp.float32) \
            * wt[:, k:k + 1]
    out_ref[...] = acc.astype(out_ref.dtype)


def _lerp_xla(rows: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    m, c8 = rows.shape
    c = c8 // 8
    r = rows.reshape(m, 8, c).astype(jnp.float32)
    return jnp.einsum("mkc,mk->mc", r, w).astype(rows.dtype)


@jax.custom_vjp
def corner_lerp(rows: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """rows: (M, 8C); w: (8, M) fp32 weight-mask products, TRANSPOSED (so
    its lanes pack fully — see _lerp_kernel). Returns (M, C) in rows.dtype
    (fp32 accumulation). Pallas on TPU, interpret mode elsewhere (tests)."""
    interpret = jax.default_backend() != "tpu"
    m, c8 = rows.shape
    c = c8 // 8
    bn = 1024
    pad = (-m) % bn
    if pad:
        rows = jnp.pad(rows, ((0, pad), (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, pad)))
    mp = m + pad
    out = pl.pallas_call(
        functools.partial(_lerp_kernel, c=c),
        grid=(mp // bn,),
        in_specs=[
            pl.BlockSpec((bn, c8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bn), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, c), rows.dtype),
        interpret=interpret,
    )(rows, w.astype(jnp.float32))
    return out[:m]


def _fwd(rows, w):
    return corner_lerp(rows, w), (rows, w)


def _bwd(res, g):
    rows, w = res                                        # w: (8, M)
    m, c8 = rows.shape
    c = c8 // 8
    g32 = g.astype(jnp.float32)
    r = rows.reshape(m, 8, c).astype(jnp.float32)
    d_rows = (w.T[:, :, None] * g32[:, None, :]).reshape(m, c8).astype(
        rows.dtype)
    d_w = jnp.einsum("mkc,mc->km", r, g32).astype(w.dtype)
    return d_rows, d_w


corner_lerp.defvjp(_fwd, _bwd)
