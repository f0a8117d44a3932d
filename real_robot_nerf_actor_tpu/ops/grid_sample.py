"""Trilinear voxel-grid sampling (torch grid_sample align_corners=True
semantics) on channel-last grids.

Reference behavior: /root/reference/models_embed.py:259-293
(`sample_in_canonical_voxel`): canonical xyz in [0,1] -> [-1,1] -> trilinear
sample of the PerceiverIO voxel feature grid with align_corners=True and
zero padding.

TPU design: a single vectorized gather of the 8 corner cells + fused lerp.
The gather indexes a flattened (V^3, C) array so XLA emits one gather per
corner; channels stay in the minor-most (lane) dimension.

Torch convention note: for 5-D inputs grid_sample's last-dim coordinate
order is (x, y, z) where x indexes the *innermost* (W) axis. The reference
passes xyz coordinates against a voxel grid laid out as (X, Y, Z) spatial
axes, so its `x` indexes the Z axis of the grid. We mirror that exactly:
`coords[..., 0]` indexes grid axis 2 (last spatial), `coords[..., 2]` axis 0.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# lerp formulation for the fused path: "nested" (classic lerp tree, same
# associativity as the 8-gather path) or "flat" (sum of corner*weight
# products). Both are exact trilinear interpolation; see
# test_fused_corner_gather_matches_multi.
FUSED_LERP_MODE = "nested"
# barrier after the fused lerp: stops XLA from fusing the lerp into its
# N-minor consumers, which otherwise drags a TRANSPOSED copy of the whole
# (N, 8C) gather output in front of it (experiment flag; measured neutral)
FUSED_LERP_BARRIER = False
# "pallas": ops.lerp_pallas.corner_lerp — pins canonical layouts at the
# lerp boundaries so the N-major->N-minor transition happens on the (N, C)
# output, not a transposed copy of the whole (N, 8C) gather output
FUSED_LERP_BACKEND = "xla"  # "xla" | "pallas"


def grid_sample_3d(grid: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sample with align_corners=True, zeros padding.

    grid:   (B, D, H, W, C) channel-last voxel grid.
    coords: (B, N, 3) in [-1, 1], ordered (x, y, z) with x indexing W (the
            last spatial axis), matching torch.nn.functional.grid_sample.
    Returns (B, N, C).
    """
    b, d, h, w, c = grid.shape
    # unnormalize: align_corners=True maps -1 -> 0 and 1 -> size-1
    x = (coords[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (coords[..., 1] + 1.0) * 0.5 * (h - 1)
    z = (coords[..., 2] + 1.0) * 0.5 * (d - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    tx = x - x0
    ty = y - y0
    tz = z - z0

    def corner(zi, yi, xi):
        """Gather grid[b, zi, yi, xi, :] with zero padding out of range."""
        inb = ((zi >= 0) & (zi < d) & (yi >= 0) & (yi < h)
               & (xi >= 0) & (xi < w))
        zi_c = jnp.clip(zi, 0, d - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat = (zi_c * h + yi_c) * w + xi_c  # (B, N)
        # indices are pre-clipped: promise_in_bounds skips the select_n
        # (and its N-minor layout + transposed whole-output copies) that
        # take_along_axis's default OOB handling would add
        vals = jnp.take_along_axis(
            grid.reshape(b, d * h * w, c), flat[..., None], axis=1,
            mode="promise_in_bounds")
        return vals * inb[..., None].astype(grid.dtype)

    z0i, y0i, x0i = z0.astype(jnp.int32), y0.astype(jnp.int32), x0.astype(jnp.int32)
    c000 = corner(z0i, y0i, x0i)
    c001 = corner(z0i, y0i, x0i + 1)
    c010 = corner(z0i, y0i + 1, x0i)
    c011 = corner(z0i, y0i + 1, x0i + 1)
    c100 = corner(z0i + 1, y0i, x0i)
    c101 = corner(z0i + 1, y0i, x0i + 1)
    c110 = corner(z0i + 1, y0i + 1, x0i)
    c111 = corner(z0i + 1, y0i + 1, x0i + 1)

    tx = tx[..., None].astype(grid.dtype)
    ty = ty[..., None].astype(grid.dtype)
    tz = tz[..., None].astype(grid.dtype)
    c00 = c000 * (1 - tx) + c001 * tx
    c01 = c010 * (1 - tx) + c011 * tx
    c10 = c100 * (1 - tx) + c101 * tx
    c11 = c110 * (1 - tx) + c111 * tx
    c0 = c00 * (1 - ty) + c01 * ty
    c1 = c10 * (1 - ty) + c11 * ty
    return c0 * (1 - tz) + c1 * tz


def expand_corners(grid: jnp.ndarray) -> jnp.ndarray:
    """Pre-expand a voxel grid for single-gather trilinear sampling.

    TPU gathers cost ~constant time per ROW regardless of row size (up to
    ~1-2 KB), so 8 corner gathers of C channels are ~8x slower than ONE
    gather of 8C channels. This packs each voxel's 2x2x2 neighborhood
    (zero-padded at the +1 border) into its row:

    grid (B, D, H, W, C) -> (B, D+1, H+1, W+1, 8C): row (i,j,k) holds the
    2x2x2 neighborhood of BASE voxel (i-1, j-1, k-1) (one row of zero
    padding at the low end so base index -1 — a point just below the grid
    whose +1 corner is still inside — resolves correctly). Corner order
    (dz, dy, dx) with dx minor: block c = dz*4 + dy*2 + dx.

    Memory: ~8x the grid (e.g. 100^3 x 64ch bf16 -> ~1 GB) — an HBM-for-
    latency trade; build once per render, reuse across coarse/fine passes.
    """
    b, d, h, w, c = grid.shape
    padded = jnp.pad(grid, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    blocks = [
        padded[:, dz:dz + d + 1, dy:dy + h + 1, dx:dx + w + 1]
        for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)
    ]
    return jnp.concatenate(blocks, axis=-1)


def grid_sample_3d_fused(expanded: jnp.ndarray, coords: jnp.ndarray,
                         out_channels: int,
                         backend: "str | None" = None) -> jnp.ndarray:
    """Trilinear sample from a corner-expanded grid with ONE gather.

    expanded: (B, D+1, H+1, W+1, 8C) from expand_corners over a (D, H, W)
    grid; coords: (B, N, 3) in [-1, 1] (torch convention, x indexes W).
    out_channels = C. Numerically identical to grid_sample_3d on the
    original grid.
    """
    b, dp, hp, wp, c8 = expanded.shape
    d, h, w = dp - 1, hp - 1, wp - 1
    c = out_channels
    x = (coords[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (coords[..., 1] + 1.0) * 0.5 * (h - 1)
    z = (coords[..., 2] + 1.0) * 0.5 * (d - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    tx = (x - x0)[..., None].astype(expanded.dtype)
    ty = (y - y0)[..., None].astype(expanded.dtype)
    tz = (z - z0)[..., None].astype(expanded.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)

    # row (i+1) holds base i; base clipped to [-1, D-1] — masks (computed
    # from UNCLIPPED indices) zero out anything farther out of range
    x0c = jnp.clip(x0i, -1, w - 1) + 1
    y0c = jnp.clip(y0i, -1, h - 1) + 1
    z0c = jnp.clip(z0i, -1, d - 1) + 1
    flat = (z0c * hp + y0c) * wp + x0c
    # indices are pre-clipped -> promise_in_bounds: the default OOB select_n
    # forced an N-minor layout on the lerp stage plus TRANSPOSED copies of
    # the whole (N, 8C) gather output (~9 ms/render at the flagship config)
    rows = jnp.take_along_axis(
        expanded.reshape(b, dp * hp * wp, c8), flat[..., None], axis=1,
        mode="promise_in_bounds")
    if FUSED_LERP_BARRIER:
        rows = jax.lax.optimization_barrier(rows)

    def mask(zi, yi, xi):
        inb = ((zi >= 0) & (zi < d) & (yi >= 0) & (yi < h)
               & (xi >= 0) & (xi < w))
        return inb[..., None].astype(expanded.dtype)

    # corner block k = dz*4 + dy*2 + dx at channels [k*c, (k+1)*c) — sliced
    # on the flat lane axis (no (N, 8, C) reshape: that reshape made XLA
    # pick an N-minor layout for the select, forcing a transposed copy of
    # the whole gather output)
    corner_masks = [mask(z0i + dz, y0i + dy, x0i + dx)
                    for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)]

    if (backend or FUSED_LERP_BACKEND) == "pallas":
        from real_robot_nerf_actor_tpu.ops.lerp_pallas import corner_lerp
        # ALL weight math in flat (B*N,) fp32 shapes: any trailing small
        # axis ((N,1) or (N,8)) tile-pads to 128 lanes and every op on it
        # runs ~16-128x oversized. The kernel takes the weights TRANSPOSED
        # as (8, B*N) for the same reason.
        n = rows.shape[1]
        txf = (x - x0).astype(jnp.float32).reshape(-1)
        tyf = (y - y0).astype(jnp.float32).reshape(-1)
        tzf = (z - z0).astype(jnp.float32).reshape(-1)
        wxs = (1.0 - txf, txf)
        wys = (1.0 - tyf, tyf)
        wzs = (1.0 - tzf, tzf)

        def maskf(zi, yi, xi):
            inb = ((zi >= 0) & (zi < d) & (yi >= 0) & (yi < h)
                   & (xi >= 0) & (xi < w))
            return inb.reshape(-1).astype(jnp.float32)

        w8 = jnp.stack(
            [wzs[k >> 2] * wys[(k >> 1) & 1] * wxs[k & 1]
             * maskf(z0i + (k >> 2), y0i + ((k >> 1) & 1), x0i + (k & 1))
             for k in range(8)], axis=0)             # (8, B*N)
        out = corner_lerp(rows.reshape(b * n, c8), w8)
        return out.reshape(b, n, c)

    if FUSED_LERP_MODE == "flat":
        # weight-product form: out = sum_k rows_k * w_k, where w_k is the
        # product of the per-axis weights (same math, flat reduction)
        wx = (1 - tx, tx)
        wy = (1 - ty, ty)
        wz = (1 - tz, tz)
        out = None
        for k in range(8):
            dz, dy, dx = k >> 2, (k >> 1) & 1, k & 1
            wk = wz[dz] * wy[dy] * wx[dx] * corner_masks[k]
            term = rows[..., k * c:(k + 1) * c] * wk
            out = term if out is None else out + term
        return out

    cs = [rows[..., k * c:(k + 1) * c] * corner_masks[k] for k in range(8)]
    c00 = cs[0] * (1 - tx) + cs[1] * tx
    c01 = cs[2] * (1 - tx) + cs[3] * tx
    c10 = cs[4] * (1 - tx) + cs[5] * tx
    c11 = cs[6] * (1 - tx) + cs[7] * tx
    c0 = c00 * (1 - ty) + c01 * ty
    c1 = c10 * (1 - ty) + c11 * ty
    out = c0 * (1 - tz) + c1 * tz
    if FUSED_LERP_BARRIER:
        out = jax.lax.optimization_barrier(out)
    return out


def _corner_weights_and_bases(coords, d, h, w, dtype=jnp.float32):
    """Shared helper: per-corner product weights (incl. OOB masks) and the
    clipped base index into the corner-EXPANDED (D+1,H+1,W+1) space.

    coords: (B, N, 3) in [-1, 1] (torch convention). Returns
    (w8 (B, N, 8) dtype, flat (B, N) int32 into (D+1)(H+1)(W+1))."""
    x = (coords[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (coords[..., 1] + 1.0) * 0.5 * (h - 1)
    z = (coords[..., 2] + 1.0) * 0.5 * (d - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    tx = (x - x0).astype(dtype)
    ty = (y - y0).astype(dtype)
    tz = (z - z0).astype(dtype)
    x0i, y0i, z0i = (x0.astype(jnp.int32), y0.astype(jnp.int32),
                     z0.astype(jnp.int32))
    wxs = (1.0 - tx, tx)
    wys = (1.0 - ty, ty)
    wzs = (1.0 - tz, tz)

    def maskf(zi, yi, xi):
        return (((zi >= 0) & (zi < d) & (yi >= 0) & (yi < h)
                 & (xi >= 0) & (xi < w))).astype(dtype)

    w8 = jnp.stack(
        [wzs[k >> 2] * wys[(k >> 1) & 1] * wxs[k & 1]
         * maskf(z0i + (k >> 2), y0i + ((k >> 1) & 1), x0i + (k & 1))
         for k in range(8)], axis=-1)
    hp, wp = h + 1, w + 1
    x0c = jnp.clip(x0i, -1, w - 1) + 1
    y0c = jnp.clip(y0i, -1, h - 1) + 1
    z0c = jnp.clip(z0i, -1, d - 1) + 1
    flat = (z0c * hp + y0c) * wp + x0c
    return w8, flat


def _make_fastbwd(gshape, gdtype_str):
    """Build the shape-specialized custom-VJP sampler (statics closed over:
    custom_vjp residuals may only hold JAX types)."""
    import functools as _ft  # noqa: F401  (cache key is the args)
    b, d, h, w, c = gshape
    gdtype = jnp.dtype(gdtype_str)

    @jax.custom_vjp
    def sample(grid, coords):
        return grid_sample_3d(grid, coords)

    def fwd(grid, coords):
        return grid_sample_3d(grid, coords), coords

    def bwd(coords, g):
        n = coords.shape[1]
        w8, flat = _corner_weights_and_bases(coords, d, h, w)
        # per-sample gradient rows in corner-expanded layout: block k =
        # w_k * g  -> (B, N, 8C)
        rows = (w8[..., None] * g[..., None, :].astype(jnp.float32)
                ).reshape(b, n, 8 * c)
        cells = (d + 1) * (h + 1) * (w + 1)

        def scatter_one(flat_b, rows_b):
            return jax.ops.segment_sum(rows_b, flat_b, num_segments=cells)

        d_exp = jax.vmap(scatter_one)(flat, rows).reshape(
            b, d + 1, h + 1, w + 1, 8, c)
        # transpose of expand_corners: expanded row i of block (dz,dy,dx)
        # holds grid[i-1+dz, ...]; fold with shifted slices
        acc = None
        for k in range(8):
            dz, dy, dx = k >> 2, (k >> 1) & 1, k & 1
            part = d_exp[:, 1 - dz:1 - dz + d, 1 - dy:1 - dy + h,
                         1 - dx:1 - dx + w, k]
            acc = part if acc is None else acc + part
        return acc.astype(gdtype), jnp.zeros_like(coords)

    sample.defvjp(fwd, bwd)
    return sample


_FASTBWD_CACHE: dict = {}


def grid_sample_3d_fastbwd(grid: jnp.ndarray, coords: jnp.ndarray):
    """grid_sample_3d with a ONE-scatter backward for the grid gradient.

    Native autodiff of the 8-corner gather path emits EIGHT scatter-adds
    into the (V^3, C) grid gradient; TPU scatters cost ~50 ns/row
    regardless of width, so at training's ~57k sample rows that is ~23 ms
    of serial scatter. This VJP scatters the per-sample (8C)-wide gradient
    rows ONCE into corner-expanded index space and folds the 8 channel
    blocks back with shifted slices (transpose of expand_corners) — one
    row pass + two passes over the 8x buffer.

    The coords gradient is NOT computed (returns zeros): every caller
    stop-gradients the sample coordinates (models_embed.py detaches canon
    coords the same way). Use grid_sample_3d if you need d(coords).

    MEASURED NET NEGATIVE at the flagship train step (271 vs 244 ms/step
    bf16): the ~50 ns/row scatter cost only holds for THIN rows — a
    512-wide scatter row pays its full read-modify-write, so one wide
    scatter loses to eight thin ones. Kept opt-in as the record; the
    default path uses native autodiff.
    """
    key = (tuple(grid.shape), str(grid.dtype))
    if key not in _FASTBWD_CACHE:
        _FASTBWD_CACHE[key] = _make_fastbwd(*key)
    return _FASTBWD_CACHE[key](grid, coords)


def sample_in_canonical_voxel(voxel_feat: jnp.ndarray, canon_xyz: jnp.ndarray,
                              expanded: bool = False,
                              out_channels: int = 0,
                              backend: "str | None" = None) -> jnp.ndarray:
    """Sample a channel-last voxel feature grid at canonical [0,1]^3 points.

    voxel_feat: (B, V, V, V, C) — or the corner-expanded (B, V, V, V, 8C)
    grid when expanded=True (then out_channels must be C).
    canon_xyz: (B, N, 3) in [0, 1]. Returns (B, N, C). Mirrors
    models_embed.py:259-293 (coords scaled to [-1,1], torch xyz/W-axis
    convention preserved). backend overrides FUSED_LERP_MODE's
    lerp backend for the expanded path ("pallas": ops/lerp_pallas —
    required next to other Pallas consumers, where it wins; see
    lerp_pallas docstring for when it loses).
    """
    coords = canon_xyz * 2.0 - 1.0
    if expanded:
        return grid_sample_3d_fused(voxel_feat, coords, out_channels,
                                    backend=backend)
    return grid_sample_3d(voxel_feat, coords)
