"""Pallas TPU kernel: fully-fused int8 (W8A8) ResnetFC forward for serving.

The parity render's MLP runs at ~97% of the v5e bf16 MXU roofline, so the
only way past it on one chip is the int8 MXU path (394 TOPS peak; measured
in-kernel chain rate 218 T(ops)/s vs 163 TFLOP/s bf16 — per-layer dynamic
quantization costs ~1/3 of the ideal 2x). Doing W8A8 at the XLA level
instead breaks the residual-chain fusion (measured 144 vs 104 ms/render).

Design points:
  - ALL weights stay resident in VMEM (~3 MB: ten 512x512 int8 block
    matrices + bf16 first-layer/injection/head rows); activations stream
    in (N, 128)-row blocks, so the whole 5-block ResnetFC costs one HBM
    read of the input row and one write of the two outputs.
  - The input row packs [latent | canon | dirs | wrapped pos-enc phases]:
    the sinusoidal positional code is computed IN-KERNEL as sin/cos over
    the whole 128-lane row with zero-padded selector weights (no lane
    slicing), against phases wrapped to [-pi, pi) in fp32 on the XLA side
    (a raw bf16 phase at the top frequency would lose ~0.2 rad). This
    keeps the XLA-side assembly to ONE fused materialization — narrow
    (N, k<128) intermediates tile-pad to 128 lanes and cost full-width
    passes (see BENCH_NOTES round 2).
  - Per-row symmetric int8 activations, per-column int8 weights, int32
    accumulation, bf16 residual stream and outputs.

Scope: the renderer's serving path (compact heads: rgb/sigma + relu'd
last hidden for late embed projection; shared coarse/fine MLP; latent
injected for blocks < combine_layer). Forward-only — training uses the
XLA path. Opt-in via NerfFieldConfig.mlp_backend="pallas_int8".

Reference behavior covered: resnetfc.py:12-209 forward (see
models/resnetfc.py for the architecture contract).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# input-row layout (lanes of the packed (N, 128) bf16 kernel input)
_LAT = 0          # latent: lanes [0, d_latent)
# then canon (3), dirs (3), then num_freqs*3 wrapped phases


def input_row_layout(d_latent: int, num_freqs: int):
    canon0 = d_latent
    dirs0 = canon0 + 3
    theta0 = dirs0 + 3
    width = theta0 + num_freqs * 3
    assert width <= 128, "packed input row must fit 128 lanes"
    return canon0, dirs0, theta0, width


def pack_mlp_input(latent: jnp.ndarray, canon: jnp.ndarray,
                   dirs: jnp.ndarray, num_freqs: int,
                   freq_factor: float) -> jnp.ndarray:
    """[latent | canon | dirs | wrapped phases] -> (N, 128) bf16.

    Phases theta = canon * freq_factor * 2^f are wrapped to [-pi, pi) in
    fp32 BEFORE the bf16 cast (at f=5 the raw phase reaches ~50 rad where
    bf16 resolution is ~0.2 rad; wrapped it is ~0.01)."""
    n = latent.shape[0]
    freqs = freq_factor * (2.0 ** np.arange(num_freqs, dtype=np.float32))
    theta = canon.astype(jnp.float32)[:, None, :] * freqs[None, :, None]
    two_pi = 2.0 * np.pi
    theta = theta - two_pi * jnp.round(theta / two_pi)
    theta = theta.reshape(n, num_freqs * 3)
    row = jnp.concatenate(
        [latent.astype(jnp.bfloat16), canon.astype(jnp.bfloat16),
         dirs.astype(jnp.bfloat16), theta.astype(jnp.bfloat16)], axis=-1)
    return jnp.pad(row, ((0, 0), (0, 128 - row.shape[-1])))


def pack_resnetfc_params(mlp_params: dict, d_latent: int = 64,
                         num_freqs: int = 6, d_hidden: int = 512,
                         n_blocks: int = 5, combine_layer: int = 3,
                         head_dims: int = 4, quantize: bool = True):
    """Extract + quantize a ResnetFC param subtree for the fused kernel.

    mlp_params: params["params"]["mlp_coarse"] — flax tree with Dense_0
    (lin_in over [posenc(3+6f*... ) | dirs]), lin_z_i, ResnetBlockFC_i/
    {Dense_0, Dense_1}, lin_out_*. Weight rows are rearranged onto the
    packed input-row layout; sin/cos selector matrices w_s/w_c hold the
    per-frequency code rows at the phase lanes (everything else zero).
    """
    canon0, dirs0, theta0, _ = input_row_layout(d_latent, num_freqs)
    w_in = mlp_params["Dense_0"]["kernel"].astype(jnp.bfloat16)
    d_code = 3 + num_freqs * 6

    def zeros128():
        return jnp.zeros((128, d_hidden), jnp.bfloat16)

    # raw rows: canon (code rows 0..2) + dirs (code rows d_code..d_code+2)
    w_a = zeros128()
    w_a = w_a.at[canon0:canon0 + 3].set(w_in[0:3])
    w_a = w_a.at[dirs0:dirs0 + 3].set(w_in[d_code:d_code + 3])
    w_s = zeros128()
    w_c = zeros128()
    for f in range(num_freqs):
        src_sin = 3 + f * 6
        src_cos = 3 + f * 6 + 3
        dst = theta0 + f * 3
        w_s = w_s.at[dst:dst + 3].set(w_in[src_sin:src_sin + 3])
        w_c = w_c.at[dst:dst + 3].set(w_in[src_cos:src_cos + 3])
    b_in = mlp_params["Dense_0"]["bias"].astype(jnp.float32)

    wz, bz = [], []
    for i in range(min(combine_layer, n_blocks)):
        k = jnp.zeros((128, d_hidden), jnp.bfloat16).at[:d_latent].set(
            mlp_params[f"lin_z_{i}"]["kernel"].astype(jnp.bfloat16))
        wz.append(k)
        bz.append(mlp_params[f"lin_z_{i}"]["bias"].astype(jnp.float32))
    wq, ws, bq = [], [], []
    for i in range(n_blocks):
        blk = mlp_params[f"ResnetBlockFC_{i}"]
        for d in ("Dense_0", "Dense_1"):
            k = blk[d]["kernel"].astype(jnp.float32)     # (512, 512)
            if quantize:
                amax = jnp.max(jnp.abs(k), axis=0, keepdims=True)
                scale = amax / 127.0 + 1e-12
                wq.append(jnp.clip(jnp.round(k / scale), -127, 127)
                          .astype(jnp.int8))
                ws.append(scale[0])
            else:
                wq.append(k.astype(jnp.bfloat16))
                ws.append(jnp.ones((k.shape[1],), jnp.float32))
            bq.append(blk[d]["bias"].astype(jnp.float32))
    k_out = mlp_params["lin_out_kernel"][:, :head_dims]
    w_out = jnp.zeros((d_hidden, 128), jnp.bfloat16).at[:, :head_dims].set(
        k_out.astype(jnp.bfloat16))
    b_out = jnp.zeros((128,), jnp.float32).at[:head_dims].set(
        mlp_params["lin_out_bias"][:head_dims].astype(jnp.float32))
    return {
        "w_a": w_a, "w_s": w_s, "w_c": w_c, "b_in": b_in,
        "wz": jnp.stack(wz), "bz": jnp.stack(bz),
        "wq": jnp.stack(wq), "ws": jnp.stack(ws), "bq": jnp.stack(bq),
        "w_out": w_out, "b_out": b_out,
    }


def _kernel(zi_ref, w_a_ref, w_s_ref, w_c_ref, b_in_ref, wz_ref, bz_ref,
            wq_ref, ws_ref, bq_ref, w_out_ref, b_out_ref, hidden_ref,
            out_ref, *, n_blocks: int, combine_layer: int,
            quantized: bool, act_scales=None):
    zi = zi_ref[...]                                       # (BN, 128) bf16

    def int8_dense(t, idx):
        if not quantized:  # bf16 block weights, f32 accumulation
            return (jax.lax.dot(t, wq_ref[idx],
                                preferred_element_type=jnp.float32)
                    + bq_ref[idx][None])
        t32 = t.astype(jnp.float32)
        if act_scales is None:
            # dynamic per-row symmetric quant: exactness-friendly but the
            # row amax reduce + divide cost ~1/3 of the int8 MXU win
            xs = jnp.max(jnp.abs(t32), axis=1, keepdims=True) / 127.0 + 1e-8
            inv = 1.0 / xs
        else:
            # STATIC per-layer scale (calibrated offline, a compile-time
            # scalar): quant becomes one multiply+round; rows beyond the
            # calibration range saturate at +-127 (documented semantics,
            # quality-gated at serving like every other int8 delta)
            xs = float(act_scales[idx])
            inv = 1.0 / xs
        tq = jnp.clip(jnp.round(t32 * inv), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot(tq, wq_ref[idx],
                          preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * xs * ws_ref[idx][None]
                + bq_ref[idx][None])

    # first layer: raw rows + in-register positional code (sin/cos over the
    # whole row; selector weights are zero outside the phase lanes)
    zi32 = zi.astype(jnp.float32)   # Mosaic sin/cos are f32-only
    h = (jax.lax.dot(zi, w_a_ref[...], preferred_element_type=jnp.float32)
         + jax.lax.dot(jnp.sin(zi32).astype(jnp.bfloat16), w_s_ref[...],
                       preferred_element_type=jnp.float32)
         + jax.lax.dot(jnp.cos(zi32).astype(jnp.bfloat16), w_c_ref[...],
                       preferred_element_type=jnp.float32)
         + b_in_ref[...][None])                            # (BN, 512) f32
    for blk in range(n_blocks):
        if blk < combine_layer:
            h = h + (jax.lax.dot(zi, wz_ref[blk],
                                 preferred_element_type=jnp.float32)
                     + bz_ref[blk][None])
        t = jnp.maximum(h.astype(jnp.bfloat16), 0)
        a0 = int8_dense(t, 2 * blk)
        u = jnp.maximum(a0.astype(jnp.bfloat16), 0)
        a1 = int8_dense(u, 2 * blk + 1)
        h = h + a1
    hidden = jnp.maximum(h, 0).astype(jnp.bfloat16)
    hidden_ref[...] = hidden
    out_ref[...] = (jax.lax.dot(hidden, w_out_ref[...],
                                preferred_element_type=jnp.float32)
                    + b_out_ref[...][None]).astype(jnp.bfloat16)


def capture_act_amax(zi: jnp.ndarray, packed_bf16: dict, n_blocks: int = 5,
                     combine_layer: int = 3) -> jnp.ndarray:
    """Plain-XLA mirror of _kernel's forward recording the abs-max of each
    int8 matmul's input activations (the relu'd t/u of every block) —
    the offline calibration pass behind static activation scales.
    packed_bf16 = pack_resnetfc_params(..., quantize=False). Returns
    (2*n_blocks,) float32 amax over the calibration rows."""
    zi = zi.astype(jnp.bfloat16)
    zi32 = zi.astype(jnp.float32)
    f32 = functools.partial(jax.lax.dot, preferred_element_type=jnp.float32)
    h = (f32(zi, packed_bf16["w_a"])
         + f32(jnp.sin(zi32).astype(jnp.bfloat16), packed_bf16["w_s"])
         + f32(jnp.cos(zi32).astype(jnp.bfloat16), packed_bf16["w_c"])
         + packed_bf16["b_in"][None])
    amaxes = []
    for blk in range(n_blocks):
        if blk < combine_layer:
            h = h + (f32(zi, packed_bf16["wz"][blk])
                     + packed_bf16["bz"][blk][None])
        t = jnp.maximum(h.astype(jnp.bfloat16), 0)
        amaxes.append(jnp.max(jnp.abs(t.astype(jnp.float32))))
        a0 = f32(t, packed_bf16["wq"][2 * blk]) + packed_bf16["bq"][2 * blk][None]
        u = jnp.maximum(a0.astype(jnp.bfloat16), 0)
        amaxes.append(jnp.max(jnp.abs(u.astype(jnp.float32))))
        a1 = (f32(u, packed_bf16["wq"][2 * blk + 1])
              + packed_bf16["bq"][2 * blk + 1][None])
        h = h + a1
    return jnp.stack(amaxes)


def fused_resnetfc_int8(zi: jnp.ndarray, packed: dict, n_blocks: int = 5,
                        combine_layer: int = 3, bn: int = 512,
                        quantized: bool = True, act_scales=None):
    """zi: (N, 128) bf16 from pack_mlp_input. Returns (out (N, 128) bf16 —
    head dims in the leading columns, hidden (N, 512) bf16 — relu'd last
    hidden for late embed projection).

    act_scales: optional host-side sequence of 2*n_blocks floats (from
    capture_act_amax()/127) — switches activation quant from dynamic
    per-row to static per-layer scales baked into the kernel as
    compile-time constants."""
    n, k = zi.shape
    assert k == 128
    pad = (-n) % bn
    if pad:
        zi = jnp.pad(zi, ((0, pad), (0, 0)))
    npad = n + pad
    d_hidden = packed["w_a"].shape[1]

    def const_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    args = [packed[k2] for k2 in ("w_a", "w_s", "w_c", "b_in", "wz", "bz",
                                  "wq", "ws", "bq", "w_out", "b_out")]
    if act_scales is not None:
        act_scales = tuple(float(s) for s in act_scales)
        assert len(act_scales) == 2 * n_blocks, (len(act_scales), n_blocks)
    hidden, out = pl.pallas_call(
        functools.partial(_kernel, n_blocks=n_blocks,
                          combine_layer=combine_layer, quantized=quantized,
                          act_scales=act_scales),
        grid=(npad // bn,),
        in_specs=[pl.BlockSpec((bn, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [const_spec(a) for a in args],
        out_specs=[
            pl.BlockSpec((bn, d_hidden), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad, d_hidden), jnp.bfloat16),
            jax.ShapeDtypeStruct((npad, 128), jnp.bfloat16),
        ],
        interpret=jax.default_backend() != "tpu",
    )(zi, *args)
    return out[:n], hidden[:n]


# ---------------------------------------------------------------------------
# Gather-fused variant: corner gather + trilinear lerp + the whole ResnetFC
# in ONE kernel. The serving pipeline's remaining non-MXU cost is the
# corner-row gather (23.6 ms at the ~11.4 ns/row descriptor floor) and the
# lerp (5.4 ms HBM floor), both SERIALIZED with the 44.2 ms int8 MLP by XLA's
# dependence chain (BENCH_NOTES round 3). Here the kernel double-buffers
# per-row DMAs from the corner-expanded grid (HBM-resident, memory_space=ANY)
# against the MXU block matmuls, so gather+lerp hide behind compute: the
# descriptor engine processes ~512 row descriptors (5.8 us) while the core
# runs the same block's ~6.8 us of int8 matmuls.
#
# Math is EXACT vs the unfused path (gather -> corner_lerp ->
# fused_resnetfc_int8): zi never materializes, so the zero-padded selector
# matrices collapse to their live rows — the first layer contracts the
# (24, BN) aux block directly (w_a/w_s/w_c rows outside [canon0, width) are
# zero by construction in pack_resnetfc_params, and sin/cos of the dropped
# lanes only ever met those zero rows), and the latent skip contracts the
# lerped (BN, d_latent) block against wz's live rows.
# ---------------------------------------------------------------------------


# SMEM index-operand block width: XLA's 1-D s32 layout tiling (Mosaic
# verifies kernel operand layouts against XLA's choice).
_IDXB = 1024


def slice_gather_weights(packed: dict, d_latent: int = 64,
                         num_freqs: int = 6) -> dict:
    """Trace-time views of pack_resnetfc_params output for the gather-fused
    kernel: aux rows of the first-layer/selector matrices and latent rows of
    the injection matrices. Exact — the dropped rows are zero."""
    canon0, _, _, width = input_row_layout(d_latent, num_freqs)
    return {
        "a_aux": packed["w_a"][canon0:width],      # (24, 512) bf16
        "s_aux": packed["w_s"][canon0:width],
        "c_aux": packed["w_c"][canon0:width],
        "b_in": packed["b_in"],
        "wz_lat": packed["wz"][:, :d_latent],      # (ncomb, 64, 512) bf16
        "bz": packed["bz"],
        "wq": packed["wq"], "ws": packed["ws"], "bq": packed["bq"],
        "w_out": packed["w_out"], "b_out": packed["b_out"],
    }


def _gather_kernel(vox_ref, idx_cur_ref, idx_next_ref, w8_ref, aux_ref,
                   a_aux_ref, s_aux_ref, c_aux_ref, b_in_ref, wz_ref, bz_ref,
                   wq_ref, ws_ref, bq_ref, w_out_ref, b_out_ref,
                   hidden_ref, out_ref, rows_buf, sem, *, n_blocks: int,
                   combine_layer: int, quantized: bool, bn: int,
                   d_latent: int, act_scales=None):
    i = pl.program_id(0)
    n_i = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)
    nslot = jax.lax.rem(i + 1, 2)

    # The corner-expanded grid arrives as (cells, nw, 128) — each logical
    # row pre-split into nw full 128-lane planes — because Mosaic rejects
    # single-sublane dynamic slices of a tiled VMEM buffer ("slice shape
    # along dimension 0 must be aligned to tiling (8)"). Indexing ONLY the
    # untiled leading dims (cell id on the source, [slot, j] on the
    # destination) makes every per-row DMA a full-tile-plane copy, which
    # is the alignment-free pattern.
    #
    # The SMEM index blocks are _IDXB (1024) wide regardless of bn: XLA
    # lays 1-D s32 operands out at tiling T(1024) and Mosaic verifies the
    # block layout against it, so a bn-wide block would be rejected. One
    # 1024-block serves 1024//bn row-blocks; `off` selects this block's
    # rows within it.
    off_cur = jax.lax.rem(i * bn, _IDXB)
    off_next = jax.lax.rem((i + 1) * bn, _IDXB)

    def issue(idx_ref, off, s):
        def body(j, _):
            pltpu.make_async_copy(
                vox_ref.at[idx_ref[off + j]],
                rows_buf.at[s, j],
                sem.at[s]).start()
            return _
        jax.lax.fori_loop(0, bn, body, None)

    @pl.when(i == 0)
    def _():
        issue(idx_cur_ref, off_cur, slot)      # prologue: block 0's rows

    @pl.when(i + 1 < n_i)
    def _():
        issue(idx_next_ref, off_next, nslot)   # overlap: next block's rows

    def wait(j, _):
        pltpu.make_async_copy(
            vox_ref.at[idx_cur_ref[off_cur + j]],
            rows_buf.at[slot, j],
            sem.at[slot]).wait()
        return _
    jax.lax.fori_loop(0, bn, wait, None)

    rows3 = rows_buf[slot]                           # (BN, nw, lanes) bf16
    wt = w8_ref[...].T                                     # (BN, 8) f32
    lanes = rows3.shape[2]

    def corner(c):
        """(BN, d_latent) slab of corner c — static plane/lane slices only
        (the plane split never crosses a corner: the caller guarantees
        d_latent divides the lane width or is a multiple of it)."""
        start = c * d_latent
        if d_latent % lanes == 0:                    # corner spans planes
            p0 = start // lanes
            parts = [rows3[:, p0 + t] for t in range(d_latent // lanes)]
            return parts[0] if len(parts) == 1 else jnp.concatenate(
                parts, axis=1)
        p, o = divmod(start, lanes)                  # corner within plane
        return rows3[:, p, o:o + d_latent]

    lat = corner(0).astype(jnp.float32) * wt[:, 0:1]
    for c in range(1, 8):
        lat += corner(c).astype(jnp.float32) * wt[:, c:c + 1]
    lat = lat.astype(jnp.bfloat16)                         # (BN, d_latent)

    def int8_dense(t, idx):
        if not quantized:
            return (jax.lax.dot(t, wq_ref[idx],
                                preferred_element_type=jnp.float32)
                    + bq_ref[idx][None])
        t32 = t.astype(jnp.float32)
        if act_scales is None:
            xs = jnp.max(jnp.abs(t32), axis=1, keepdims=True) / 127.0 + 1e-8
            inv = 1.0 / xs
        else:
            xs = float(act_scales[idx])
            inv = 1.0 / xs
        tq = jnp.clip(jnp.round(t32 * inv), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot(tq, wq_ref[idx],
                          preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * xs * ws_ref[idx][None]
                + bq_ref[idx][None])

    aux_t = aux_ref[...].T                                 # (BN, 24) bf16
    aux32 = aux_t.astype(jnp.float32)
    h = (jax.lax.dot(aux_t, a_aux_ref[...],
                     preferred_element_type=jnp.float32)
         + jax.lax.dot(jnp.sin(aux32).astype(jnp.bfloat16), s_aux_ref[...],
                       preferred_element_type=jnp.float32)
         + jax.lax.dot(jnp.cos(aux32).astype(jnp.bfloat16), c_aux_ref[...],
                       preferred_element_type=jnp.float32)
         + b_in_ref[...][None])                            # (BN, 512) f32
    for blk in range(n_blocks):
        if blk < combine_layer:
            h = h + (jax.lax.dot(lat, wz_ref[blk],
                                 preferred_element_type=jnp.float32)
                     + bz_ref[blk][None])
        t = jnp.maximum(h.astype(jnp.bfloat16), 0)
        a0 = int8_dense(t, 2 * blk)
        u = jnp.maximum(a0.astype(jnp.bfloat16), 0)
        a1 = int8_dense(u, 2 * blk + 1)
        h = h + a1
    hidden = jnp.maximum(h, 0).astype(jnp.bfloat16)
    hidden_ref[...] = hidden
    out_ref[...] = (jax.lax.dot(hidden, w_out_ref[...],
                                preferred_element_type=jnp.float32)
                    + b_out_ref[...][None]).astype(jnp.bfloat16)


def fused_gather_resnetfc_int8(vox_rows: jnp.ndarray, flat: jnp.ndarray,
                               w8: jnp.ndarray, aux: jnp.ndarray,
                               packed: dict, d_latent: int = 64,
                               num_freqs: int = 6, n_blocks: int = 5,
                               combine_layer: int = 3, bn: int = 256,
                               quantized: bool = True, act_scales=None):
    """Gather-fused serving forward. bn (rows per grid block) is capped
    by the ~16 MB scoped-VMEM stack: 512 rows of f32 activations through
    the 5-block MLP measured 32.4 MB at bn=1024, so 256 keeps a 2x margin.

    vox_rows: (cells, 8*d_latent) bf16/f32 — the corner-expanded voxel
      grid flattened to rows (stays in HBM; the kernel DMA-gathers per
      sample; lerp accumulates f32 and rounds to bf16 AFTER, matching the
      unfused corner_lerp -> zi-cast chain for either row dtype).
    flat: (N,) int32 in-bounds row indices; w8: (8, N) f32 lerp weights;
    aux: (24, N) bf16 [canon|dirs|wrapped phases] — all straight from
    ops.ray_expand_pallas.ray_expand. packed: pack_resnetfc_params output.
    Returns (out (N, 128) bf16, hidden (N, d_hidden) bf16), rows in the
    same (K-major) sample order as the inputs."""
    assert vox_rows.dtype in (jnp.bfloat16, jnp.float32), vox_rows.dtype
    width = 8 * d_latent
    assert vox_rows.shape[1] == width, vox_rows.shape
    tpu = jax.default_backend() == "tpu"
    if tpu and (width % 128 or not (d_latent % 128 == 0
                                    or 128 % d_latent == 0)):
        # Mosaic requires full-tile-plane DMAs: rows are split into
        # 128-lane planes, and each corner's d_latent slab must land on
        # static plane/lane boundaries. Production d_latent=64 (rows
        # 512-wide) is fine; reject odd widths instead of failing deep
        # inside the remote compile service.
        raise ValueError(
            f"gather_fused_mlp needs 8*d_latent ({width}) to be a "
            f"multiple of 128 and d_latent to divide (or be a multiple "
            f"of) 128 on TPU; use the unfused serving path for "
            f"d_latent={d_latent}")
    # split each row into full 128-lane planes (tile-aligned per-row DMAs);
    # interpret mode (CPU tests) may use narrower rows — keep them as one
    # plane, which the kernel's corner() slices identically.
    lanes = 128 if width % 128 == 0 else width
    vox3 = vox_rows.reshape(vox_rows.shape[0], width // lanes, lanes)
    assert _IDXB % bn == 0, (bn, _IDXB)
    n = flat.shape[0]
    pad = (-n) % _IDXB      # pad to whole SMEM index blocks (>= bn blocks)
    if pad:
        flat = jnp.pad(flat, (0, pad))          # 0 is a valid (masked) row
        w8 = jnp.pad(w8, ((0, 0), (0, pad)))
        aux = jnp.pad(aux, ((0, 0), (0, pad)))
    npad = n + pad
    d_hidden = packed["wq"].shape[-1]
    sliced = slice_gather_weights(packed, d_latent, num_freqs)
    wnames = ("a_aux", "s_aux", "c_aux", "b_in", "wz_lat", "bz",
              "wq", "ws", "bq", "w_out", "b_out")
    wargs = [sliced[k] for k in wnames]

    def const_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    if act_scales is not None:
        act_scales = tuple(float(s) for s in act_scales)
        assert len(act_scales) == 2 * n_blocks, (len(act_scales), n_blocks)
    nblk = npad // bn
    hidden, out = pl.pallas_call(
        functools.partial(_gather_kernel, n_blocks=n_blocks,
                          combine_layer=combine_layer, quantized=quantized,
                          bn=bn, d_latent=d_latent, act_scales=act_scales),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),              # vox_rows
            # XLA lays 1-D s32 operands out at tiling T(1024); Mosaic
            # verifies the SMEM block layout against it, so the index
            # block must be _IDXB=1024 wide regardless of bn (Mosaic:
            # "Try changing your kernel block shape to (1024)"); a block
            # serves _IDXB//bn consecutive row-blocks (in-kernel offset).
            pl.BlockSpec((_IDXB,), lambda i, _b=bn: (i * _b // _IDXB,),
                         memory_space=pltpu.SMEM),             # idx cur
            pl.BlockSpec((_IDXB,),
                         lambda i, _b=bn, _np=npad: (
                             jnp.minimum((i + 1) * _b, _np - 1) // _IDXB,),
                         memory_space=pltpu.SMEM),             # idx next
            pl.BlockSpec((8, bn), lambda i: (0, i),
                         memory_space=pltpu.VMEM),             # w8
            pl.BlockSpec((24, bn), lambda i: (0, i),
                         memory_space=pltpu.VMEM),             # aux
        ] + [const_spec(a) for a in wargs],
        out_specs=[
            pl.BlockSpec((bn, d_hidden), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad, d_hidden), jnp.bfloat16),
            jax.ShapeDtypeStruct((npad, 128), jnp.bfloat16),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, bn, width // lanes, lanes), vox_rows.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=not tpu,
    )(vox3, flat, flat, w8.astype(jnp.float32),
      aux.astype(jnp.bfloat16), *wargs)
    return out[:n], hidden[:n]
