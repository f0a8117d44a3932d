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
            quantized: bool):
    zi = zi_ref[...]                                       # (BN, 128) bf16

    def int8_dense(t, idx):
        if not quantized:  # bf16 block weights, f32 accumulation
            return (jax.lax.dot(t, wq_ref[idx],
                                preferred_element_type=jnp.float32)
                    + bq_ref[idx][None])
        t32 = t.astype(jnp.float32)
        amax = jnp.max(jnp.abs(t32), axis=1, keepdims=True)
        xs = amax / 127.0 + 1e-8
        tq = jnp.clip(jnp.round(t32 / xs), -127, 127).astype(jnp.int8)
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


def fused_resnetfc_int8(zi: jnp.ndarray, packed: dict, n_blocks: int = 5,
                        combine_layer: int = 3, bn: int = 512,
                        quantized: bool = True):
    """zi: (N, 128) bf16 from pack_mlp_input. Returns (out (N, 128) bf16 —
    head dims in the leading columns, hidden (N, 512) bf16 — relu'd last
    hidden for late embed projection)."""
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
    hidden, out = pl.pallas_call(
        functools.partial(_kernel, n_blocks=n_blocks,
                          combine_layer=combine_layer, quantized=quantized),
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
