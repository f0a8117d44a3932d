"""Int8 (W8A8) matmul path for serving the NeRF field MLP.

The parity render is MXU-compute-bound: the ResnetFC stack runs at ~97% of
the v5e bf16 roofline (BENCH_NOTES), so the only way past it on one chip
is the int8 MXU path (394 TOPS vs 197 TFLOP/s bf16). This module provides
dynamic post-training quantization — per-output-channel symmetric weights,
per-row symmetric activations, int32 accumulation — applied ON THE FLY
inside the graph (weights quantize from the same fp32 params each call:
0.26 MB/layer, negligible; the param tree stays identical to the bf16
path, so any checkpoint can serve quantized with a config flag).

This is an OPT-IN serving mode (NerfFieldConfig.quantized): it changes
numerics like the proposal sampler changes sampling; quality deltas are
measured, not assumed (see tests + BENCH_NOTES).

Reference context: the reference serves the same fp32 MLP it trains
(resnetfc.py); quantized serving has no reference counterpart — it is a
TPU-native capability.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def quantize_rows(x: jnp.ndarray, eps: float = 1e-8):
    """Per-row symmetric int8: x (N, K) -> (int8 (N, K), scale (N, 1))."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = (amax / 127.0 + eps).astype(jnp.float32)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_cols(w: jnp.ndarray, eps: float = 1e-8):
    """Per-output-channel symmetric int8: w (K, M) -> (int8, scale (1, M))."""
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = (amax / 127.0 + eps).astype(jnp.float32)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def int8_matmul(x: jnp.ndarray, w: jnp.ndarray,
                out_dtype=jnp.float32) -> jnp.ndarray:
    """y = x @ w with dynamic W8A8 quantization, int32 accumulation.

    x (N, K) float; w (K, M) float. Returns (N, M) in out_dtype.

    NOT differentiable by design: jnp.round has zero gradient, so silently
    training through this path would learn nothing. Differentiating raises
    (serving-only guard, cf. NerfFieldConfig.quantized docstring).
    """
    xq, xs = quantize_rows(x)
    wq, ws = quantize_cols(w)
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * (xs * ws)).astype(out_dtype)


def _int8_matmul_fwd(x, w, out_dtype):
    return int8_matmul(x, w, out_dtype), None


def _int8_matmul_bwd(out_dtype, residual, g):
    raise NotImplementedError(
        "int8_matmul (QuantDense / NerfFieldConfig.quantized) is a "
        "serving-only path: round() has zero gradient, so training through "
        "it would silently learn nothing. Train with quantized=False and "
        "serve the same checkpoint quantized.")


int8_matmul.defvjp(_int8_matmul_fwd, _int8_matmul_bwd)
