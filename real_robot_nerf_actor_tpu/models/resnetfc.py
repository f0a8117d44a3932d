"""Fully-connected ResNet NeRF MLP (flax).

Reference behavior (/root/reference/resnetfc.py:12-209):
  - lin_in: d_in -> d_hidden (kaiming fan_in), lin_out: d_hidden -> d_out
  - n_blocks residual blocks: fc0(act(x)) -> fc1(act(.)) with fc1
    zero-initialized; shortcut identity when sizes match
  - per-block latent injection x += lin_z[i](z) for blocks before
    combine_layer; at combine_layer the multiview axis is reduced
    (average/max)
  - activation ReLU (beta=0 path)

TPU notes: points arrive as (..., d_latent + d_in) in one big batch — every
layer is a single [N, 512] x [512, 512] matmul on the MXU. No chunking.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

_kaiming = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


@jax.custom_vjp
def _serving_only(y):
    return y


def _serving_only_fwd(y):
    return y, None


def _serving_only_bwd(_, g):
    # fail fast instead of training silently with the zero gradient of
    # jnp.round (ADVICE r2): a quantized ResnetFC must never be
    # differentiated — train with quantized=False, serve the same
    # checkpoint quantized
    raise NotImplementedError(
        "QuantDense (quantized=True) is serving-only: int8 rounding has "
        "zero gradient, so training would silently not learn. Train with "
        "quantized=False and serve the same checkpoint with the flag on.")


_serving_only.defvjp(_serving_only_fwd, _serving_only_bwd)


class QuantDense(nn.Module):
    """Dense with dynamic W8A8 int8 compute (param-tree compatible with
    nn.Dense: "kernel"/"bias"). Serving-only: the v5e int8 MXU path is 2x
    the bf16 rate and the parity render's MLP is at the bf16 roofline
    (see ops/quant.py). Weights quantize on the fly from the same fp32
    params, so any checkpoint serves quantized via a config flag."""

    features: int
    kernel_init: Any = _kaiming
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from real_robot_nerf_actor_tpu.ops.quant import int8_matmul
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features))
        shp = x.shape
        y = int8_matmul(x.reshape(-1, shp[-1]), kernel, out_dtype=self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return _serving_only(y.reshape(*shp[:-1], self.features))


class ResnetBlockFC(nn.Module):
    size_out: int
    dtype: Any = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x):
        def dense(features, kernel_init, name, use_bias=True):
            if self.quantized:
                return QuantDense(features, kernel_init=kernel_init,
                                  use_bias=use_bias, dtype=self.dtype,
                                  name=name)
            return nn.Dense(features, kernel_init=kernel_init,
                            use_bias=use_bias, dtype=self.dtype, name=name)

        h = dense(min(x.shape[-1], self.size_out), _kaiming, "Dense_0")(
            nn.relu(x))
        # tp: the block's inner hidden is the Megatron cut (first Dense
        # column-parallel, second row-parallel); no-op without a
        # tensor_parallel context
        from real_robot_nerf_actor_tpu.parallel.constraints import shard_hidden
        h = shard_hidden(h)
        dx = dense(self.size_out, nn.initializers.zeros, "Dense_1")(
            nn.relu(h))
        if x.shape[-1] != self.size_out:
            x = dense(self.size_out, _kaiming, "Dense_2", use_bias=False)(x)
        return x + dx


class ResnetFC(nn.Module):
    d_out: int = 4
    n_blocks: int = 5
    d_latent: int = 0
    d_hidden: int = 512
    combine_layer: int = 1000
    combine_type: str = "average"
    dtype: Any = jnp.float32      # compute dtype (params stay fp32)
    # serving-only: run the 512x512 block matmuls on the int8 MXU path
    # (dynamic W8A8; same param tree — see QuantDense). lin_in/lin_z/
    # lin_out stay in `dtype` (small K or head dims).
    quantized: bool = False

    @nn.compact
    def __call__(self, zx: jnp.ndarray, num_views: int = 1,
                 ret_last_feat: bool = False,
                 head_dims: Optional[int] = None):
        """zx: (..., d_latent + d_in) — or a TUPLE (z, x) of the latent and
        code parts, which skips materializing the concat (the first layer
        consumes them separately anyway: lin_in(x) + lin_z_i(z), so a
        caller-side concatenate is a pure whole-batch HBM round trip that
        XLA fails to fold through the intervening reshape). If num_views >
        1 the leading axis must be divisible by num_views and is reduced at
        combine_layer. Returns (out, last_hidden); out (..., d_out).

        head_dims: when set, only the first ``head_dims`` output columns are
        computed (same ``lin_out_*`` params, sliced matmul) — the renderer's
        late-embed-projection path computes the wide linear embed head once
        per ray from the composited hidden instead of once per sample."""
        if isinstance(zx, tuple):
            z, x = zx
            z = None if z is None else z.astype(self.dtype)
            x = x.astype(self.dtype)
            assert (z is None) == (self.d_latent == 0)
        else:
            zx = zx.astype(self.dtype)
            if self.d_latent > 0:
                z = zx[..., : self.d_latent]
                x = zx[..., self.d_latent:]
            else:
                z = None
                x = zx
        x = nn.Dense(self.d_hidden, kernel_init=_kaiming, dtype=self.dtype)(x)

        for blkid in range(self.n_blocks):
            if blkid == self.combine_layer and num_views > 1:
                s = x.shape
                x = x.reshape(-1, num_views, *s[1:])
                x = (jnp.mean(x, axis=1) if self.combine_type == "average"
                     else jnp.max(x, axis=1))
                if z is not None:
                    z = None  # latent already consumed before combine
            if z is not None and blkid < self.combine_layer:
                x = x + nn.Dense(self.d_hidden, kernel_init=_kaiming,
                                 dtype=self.dtype, name=f"lin_z_{blkid}")(z)
            x = ResnetBlockFC(self.d_hidden, dtype=self.dtype,
                              quantized=self.quantized)(x)

        kernel = self.param("lin_out_kernel", _kaiming,
                            (self.d_hidden, self.d_out))
        bias = self.param("lin_out_bias", nn.initializers.zeros,
                          (self.d_out,))
        n = self.d_out if head_dims is None else head_dims
        out = (nn.relu(x) @ kernel[:, :n].astype(self.dtype)
               + bias[:n].astype(self.dtype))
        if ret_last_feat:
            return jnp.concatenate([out, x], axis=-1), x
        return out, x
