"""IGR-style implicit MLP (SDF-capable) — the pixelNeRF family's alternate
field network.

Reference behavior: /root/reference/featurenerf_robo/featurenerf/src/model/
mlp.py:7-126 (ImplicitNet): linear stack with input-skip connections
(concat + /sqrt(2)), softplus(beta) or ReLU activation, multiview
combine at combine_layer, and "geometric" initialization — the last
layer's first output unit initialized so the initial SDF is approximately
a sphere of radius `radius_init` (negated convention: inside positive),
remaining units N(0, output_init_gain); hidden layers N(0, sqrt(2/out));
the non-position tail of the input row (positional-encoding dims) zeroed
at layer 0 and at each skip layer.

TPU notes: flax module, explicit PRNG, one matmul per layer; the multiview
combine is a reshape+reduce like ResnetFC's.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class ImplicitNet(nn.Module):
    d_in: int
    dims: Sequence[int]              # hidden layer sizes
    d_out: int = 4
    skip_in: Tuple[int, ...] = ()
    geometric_init: bool = True
    radius_init: float = 0.3
    beta: float = 0.0                # >0: softplus(beta); else ReLU
    output_init_gain: float = 2.0
    num_position_inputs: int = 3
    sdf_scale: float = 1.0
    combine_layer: int = 1000
    combine_type: str = "average"
    dtype: Any = jnp.float32

    def _layer_dims(self):
        return [self.d_in] + list(self.dims) + [self.d_out]

    def _init_kernel(self, layer: int, dims):
        """Geometric init for kernel (fan_in, fan_out) = (dims[l], out)."""
        last = layer == len(dims) - 2

        def init(key, shape, dtype=jnp.float32):
            fan_in, fan_out = shape
            if not self.geometric_init:
                return nn.initializers.variance_scaling(
                    2.0, "fan_in", "normal")(key, shape, dtype)
            if last:
                k1, k2 = jax.random.split(key)
                w0 = (jax.random.normal(k1, (fan_in, 1), dtype) * 1e-5
                      - np.sqrt(np.pi) / np.sqrt(fan_in) * self.sdf_scale)
                rest = jax.random.normal(
                    k2, (fan_in, fan_out - 1), dtype) * self.output_init_gain
                w = jnp.concatenate([w0, rest], axis=1)
            else:
                w = jax.random.normal(key, shape, dtype) * (
                    np.sqrt(2.0) / np.sqrt(fan_out))
            if self.d_in > self.num_position_inputs and (
                    layer == 0 or layer in self.skip_in):
                # zero the positional-encoding tail of the input rows
                tail = self.d_in - self.num_position_inputs
                w = w.at[-tail:, :].set(0.0)
            return w

        return init

    def _bias_init(self, layer: int, dims):
        last = layer == len(dims) - 2

        def init(key, shape, dtype=jnp.float32):
            b = jnp.zeros(shape, dtype)
            if self.geometric_init and last:
                b = b.at[0].set(self.radius_init)
            return b

        return init

    @nn.compact
    def __call__(self, x: jnp.ndarray, num_views: int = 1) -> jnp.ndarray:
        """x: (N, d_in). num_views > 1: leading axis divisible by num_views,
        reduced at combine_layer (multiview aggregation)."""
        dims = self._layer_dims()
        act = (lambda v: jax.nn.softplus(self.beta * v) / self.beta) \
            if self.beta > 0 else jax.nn.relu
        x = x.astype(self.dtype)
        x_init = x
        for layer in range(len(dims) - 1):
            if layer == self.combine_layer and num_views > 1:
                def comb(t):
                    t = t.reshape(-1, num_views, t.shape[-1])
                    return (jnp.mean(t, axis=1)
                            if self.combine_type == "average"
                            else jnp.max(t, axis=1))
                x = comb(x)
                x_init = comb(x_init)
                num_views = 1
            if layer < self.combine_layer and layer in self.skip_in:
                x = jnp.concatenate([x, x_init], axis=-1) / np.sqrt(2.0)
            out_dim = dims[layer + 1]
            if (layer + 1) in self.skip_in:
                out_dim -= self.d_in
            x = nn.Dense(out_dim, kernel_init=self._init_kernel(layer, dims),
                         bias_init=self._bias_init(layer, dims),
                         dtype=self.dtype, name=f"lin{layer}")(x)
            if layer < len(dims) - 2:
                x = act(x)
        return x
