"""Flax building blocks for the voxel policy networks.

TPU-first notes:
  - everything is channel-last (NDHWC) — the native layout for XLA TPU convs
  - the patchify conv (kernel==stride) is lowered to reshape+matmul, which
    maps straight onto the MXU instead of a general conv
  - LeakyReLU slope matches the reference's LRELU_SLOPE=0.02
    (/root/reference/network_utils.py:14)

Parity targets: Conv3DBlock (network_utils.py:130-172), DenseBlock (:444-477),
Conv3DUpsampleBlock (:424-441), MultiLayer3DEncoderShallow (:303-357).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

LRELU_SLOPE = 0.02

# Lowering toggles (module-level for timing experiments). Both measured
# NEGATIVE in-graph on v5e (policy forward 34.0 -> 36.3 ms each, 38.2 both):
# a canonical-layout matmul island inside a conv-shaped graph just moves
# the layout copies to its own boundaries — XLA's global conv layout
# assignment wins. Kept for layouts-free graphs and as the measurement
# record; see BENCH_NOTES.md round 2.
POINTWISE_LOWERING = False        # 1x1x1 conv as flat matmul
SHUFFLE_TRANSPOSE_LOWERING = False  # k==s ConvTranspose as matmul+shuffle


def act_fn(name: Optional[str]):
    if name is None:
        return lambda x: x
    if name == "relu":
        return jax.nn.relu
    if name == "lrelu":
        return lambda x: jax.nn.leaky_relu(x, LRELU_SLOPE)
    if name == "elu":
        return jax.nn.elu
    if name == "tanh":
        return jnp.tanh
    raise ValueError(f"unknown activation {name!r}")


def _kaiming_uniform(slope: float = 0.0):
    """He-uniform init matching the reference's per-activation conv/linear
    init (fan_in, leaky_relu gain)."""
    return nn.initializers.variance_scaling(
        2.0 / (1.0 + slope ** 2), "fan_in", "uniform")


def init_for(activation: Optional[str]):
    if activation is None or activation == "tanh":
        return nn.initializers.xavier_uniform()
    if activation == "lrelu":
        return _kaiming_uniform(LRELU_SLOPE)
    if activation == "relu":
        return _kaiming_uniform(0.0)
    raise ValueError(f"unknown activation {activation!r}")


class DenseBlock(nn.Module):
    features: int
    activation: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.features, kernel_init=init_for(self.activation),
                     dtype=self.dtype)(x)
        return act_fn(self.activation)(x)


class PointwiseConv3D(nn.Module):
    """1x1x1 conv lowered to a flat matmul (param-tree compatible with
    nn.Conv: params "kernel" (1,1,1,Cin,Cout) / "bias" (Cout,)).

    XLA assigns 3-D convs split spatial layouts (e.g. [100,100,8,13,C]) and
    then inserts whole-tensor layout copies between every conv-adjacent op
    at 100^3 (~1 ms per copy). A pointwise conv is just a matmul over
    flattened voxels, which keeps the canonical (8,128)-tiled layout.
    """

    features: int
    kernel_init: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (1, 1, 1, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = self.dtype
        y = x.reshape(-1, cin).astype(dt) @ kernel.reshape(
            cin, self.features).astype(dt)
        y = y + bias.astype(y.dtype)
        return y.reshape(*x.shape[:-1], self.features)


def voxel_shuffle_3d(y: jnp.ndarray, f: int, c: int) -> jnp.ndarray:
    """(B, D, H, W, f^3*C) -> (B, D*f, H*f, W*f, C); channel blocks ordered
    (di, dj, dk, c) with c minor (pixel-shuffle / sub-voxel interleave)."""
    b, d, h, w, _ = y.shape
    y = y.reshape(b, d, h, w, f, f, f, c)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return y.reshape(b, d * f, h * f, w * f, c)


class ShuffleTransposeConv3D(nn.Module):
    """stride==kernel ConvTranspose lowered to one matmul + voxel shuffle
    (param-tree compatible with nn.ConvTranspose: "kernel" (s,s,s,Cin,Cout),
    "bias" (Cout,)). Output blocks are disjoint (no overlap-add), so
    out[s*i+di, s*j+dj, s*k+dk] = x[i,j,k] @ K[di,dj,dk] exactly."""

    features: int
    factor: int
    kernel_init: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, d, h, w, cin = x.shape
        s, co = self.factor, self.features
        kernel = self.param("kernel", self.kernel_init, (s, s, s, cin, co))
        bias = self.param("bias", nn.initializers.zeros, (co,))
        dt = self.dtype
        k2 = kernel.reshape(s ** 3, cin, co).transpose(1, 0, 2).reshape(
            cin, s ** 3 * co)
        y = x.reshape(-1, cin).astype(dt) @ k2.astype(dt)
        y = (y.reshape(-1, co) + bias.astype(y.dtype)).reshape(
            b, d, h, w, s ** 3 * co)
        return voxel_shuffle_3d(y, s, co)


class ZDecomposedConv3D(nn.Module):
    """k3/s1 3-D conv as 2-D convs over (H, W) slabs plus z-shifted adds:
    out[z] = sum_dz conv2d(x[z+dz-1], K[dz]). Exact; param-tree compatible
    with nn.Conv ("kernel" (3,3,3,Cin,Cout), "bias" (Cout,)).

    Rationale: XLA TPU assigns 3-D convs at 100^3 split-spatial layouts and
    pays ~1 ms whole-tensor copies at every junction (BENCH_NOTES round 2);
    2-D convs with the depth axis folded into the batch keep the canonical
    image layout. Supports 'zeros' and 'replicate' padding.

    packed=True issues ONE conv with the three z-taps concatenated on the
    output-channel axis (Cout -> 3*Cout) instead of three Cout-wide convs:
    the policy's 128->64 final conv runs at N=64 = half the MXU's 128
    lanes, so tap-packing doubles MXU occupancy and reads the padded input
    once instead of three times. Same per-tap conv results, same tap add
    order (0+1+2) — numerically identical up to XLA scheduling."""

    features: int
    kernel_init: Any
    padding: str = "zeros"
    dtype: Any = jnp.float32
    packed: bool = False
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        b, d, h, w, cin = x.shape
        co, k = self.features, self.kernel_size
        assert k % 2 == 1, "z-decomposition needs an odd kernel"
        pz = k // 2
        kernel = self.param("kernel", self.kernel_init, (k, k, k, cin, co))
        bias = self.param("bias", nn.initializers.zeros, (co,))
        dt = self.dtype
        mode = "edge" if self.padding == "replicate" else "constant"
        # pad z (+h,w for replicate, which conv2d SAME can't express)
        if self.padding == "replicate":
            xp = jnp.pad(x, ((0, 0), (pz, pz), (pz, pz), (pz, pz), (0, 0)),
                         mode=mode)
            conv_pad = "VALID"
        else:
            xp = jnp.pad(x, ((0, 0), (pz, pz), (0, 0), (0, 0), (0, 0)))
            conv_pad = "SAME"
        xp = xp.reshape((b * (d + 2 * pz),) + xp.shape[2:]).astype(dt)
        if self.packed:
            kp = jnp.concatenate([kernel[dz] for dz in range(k)],
                                 axis=-1).astype(dt)        # (k,k,cin,k*co)
            y = jax.lax.conv_general_dilated(
                xp, kp, window_strides=(1, 1), padding=conv_pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y.reshape(b, d + 2 * pz, h, w, k, co)
            out = y[:, 0:d, :, :, 0]
            for dz in range(1, k):
                out = out + y[:, dz:dz + d, :, :, dz]
            return out + bias.astype(out.dtype)
        out = None
        for dz in range(k):
            c = jax.lax.conv_general_dilated(
                xp, kernel[dz].astype(dt), window_strides=(1, 1),
                padding=conv_pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))
            c = c.reshape(b, d + 2 * pz, h, w, co)[:, dz:dz + d]
            out = c if out is None else out + c
        out = out + bias.astype(out.dtype)
        return out


class Conv3DBlock(nn.Module):
    """3-D conv + activation. padding='replicate' matches the reference's
    edge padding exactly but materializes a padded copy (a 0.5 GB HBM pass
    at 100^3 x 128ch); 'zeros' folds padding into the conv (XLA-native, no
    copy) and differs only in the 1-voxel border halo."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    activation: Optional[str] = None
    dtype: Any = jnp.float32
    padding: str = "replicate"
    backend: str = "xla"        # "xla" | "pallas" | "conv2d" (k3/s1 only)

    @nn.compact
    def __call__(self, x):
        if (self.backend in ("conv2d", "conv2d_packed")
                and self.kernel_size % 2 == 1 and self.stride == 1):
            y = ZDecomposedConv3D(self.features, init_for(self.activation),
                                  self.padding, self.dtype,
                                  packed=(self.backend == "conv2d_packed"),
                                  kernel_size=self.kernel_size,
                                  name="Conv_0")(x)
            return act_fn(self.activation)(y)
        if (self.backend == "pallas" and self.kernel_size == 3
                and self.stride == 1 and self.padding == "zeros"):
            from real_robot_nerf_actor_tpu.ops.conv3d_pallas import conv3d_k3
            kernel = self.param(
                "pallas_kernel", init_for(self.activation),
                (3, 3, 3, x.shape[-1], self.features))
            bias = self.param("pallas_bias", nn.initializers.zeros,
                              (self.features,))
            y = conv3d_k3(x.astype(self.dtype), kernel, bias)
            return act_fn(self.activation)(y)
        if self.kernel_size == 1 and self.stride == 1 and POINTWISE_LOWERING:
            y = PointwiseConv3D(self.features, init_for(self.activation),
                                self.dtype, name="Conv_0")(x)
            return act_fn(self.activation)(y)
        pad = self.kernel_size // 2
        if pad > 0 and self.padding == "replicate":
            x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (pad, pad), (0, 0)),
                        mode="edge")
            conv_pad = "VALID"
        else:
            conv_pad = pad
        x = nn.Conv(self.features, (self.kernel_size,) * 3,
                    strides=(self.stride,) * 3, padding=conv_pad,
                    kernel_init=init_for(self.activation),
                    dtype=self.dtype)(x)
        return act_fn(self.activation)(x)


class PatchifyConv3D(nn.Module):
    """Non-overlapping patch conv (kernel==stride) as reshape + matmul.

    Equivalent to Conv3DBlock(kernel=stride=P, padding P//2 replicate) only
    when the input size is divisible by P and padding doesn't reach (for the
    reference's 100^3 with P=5, replicate padding of 2 DOES contribute to
    edge patches — so we keep a true conv for strict parity, but this module
    is the fast path used by default; the receptive fields differ only in
    the 2-voxel halo of edge patches).
    """

    features: int
    patch: int = 5
    activation: Optional[str] = "lrelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        p = self.patch
        assert d % p == 0 and h % p == 0 and w % p == 0
        x = x.reshape(b, d // p, p, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
            b, d // p, h // p, w // p, p * p * p * c)
        x = nn.Dense(self.features, kernel_init=init_for(self.activation),
                     dtype=self.dtype)(x)
        return act_fn(self.activation)(x)


class SubpixelUpsample3D(nn.Module):
    """Learned sub-pixel (voxel-shuffle) upsampling: a k3 conv at LOW
    resolution producing factor^3 * features channels, shuffled to the fine
    grid. Same expressive family as trilinear-upsample + conv-at-full-res
    but ~factor^2 fewer FLOPs and a single big MXU matmul instead of a
    125-tap conv over 100^3 voxels."""

    features: int
    factor: int
    activation: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, d, h, w, _ = x.shape
        f = self.factor
        y = nn.Conv(self.features * f ** 3, (3, 3, 3), padding=1,
                    kernel_init=init_for(self.activation),
                    dtype=self.dtype)(x)
        y = act_fn(self.activation)(y)
        y = y.reshape(b, d, h, w, f, f, f, self.features)
        y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        return y.reshape(b, d * f, h * f, w * f, self.features)


class Conv3DUpsampleBlock(nn.Module):
    """conv -> upsample -> conv (reference Conv3DUpsampleBlock).

    mode='subpixel' (TPU default) fuses [trilinear upsample + full-res conv]
    into a low-res sub-pixel conv; mode='trilinear' reproduces the
    reference's exact op sequence.
    """

    features: int
    stride: int
    kernel_size: int = 3
    activation: Optional[str] = None
    dtype: Any = jnp.float32
    mode: str = "subpixel"
    backend: str = "xla"

    @nn.compact
    def __call__(self, x):
        x = Conv3DBlock(self.features, self.kernel_size, 1, self.activation,
                        dtype=self.dtype, backend=self.backend)(x)
        if self.stride > 1:
            if self.mode == "subpixel":
                return SubpixelUpsample3D(self.features, self.stride,
                                          self.activation, self.dtype)(x)
            if self.mode == "transpose":
                # stride==kernel ConvTranspose: disjoint per-cell matmul +
                # voxel shuffle (XLA's own ConvTranspose lowering emits the
                # same shuffle plus extra conv-layout copies)
                if SHUFFLE_TRANSPOSE_LOWERING:
                    y = ShuffleTransposeConv3D(
                        self.features, self.stride,
                        kernel_init=init_for(self.activation),
                        dtype=self.dtype, name="ConvTranspose_0")(x)
                else:
                    s = self.stride
                    y = nn.ConvTranspose(
                        self.features, (s, s, s), strides=(s, s, s),
                        kernel_init=init_for(self.activation),
                        dtype=self.dtype)(x)
                return act_fn(self.activation)(y)
            b, d, h, w, c = x.shape
            x = jax.image.resize(
                x, (b, d * self.stride, h * self.stride, w * self.stride, c),
                method="trilinear")
        x = Conv3DBlock(self.features, self.kernel_size, 1, self.activation,
                        dtype=self.dtype, backend=self.backend)(x)
        return x


class ConvBnReLU3D(nn.Module):
    """conv (no bias) -> batchnorm -> leaky relu; the UNet cell of
    MultiLayer3DEncoderShallow. BatchNorm runs in inference-style 'batch
    stats computed on the fly' mode (use_running_average=False) matching
    training-mode torch BN without tracked stats."""

    features: int
    stride: int = 1
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.features, (self.kernel_size,) * 3,
                    strides=(self.stride,) * 3, padding=1, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        return jax.nn.leaky_relu(x, 0.01)


class DeconvBn3D(nn.Module):
    """transposed conv (no bias) -> batchnorm -> leaky relu upsample cell.

    Matches torch ConvTranspose3d(k=3, stride=2, padding=1, output_padding)
    output sizing (out = 2*in - 1 + output_padding); `out_size` selects the
    crop so the result aligns with the UNet skip tensor for any input size.
    """

    features: int
    out_size: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = nn.ConvTranspose(self.features, (3, 3, 3), strides=(2, 2, 2),
                             padding="VALID", use_bias=False)(x)
        # VALID transpose output = 2*(in-1)+3 = 2*in+1; torch's padding=1
        # removes one from each side, output_padding re-adds at the far side
        crop_lo = 1
        tgt = self.out_size
        y = y[:, crop_lo:crop_lo + tgt, crop_lo:crop_lo + tgt,
              crop_lo:crop_lo + tgt, :]
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y)
        return jax.nn.leaky_relu(y, 0.01)


class MultiLayer3DEncoderShallow(nn.Module):
    """3-level 3-D UNet voxel encoder (nerfact input preprocessor).

    100^3 x Cin -> [8, 16, 32, 64] down path with stride-2 convs, symmetric
    transposed-conv up path with additive skips, 1x1x1 conv head to
    `features` channels. Reference: network_utils.py:303-357.
    """

    features: int = 64

    @nn.compact
    def __call__(self, x, train: bool = True):
        ch = (8, 16, 32, 64)
        c0 = ConvBnReLU3D(ch[0])(x, train)                       # 100^3 x 8
        c1 = ConvBnReLU3D(ch[1], stride=2)(c0, train)            # 50^3
        c2 = ConvBnReLU3D(ch[1])(c1, train)                      # 50^3 x 16
        c3 = ConvBnReLU3D(ch[2], stride=2)(c2, train)            # 25^3
        c4 = ConvBnReLU3D(ch[2])(c3, train)                      # 25^3 x 32
        c5 = ConvBnReLU3D(ch[3], stride=2)(c4, train)            # 13^3
        c6 = ConvBnReLU3D(ch[3])(c5, train)                      # 13^3 x 64
        u = c4 + DeconvBn3D(ch[2], out_size=c4.shape[1])(c6, train)  # 25^3
        u = c2 + DeconvBn3D(ch[1], out_size=c2.shape[1])(u, train)   # 50^3
        u = c0 + DeconvBn3D(ch[0], out_size=c0.shape[1])(u, train)   # 100^3
        return nn.Conv(self.features, (1, 1, 1))(u)


class MultiLayer3DEncoder(nn.Module):
    """Deep 4-level 3-D UNet voxel encoder with multi-scale feature list.

    Channels [32, 64, 128, 256]: stride-2 down path to 13^3, symmetric
    transposed-conv up path with additive skips, 1x1x1 conv head. Returns
    (out, voxel_list) where voxel_list = [input, 25^3 skip sum, 50^3 skip
    sum] — the multi-scale features the reference exposes for downstream
    use. Reference: network_utils.py:247-302 (MultiLayer3DEncoder).
    """

    features: int = 64

    @nn.compact
    def __call__(self, x, train: bool = True):
        ch = (32, 64, 128, 256)
        voxel_list = [x]
        c0 = ConvBnReLU3D(ch[0])(x, train)                       # V^3 x 32
        c2 = ConvBnReLU3D(ch[1])(
            ConvBnReLU3D(ch[1], stride=2)(c0, train), train)     # V/2 x 64
        c4 = ConvBnReLU3D(ch[2])(
            ConvBnReLU3D(ch[2], stride=2)(c2, train), train)     # V/4 x 128
        u = ConvBnReLU3D(ch[3])(
            ConvBnReLU3D(ch[3], stride=2)(c4, train), train)     # V/8 x 256
        u = c4 + DeconvBn3D(ch[2], out_size=c4.shape[1])(u, train)
        voxel_list.append(u)
        u = c2 + DeconvBn3D(ch[1], out_size=c2.shape[1])(u, train)
        voxel_list.append(u)
        u = c0 + DeconvBn3D(ch[0], out_size=c0.shape[1])(u, train)
        return nn.Conv(self.features, (1, 1, 1))(u), voxel_list


class ContractFirstConv3D(nn.Module):
    """3-D conv computed channels-first: one matmul x @ W (Cin -> taps*Cout)
    followed by 27 shifted scalar adds. Exact conv; wins when Cout is tiny
    (the 64->1 Q-trans head: XLA's direct conv can't fill the MXU with one
    output channel). Replicate ('edge') padding like Conv3DBlock."""

    features: int
    kernel_size: int = 3
    activation: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, d, h, w, cin = x.shape
        k = self.kernel_size
        taps = k ** 3
        kernel = self.param("kernel", init_for(self.activation),
                            (k, k, k, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        w2 = kernel.transpose(3, 0, 1, 2, 4).reshape(cin, taps * self.features)
        t = (x.astype(self.dtype) @ w2.astype(self.dtype))
        t = t.reshape(b, d, h, w, taps, self.features)
        pad = k // 2
        t = jnp.pad(t, ((0, 0), (pad, pad), (pad, pad), (pad, pad),
                        (0, 0), (0, 0)), mode="edge")
        out = jnp.zeros((b, d, h, w, self.features), self.dtype)
        for tap in range(taps):
            dz, rem = divmod(tap, k * k)
            dy, dx = divmod(rem, k)
            out = out + t[:, dz:dz + d, dy:dy + h, dx:dx + w, tap]
        out = out + bias.astype(self.dtype)
        return act_fn(self.activation)(out)
