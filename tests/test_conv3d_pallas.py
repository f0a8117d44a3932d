"""Pallas 3-D conv vs flax nn.Conv (zero padding), interpret mode on CPU."""
import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from real_robot_nerf_actor_tpu.ops.conv3d_pallas import conv3d_k3_pallas


def _ref_conv(x, kernel, bias):
    conv = nn.Conv(kernel.shape[-1], (3, 3, 3), padding=1)
    return conv.apply({"params": {"kernel": jnp.asarray(kernel),
                                  "bias": jnp.asarray(bias)}}, jnp.asarray(x))


def test_conv3d_pallas_matches_xla():
    rng = np.random.default_rng(0)
    b, d, h, w, cin, cout = 2, 8, 10, 12, 16, 8
    x = rng.standard_normal((b, d, h, w, cin)).astype(np.float32)
    k = (rng.standard_normal((3, 3, 3, cin, cout)) * 0.1).astype(np.float32)
    bias = rng.standard_normal(cout).astype(np.float32)
    want = np.asarray(_ref_conv(x, k, bias))
    got = np.asarray(conv3d_k3_pallas(jnp.asarray(x), jnp.asarray(k),
                                      jnp.asarray(bias), tz=4, ty=5))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_conv3d_pallas_non_divisible_tiles():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 7, 9, 11, 8)).astype(np.float32)
    k = (rng.standard_normal((3, 3, 3, 8, 4)) * 0.1).astype(np.float32)
    bias = np.zeros(4, np.float32)
    want = np.asarray(_ref_conv(x, k, bias))
    got = np.asarray(conv3d_k3_pallas(jnp.asarray(x), jnp.asarray(k),
                                      jnp.asarray(bias), tz=4, ty=4))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_conv3d_pallas_bf16():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 16)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 16, 8)) * 0.1, jnp.float32)
    got = conv3d_k3_pallas(x, k, None, tz=4, ty=4)
    want = _ref_conv(np.asarray(x, np.float32), np.asarray(k),
                     np.zeros(8, np.float32))
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               rtol=5e-2, atol=5e-2)


def test_zdecomposed_conv2d_backend_matches_xla():
    """conv_backend='conv2d' (three z-shifted 2-D convs) is exact vs the
    XLA 3-D conv under both padding modes, sharing the same param tree."""
    from real_robot_nerf_actor_tpu.models.blocks import Conv3DBlock
    x = jax.random.normal(jax.random.key(1), (2, 7, 9, 11, 16))
    for pad in ("zeros", "replicate"):
        ref = Conv3DBlock(8, 3, 1, "lrelu", padding=pad)
        new = Conv3DBlock(8, 3, 1, "lrelu", padding=pad, backend="conv2d")
        p = ref.init(jax.random.key(0), x)
        assert (jax.tree_util.tree_structure(p)
                == jax.tree_util.tree_structure(new.init(jax.random.key(0), x)))
        np.testing.assert_allclose(np.asarray(new.apply(p, x)),
                                   np.asarray(ref.apply(p, x)),
                                   rtol=1e-5, atol=1e-5)


def test_zdecomposed_conv2d_packed_matches_unpacked():
    """conv_backend='conv2d_packed' (one 3*Cout-wide conv, full-MXU tap
    packing) is exact vs both the unpacked conv2d decomposition and the
    XLA 3-D conv, under both padding modes, sharing the same param tree."""
    from real_robot_nerf_actor_tpu.models.blocks import Conv3DBlock
    x = jax.random.normal(jax.random.key(3), (2, 7, 9, 11, 16))
    for pad in ("zeros", "replicate"):
        ref = Conv3DBlock(8, 3, 1, "lrelu", padding=pad)
        unpacked = Conv3DBlock(8, 3, 1, "lrelu", padding=pad,
                               backend="conv2d")
        packed = Conv3DBlock(8, 3, 1, "lrelu", padding=pad,
                             backend="conv2d_packed")
        p = ref.init(jax.random.key(0), x)
        assert (jax.tree_util.tree_structure(p)
                == jax.tree_util.tree_structure(
                    packed.init(jax.random.key(0), x)))
        got = np.asarray(packed.apply(p, x))
        np.testing.assert_allclose(got, np.asarray(unpacked.apply(p, x)),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(got, np.asarray(ref.apply(p, x)),
                                   rtol=1e-5, atol=1e-5)


def test_zdecomposed_k5_matches_xla():
    """The generalized odd-k z-decomposition (k=5, up0's kernel) is exact
    vs the XLA 3-D conv, packed and unpacked, both padding modes."""
    from real_robot_nerf_actor_tpu.models.blocks import Conv3DBlock
    x = jax.random.normal(jax.random.key(5), (1, 8, 9, 11, 12))
    for pad in ("zeros", "replicate"):
        ref = Conv3DBlock(8, 5, 1, "lrelu", padding=pad)
        p = ref.init(jax.random.key(0), x)
        want = np.asarray(ref.apply(p, x))
        for be in ("conv2d", "conv2d_packed"):
            new = Conv3DBlock(8, 5, 1, "lrelu", padding=pad, backend=be)
            assert (jax.tree_util.tree_structure(p)
                    == jax.tree_util.tree_structure(
                        new.init(jax.random.key(0), x)))
            np.testing.assert_allclose(np.asarray(new.apply(p, x)), want,
                                       rtol=1e-4, atol=1e-5)


def test_upsample_block_backend_matches_xla():
    """Conv3DUpsampleBlock with backend='conv2d_packed' (the up0 lowering
    knob) matches the default-xla block exactly, same param tree."""
    from real_robot_nerf_actor_tpu.models.blocks import Conv3DUpsampleBlock
    x = jax.random.normal(jax.random.key(7), (1, 4, 4, 4, 24))
    ref = Conv3DUpsampleBlock(16, 5, 5, "lrelu", mode="transpose")
    new = Conv3DUpsampleBlock(16, 5, 5, "lrelu", mode="transpose",
                              backend="conv2d_packed")
    p = ref.init(jax.random.key(0), x)
    assert (jax.tree_util.tree_structure(p)
            == jax.tree_util.tree_structure(new.init(jax.random.key(0), x)))
    np.testing.assert_allclose(np.asarray(new.apply(p, x)),
                               np.asarray(ref.apply(p, x)),
                               rtol=1e-4, atol=1e-5)
