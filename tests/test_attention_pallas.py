"""Pallas flash attention vs naive attention (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from real_robot_nerf_actor_tpu.ops.attention_pallas import (
    flash_attention, reference_attention)


@pytest.mark.parametrize("shape", [
    (1, 1, 128, 64),          # single head, aligned
    (2, 4, 256, 64),          # multi head
    (1, 1, 200, 64),          # ragged q
    (1, 2, 128, 128),         # wide head
])
def test_flash_matches_reference(shape):
    b, h, n, d = shape
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(k1, (b, h, n, d))
    k = jax.random.normal(k2, (b, h, n, d))
    v = jax.random.normal(k3, (b, h, n, d))
    got = flash_attention(q, k, v, block_q=128, block_k=128)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_flash_cross_attention_ragged_kv():
    """Perceiver shape: 2048 latents attending to 8077 ragged tokens."""
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    nq, nk, d = 256, 1037, 64  # scaled-down ragged cross shape
    q = jax.random.normal(k1, (1, 1, nq, d))
    k = jax.random.normal(k2, (1, 1, nk, d))
    v = jax.random.normal(k3, (1, 1, nk, d))
    got = flash_attention(q, k, v, block_q=128, block_k=256)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_flash_bf16_inputs():
    k1, k2, k3 = jax.random.split(jax.random.key(2), 3)
    q = jax.random.normal(k1, (1, 2, 128, 64), jnp.bfloat16)
    k = jax.random.normal(k2, (1, 2, 128, 64), jnp.bfloat16)
    v = jax.random.normal(k3, (1, 2, 128, 64), jnp.bfloat16)
    got = flash_attention(q, k, v)
    want = reference_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                               v.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               rtol=3e-2, atol=3e-2)
