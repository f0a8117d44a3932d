"""Image data augmentation (reference src/algorithms/augmentations.py +
color_jitter.py): random crop-shift, color jitter, grayscale — as pure
functions with explicit PRNG keys, vmappable over batches."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def random_shift(key: jax.Array, images: jnp.ndarray, pad: int = 4
                 ) -> jnp.ndarray:
    """Random crop-shift (the standard pixel-RL aug): pad by `pad` with edge
    replication, crop back at a random offset. images: (B, H, W, C)."""
    b, h, w, c = images.shape
    padded = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                     mode="edge")
    k1, k2 = jax.random.split(key)
    ox = jax.random.randint(k1, (b,), 0, 2 * pad + 1)
    oy = jax.random.randint(k2, (b,), 0, 2 * pad + 1)

    def crop(img, oy, ox):
        return jax.lax.dynamic_slice(img, (oy, ox, 0), (h, w, c))

    return jax.vmap(crop)(padded, oy, ox)


def color_jitter(key: jax.Array, images: jnp.ndarray,
                 brightness: float = 0.4, contrast: float = 0.4,
                 saturation: float = 0.4) -> jnp.ndarray:
    """Per-image brightness/contrast/saturation jitter, images in [0, 1]."""
    b = images.shape[0]
    kb, kc, ks = jax.random.split(key, 3)
    fb = 1.0 + jax.random.uniform(kb, (b, 1, 1, 1), minval=-brightness,
                                  maxval=brightness)
    fc = 1.0 + jax.random.uniform(kc, (b, 1, 1, 1), minval=-contrast,
                                  maxval=contrast)
    fs = 1.0 + jax.random.uniform(ks, (b, 1, 1, 1), minval=-saturation,
                                  maxval=saturation)
    x = images * fb
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    x = (x - mean) * fc + mean
    gray = jnp.mean(x, axis=-1, keepdims=True)
    x = (x - gray) * fs + gray
    return jnp.clip(x, 0.0, 1.0)


def random_grayscale(key: jax.Array, images: jnp.ndarray, p: float = 0.2
                     ) -> jnp.ndarray:
    b = images.shape[0]
    coin = jax.random.uniform(key, (b, 1, 1, 1)) < p
    gray = jnp.broadcast_to(jnp.mean(images, -1, keepdims=True), images.shape)
    return jnp.where(coin, gray, images)
