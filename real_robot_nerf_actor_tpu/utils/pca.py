"""PCA dimensionality reduction for teacher feature maps.

Reference behavior: /root/reference/neural_rendering.py:636-646 — when the
renderer's d_embed is smaller than the foundation feature width, the
(B*H*W, D) teacher features are reduced with sklearn PCA(n_components=
d_embed) before being used as the embed-distillation target; the
correspondence dumpers (extract_dino_feature.py) do the same for
visualization.

TPU design: fit via eigendecomposition of the (D, D) feature covariance —
D is a few hundred to a couple thousand, so the eigh is tiny and the only
large op is the (N, D) @ (D, k) projection matmul, which jits onto the
MXU. Component signs follow sklearn's svd_flip convention (the
largest-|coefficient| entry of each component is made positive) so
projections are comparable across fits.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pca_fit(x: jnp.ndarray, n_components: int):
    """x: (N, D). Returns (components (k, D), mean (D,), explained_var (k,))."""
    n, d = x.shape
    mean = jnp.mean(x, axis=0)
    xc = (x - mean).astype(jnp.float32)
    cov = (xc.T @ xc) / (n - 1)
    evals, evecs = jnp.linalg.eigh(cov)           # ascending
    comps = evecs[:, ::-1][:, :n_components].T    # (k, D), descending
    var = evals[::-1][:n_components]
    # svd_flip sign convention: largest-|entry| coefficient positive
    idx = jnp.argmax(jnp.abs(comps), axis=1)
    signs = jnp.sign(comps[jnp.arange(n_components), idx])
    comps = comps * signs[:, None]
    return comps, mean, var


def pca_transform(x: jnp.ndarray, components: jnp.ndarray,
                  mean: jnp.ndarray) -> jnp.ndarray:
    """Project (..., D) features onto (k, D) components -> (..., k)."""
    shp = x.shape
    flat = x.reshape(-1, shp[-1])
    out = (flat - mean).astype(jnp.float32) @ components.T
    return out.reshape(*shp[:-1], components.shape[0])


@jax.jit
def _fit_transform_impl(x, comps, mean):
    return pca_transform(x, comps, mean)


def pca_fit_transform(x: jnp.ndarray, n_components: int) -> jnp.ndarray:
    """sklearn PCA(n).fit_transform equivalent for (..., D) feature maps.

    Flattens leading dims, fits on all vectors, returns (..., n). This is
    the renderer-loss reduction step (neural_rendering.py:640-646): call
    on the teacher feature map before passing it as gt_embed when
    d_embed < the teacher's native width.
    """
    shp = x.shape
    flat = jnp.asarray(x).reshape(-1, shp[-1])
    comps, mean, _ = pca_fit(flat, n_components)
    return pca_transform(flat, comps, mean).reshape(*shp[:-1], n_components)
