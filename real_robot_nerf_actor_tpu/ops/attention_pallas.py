"""Pallas TPU flash attention (forward) for the PerceiverIO attention stack.

The reference materializes full (latents x tokens) score matrices in HBM
(einsum + softmax, train_peract_single_kitchen_single_task.py:124-138; it
even reaches for xformers memory-efficient attention when available,
attention.py:15-20). This kernel computes softmax(QK^T)V with the online
softmax so the scores tile never leaves VMEM — the 2048x8077 cross-attention
and the 2048x2048 self-attention stacks stream through HBM exactly once.

Layout: q (B, H, Nq, D), k/v (B, H, Nk, D). Nk may be ragged: pass the true
`kv_len` and pad k/v to a block multiple — out-of-range keys are masked.
Falls back to interpret mode off-TPU (tests).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  block_k: int, kv_len: int, sm_scale: float,
                  num_kv_blocks: int):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    q = q_ref[0]                     # (block_q, d)
    k = k_ref[0]                     # (block_k, d)
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale  # (block_q, block_k)

    # mask padded keys beyond kv_len
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_k
    s = jnp.where(col < kv_len, s, _MASK_VALUE)

    m_prev = m_scr[...]
    l_prev = l_scr[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

    m_scr[...] = m_next
    l_scr[...] = l_next
    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        l = l_scr[...]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    sm_scale: Optional[float] = None,
                    block_q: int = 128, block_k: int = 512,
                    interpret: Optional[bool] = None) -> jnp.ndarray:
    """softmax(q k^T * sm_scale) v with O(1) HBM score traffic.

    q: (B, H, Nq, D); k, v: (B, H, Nk, D). Returns (B, H, Nq, D), q dtype.
    """
    b, h, nq, d = q.shape
    nk = k.shape[2]
    if sm_scale is None:
        sm_scale = d ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    block_q = min(block_q, max(8, nq))
    block_k = min(block_k, max(128, nk))

    # pad to block multiples (padded keys masked by kv_len; padded queries
    # dropped on return)
    nq_p = -(-nq // block_q) * block_q
    nk_p = -(-nk // block_k) * block_k
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, nq_p - nq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, nk_p - nk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, nk_p - nk), (0, 0)))
    bh = b * h
    qp = qp.reshape(bh, nq_p, d)
    kp = kp.reshape(bh, nk_p, d)
    vp = vp.reshape(bh, nk_p, d)

    num_kv_blocks = nk_p // block_k
    grid = (bh, nq_p // block_q, num_kv_blocks)

    kernel = functools.partial(
        _flash_kernel, block_k=block_k, kv_len=nk, sm_scale=sm_scale,
        num_kv_blocks=num_kv_blocks)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, nq_p, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, nq_p, d)[:, :, :nq]


def reference_attention(q, k, v, sm_scale: Optional[float] = None):
    """Naive attention for correctness checks."""
    d = q.shape[-1]
    if sm_scale is None:
        sm_scale = d ** -0.5
    s = jnp.einsum("bhid,bhjd->bhij", q, k).astype(jnp.float32) * sm_scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", p.astype(v.dtype), v)
