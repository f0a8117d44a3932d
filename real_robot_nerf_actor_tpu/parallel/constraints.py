"""Tensor-parallel activation sharding constraints.

SURVEY §2.3 TP row: shard the PerceiverIO FF/attention inner dims and the
ResnetFC hidden dim over the mesh 'model' axis. The reference has no TP at
all; on TPU it is declarative — models call `shard_hidden` at Megatron-
style cut points (column-parallel producer -> sharded activation ->
row-parallel consumer) and XLA inserts the single psum per block.

The constraints are no-ops unless a `tensor_parallel(mesh)` context is
active when the step is *traced*, so single-device paths compile exactly as
before. `make_data_parallel_step(..., tensor_parallel=True)` activates the
context for its trace.
"""
from __future__ import annotations

import contextlib
import threading
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_STATE = threading.local()


def current_tp() -> Optional[Tuple[Mesh, str]]:
    return getattr(_STATE, "ctx", None)


@contextlib.contextmanager
def tensor_parallel(mesh: Mesh, axis: str = "model"):
    """Activate TP constraints over ``mesh[axis]`` for code traced inside."""
    prev = getattr(_STATE, "ctx", None)
    _STATE.ctx = (mesh, axis) if mesh.shape.get(axis, 1) > 1 else None
    try:
        yield
    finally:
        _STATE.ctx = prev


def shard_hidden(x: jax.Array, dim: int = -1) -> jax.Array:
    """Constrain activation axis ``dim`` to be sharded over the active TP
    axis. No-op without an active context or when the axis doesn't divide."""
    ctx = current_tp()
    if ctx is None:
        return x
    mesh, axis = ctx
    size = mesh.shape[axis]
    d = dim % x.ndim
    if x.shape[d] % size != 0:
        return x
    spec = [None] * x.ndim
    spec[d] = axis
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def replicated(x: jax.Array) -> jax.Array:
    """Constrain x to be fully replicated (the row-parallel output point)."""
    ctx = current_tp()
    if ctx is None:
        return x
    mesh, _ = ctx
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P()))
