"""Data-parallel training convenience: wrap any trainer's step for a mesh.

The trainers' jitted steps are already shard-transparent (pure functions of
(state, batch, rng)); this helper pins the shardings — batch split over the
'data' axis, state replicated (or tensor-sharded via a param rule) — so a
multi-chip run is one call, matching SURVEY §2.3's dp/tp plan.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_params_rule(mesh: Mesh, min_size: int = 1 << 16):
    """Tensor-parallel rule: shard the output dim of large kernels over
    'model'; everything else replicated."""
    model_axis = mesh.shape["model"]

    def rule(x):
        if (hasattr(x, "ndim") and x.ndim >= 2 and model_axis > 1
                and x.shape[-1] % model_axis == 0 and x.size >= min_size):
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1)), "model"))
        return NamedSharding(mesh, P())

    return rule


def make_data_parallel_step(train_step: Callable, mesh: Mesh,
                            state_example, batch_example,
                            tensor_parallel: bool = False):
    """Returns (jitted_step, place_state, place_batch).

    jitted_step(state, batch, rng) runs SPMD over the mesh: batch rows
    split over 'data' (XLA all-reduces the gradients), params replicated —
    or tensor-sharded over 'model' when tensor_parallel.
    """
    if tensor_parallel:
        rule = shard_params_rule(mesh)
        state_sh = jax.tree_util.tree_map(rule, state_example)
    else:
        state_sh = jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), state_example)
    batch_sh = jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, P("data", *([None] * (np.ndim(x) - 1)))),
        batch_example)

    def _step(state, batch, rng):
        if tensor_parallel:
            # activate the in-model shard_hidden constraints for this trace
            from real_robot_nerf_actor_tpu.parallel.constraints import (
                tensor_parallel as tp_ctx)
            with tp_ctx(mesh):
                return train_step(state, batch, rng)
        return train_step(state, batch, rng)

    step = jax.jit(_step, in_shardings=(state_sh, batch_sh, None),
                   out_shardings=(state_sh, None))

    def place_state(state):
        return jax.device_put(state, state_sh)

    def place_batch(batch):
        return jax.device_put(batch, batch_sh)

    return step, place_state, place_batch
