"""Device mesh + sharding specs.

The reference scales by chunking within one GPU (DataParallel over the ray
axis, SURVEY.md §2.3); here parallelism is declarative: a
`jax.sharding.Mesh` with axes

  data   — batch / ray axis (ICI within a pod slice, DCN across hosts)
  model  — reserved tensor-parallel axis for the PerceiverIO latent and
           ResnetFC hidden dims (the models are small enough that `model`
           is usually 1, but the specs are wired so scaling is a config
           change, not a code change)

All collectives are XLA-inserted from NamedSharding constraints; there is no
hand-written NCCL/MPI analog by design.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    data: int = -1   # -1 = all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> "MeshSpec":
        if self.data == -1:
            assert n_devices % self.model == 0
            return MeshSpec(data=n_devices // self.model, model=self.model)
        return self


def make_mesh(spec: MeshSpec = MeshSpec(), devices: Optional[Sequence] = None
              ) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    spec = spec.resolve(len(devices))
    arr = np.asarray(devices).reshape(spec.data, spec.model)
    return Mesh(arr, axis_names=("data", "model"))


def shard_batch(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over 'data' (batch or flat ray axis)."""
    return NamedSharding(mesh, P("data"))


def shard_rays(mesh: Mesh) -> NamedSharding:
    """(R, 8) ray arrays: rays over 'data'."""
    return NamedSharding(mesh, P("data", None))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_parallel_shardings(mesh: Mesh, batch_example, params_example):
    """(batch_sharding_tree, param_sharding_tree) for a pjit'd train step:
    batch arrays sharded on their leading axis, params replicated."""
    batch_sh = jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, P("data", *([None] * (np.ndim(x) - 1)))),
        batch_example)
    param_sh = jax.tree_util.tree_map(lambda _: replicate(mesh), params_example)
    return batch_sh, param_sh
