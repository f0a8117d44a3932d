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


def shard_params_rule(mesh: Mesh, state_example):
    """Tensor-parallel parameter placement over the 'model' axis, keyed by
    the parameter PATH, not just a last-dim-size heuristic:

      - the PerceiverIO latent table ('latents', (num_latents, latent_dim))
        and positional/feature embedding tables ('pos_emb*', '*embedding*')
        shard their FEATURE axis (the in-model shard_hidden constraints cut
        the matching activations there);
      - dense/conv kernels shard their OUTPUT-channel (last) axis — the
        Megatron column cut; the paired row cut is expressed by the
        in-model constraints (parallel/constraints.py);
      - 1-D leaves (biases, norm scales) and small tables replicate.

    Divisibility by the model-axis size is always required; anything not
    divisible replicates (correct, just not TP-sharded). Returns a
    sharding tree matching `state_example`.
    """
    model_n = mesh.shape["model"]

    def rule(path, x):
        ndim = np.ndim(x)
        shape = np.shape(x)
        if ndim < 2 or model_n <= 1:
            return replicate(mesh)
        names = [getattr(k, "key", getattr(k, "name", str(k)))
                 for k in path]
        path_s = "/".join(str(n) for n in names).lower()
        feature_ok = shape[-1] % model_n == 0 and shape[-1] >= 16
        is_table = any(t in path_s for t in
                       ("latents", "pos_emb", "embedding", "cls_token"))
        if is_table or feature_ok:
            if shape[-1] % model_n == 0:
                return NamedSharding(
                    mesh, P(*([None] * (ndim - 1)), "model"))
        return replicate(mesh)

    return jax.tree_util.tree_map_with_path(rule, state_example)


def data_parallel_shardings(mesh: Mesh, batch_example, params_example):
    """(batch_sharding_tree, param_sharding_tree) for a pjit'd train step:
    batch arrays sharded on their leading axis, params replicated."""
    batch_sh = jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, P("data", *([None] * (np.ndim(x) - 1)))),
        batch_example)
    param_sh = jax.tree_util.tree_map(lambda _: replicate(mesh), params_example)
    return batch_sh, param_sh
