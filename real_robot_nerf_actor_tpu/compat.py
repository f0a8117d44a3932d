"""Reference-compatible public API shims.

BASELINE.json's north star keeps the reference's public entry-point
signatures (`VoxelGrid.coords_to_bounding_voxel_grid`, `gen_rays`,
`choose_highest_action`, ...) so a reference user can switch with minimal
edits. These wrappers adapt the reference's torch-style conventions
(channel-first outputs, stateful voxelizer object) onto the functional
JAX core. New code should use the functional APIs directly.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from real_robot_nerf_actor_tpu.ops import voxelize as _voxelize
from real_robot_nerf_actor_tpu.ops import gen_rays as _gen_rays
from real_robot_nerf_actor_tpu.ops import choose_highest_action as _choose
from real_robot_nerf_actor_tpu.ops.voxelize import VoxelizerSpec


class VoxelGrid:
    """Signature-compatible with the reference voxelizer
    (/root/reference/voxel_grid_real.py:15-233); `device` is accepted and
    ignored (placement is JAX's job)."""

    def __init__(self, coord_bounds, voxel_size: int, device=None,
                 batch_size: int = 1, feature_size: int = 3,
                 max_num_coords: int = 220000):
        self._bounds = jnp.asarray(np.asarray(coord_bounds, np.float32))
        self._spec = VoxelizerSpec(voxel_size=voxel_size,
                                   feature_size=feature_size,
                                   max_num_coords=max_num_coords)
        self._batch_size = batch_size

    def coords_to_bounding_voxel_grid(self, coords, coord_features=None,
                                      coord_bounds=None, only_features=False):
        """coords (B, N, 3), coord_features (B, N, F) -> channel-LAST
        (B, V, V, V, 7+F) float array (the reference returns the same
        layout before its caller permutes to channel-first)."""
        coords = jnp.asarray(np.asarray(coords, np.float32))
        if coord_features is None:
            coord_features = jnp.zeros(coords.shape, coords.dtype)
        else:
            coord_features = jnp.asarray(np.asarray(coord_features, np.float32))
        bounds = (self._bounds if coord_bounds is None
                  else jnp.asarray(np.asarray(coord_bounds, np.float32)))
        if bounds.ndim > 1:
            bounds = bounds[0]
        n = coords.shape[1]
        m = self._spec.max_num_coords
        if n < m:
            pad = m - n
            valid = jnp.concatenate(
                [jnp.ones((coords.shape[0], n), bool),
                 jnp.zeros((coords.shape[0], pad), bool)], axis=1)
            coords = jnp.pad(coords, ((0, 0), (0, pad), (0, 0)))
            coord_features = jnp.pad(coord_features, ((0, 0), (0, pad), (0, 0)))
        else:
            coords = coords[:, :m]
            coord_features = coord_features[:, :m]
            valid = jnp.ones((coords.shape[0], m), bool)
        vox = _voxelize(coords, coord_features, bounds, self._spec, valid=valid)
        if only_features:
            return vox[..., :-7]
        return vox


def gen_rays(poses, width, height, focal, z_near, z_far, c=None):
    """utils.gen_rays-compatible (utils.py:477-507)."""
    return _gen_rays(jnp.asarray(np.asarray(poses, np.float32)), width,
                     height, jnp.asarray(np.asarray(focal, np.float32)),
                     z_near, z_far, c=c)


def choose_highest_action(q_trans, q_rot_grip, q_collision,
                          rotation_resolution=5.0):
    """Reference argmax decode (train_peract_...py:712-726); accepts the
    torch channel-first (B, 1, V, V, V) q_trans layout too."""
    q_trans = jnp.asarray(np.asarray(q_trans))
    if q_trans.ndim == 5 and q_trans.shape[1] == 1:
        q_trans = q_trans[:, 0]
    return _choose(q_trans, jnp.asarray(np.asarray(q_rot_grip)),
                   jnp.asarray(np.asarray(q_collision)), rotation_resolution)
