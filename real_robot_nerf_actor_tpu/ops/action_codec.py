"""Action codec: continuous gripper pose <-> discrete (voxel index, euler
bins, grip, collision); one-hot expert targets; argmax decode.

Vectorized (no per-batch Python loops) so it lives under jit.

Parity targets:
  - get_action:                 /root/reference/train_peract_single_kitchen_single_task.py:341-357
  - _get_one_hot_expert_actions: same file :659-702
  - _argmax_3d / choose_highest_action: same file :705-726
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from real_robot_nerf_actor_tpu.ops.geometry import point_to_voxel_index


class DiscreteAction(NamedTuple):
    trans: jnp.ndarray       # (B, 3) int32 voxel indices
    rot_grip: jnp.ndarray    # (B, 4) int32 [rx_bin, ry_bin, rz_bin, grip]
    collision: jnp.ndarray   # (B, 1) int32


def discretize_action(xyz: jnp.ndarray, rotation_deg: jnp.ndarray, gripper_open: jnp.ndarray,
                      ignore_collisions: jnp.ndarray, coord_bounds: jnp.ndarray,
                      voxel_size: int, rotation_resolution: float = 5.0) -> DiscreteAction:
    """Continuous pose -> discrete action indices.

    rotation_deg in degrees in [-180, 180); bin = int((r+180)/res) - 1,
    matching the reference exactly (including its off-by-one bin shift).
    """
    trans = point_to_voxel_index(xyz, voxel_size, coord_bounds)
    rot_bins = ((rotation_deg + 180.0) / rotation_resolution).astype(jnp.int32) - 1
    grip = gripper_open.astype(jnp.int32)
    rot_grip = jnp.concatenate([rot_bins, grip[..., None]], axis=-1)
    coll = ignore_collisions.astype(jnp.int32)[..., None]
    return DiscreteAction(trans=trans, rot_grip=rot_grip, collision=coll)


def one_hot_expert_actions(action: DiscreteAction, voxel_size: int,
                           num_rotation_classes: int = 72):
    """Build one-hot targets. Returns dict of one-hot arrays:
      trans: (B, voxel_size**3), rot_x/y/z: (B, R), grip: (B, 2), collision: (B, 2).
    """
    b = action.trans.shape[0]
    flat_idx = (action.trans[:, 0] * voxel_size * voxel_size
                + action.trans[:, 1] * voxel_size
                + action.trans[:, 2])
    trans_oh = jnp.zeros((b, voxel_size ** 3), dtype=jnp.int32).at[
        jnp.arange(b), flat_idx].set(1)
    rot = action.rot_grip[:, :3]
    rot_oh = jnp.eye(num_rotation_classes, dtype=jnp.int32)[rot]  # (B, 3, R)
    grip_oh = jnp.eye(2, dtype=jnp.int32)[action.rot_grip[:, 3]]
    coll_oh = jnp.eye(2, dtype=jnp.int32)[action.collision[:, 0]]
    return {
        "trans": trans_oh,
        "rot_x": rot_oh[:, 0],
        "rot_y": rot_oh[:, 1],
        "rot_z": rot_oh[:, 2],
        "grip": grip_oh,
        "collision": coll_oh,
    }


def argmax_3d(q_trans: jnp.ndarray) -> jnp.ndarray:
    """(B, D, H, W[, 1-channel leading dims handled by caller]) -> (B, 3) indices.

    Accepts (B, D, H, W) or (B, D, H, W, 1); returns int32 (B, 3).
    """
    if q_trans.ndim == 5:
        q_trans = q_trans[..., 0]
    b, d, h, w = q_trans.shape
    flat = q_trans.reshape(b, -1)
    idx = jnp.argmax(flat, axis=-1)
    return jnp.stack([idx // (h * w), (idx // w) % h, idx % w], axis=-1).astype(jnp.int32)


def choose_highest_action(q_trans, q_rot_grip, q_collision, rotation_resolution: float = 5.0):
    """Argmax decode of all heads.

    q_trans: (B, D, H, W) or (B, D, H, W, 1); q_rot_grip: (B, 3R+2);
    q_collision: (B, 2). Returns (coords (B,3), rot_grip (B,4), collision (B,1)).
    """
    coords = argmax_3d(q_trans)
    r = int(360.0 // rotation_resolution)
    q_rot = q_rot_grip[:, : 3 * r].reshape(-1, 3, r)
    rot_idx = jnp.argmax(q_rot, axis=-1)
    grip_idx = jnp.argmax(q_rot_grip[:, 3 * r:], axis=-1, keepdims=True)
    rot_grip = jnp.concatenate([rot_idx, grip_idx], axis=-1).astype(jnp.int32)
    coll = jnp.argmax(q_collision[:, -2:], axis=-1, keepdims=True).astype(jnp.int32)
    return coords, rot_grip, coll
