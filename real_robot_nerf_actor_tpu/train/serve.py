"""Closed-loop deployment: capture -> voxelize -> policy -> decode -> move.

Reference behavior: /root/reference/val_real_camera_prev.py:811-876 (20
sequential act steps against RealSense + xArm). Hardware is behind the
RobotIO protocol (data/replay.py), so this same loop drives either a real
robot backend or a replay stub. The blocking Open3D safety window is
replaced by an optional `safety_check` callback.

TPU design: one jitted act function (voxelize + PerceiverIO + argmax decode)
— the <50 ms p50 policy path benchmarked in bench.py.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from real_robot_nerf_actor_tpu.data.replay import RobotIO, pad_point_cloud
from real_robot_nerf_actor_tpu.models import PerceiverConfig, PerceiverIO
from real_robot_nerf_actor_tpu.ops import (
    VoxelizerSpec, choose_highest_action, discretize_action, voxelize)
from real_robot_nerf_actor_tpu.ops.geometry import voxel_index_to_point


@dataclasses.dataclass
class ServeConfig:
    coord_bounds: Tuple[float, ...] = (-0.1, -0.3, -0.2, 0.8, 0.7, 0.7)
    rotation_resolution: float = 5.0
    num_steps: int = 20


class PolicyServer:
    def __init__(self, cfg: ServeConfig, model_cfg: PerceiverConfig,
                 voxelizer: VoxelizerSpec, variables, lang_embs: np.ndarray):
        self.cfg = cfg
        self.net = PerceiverIO(model_cfg)
        self.voxelizer = voxelizer
        self.variables = variables
        self.lang = jnp.asarray(lang_embs)[None]
        self.bounds = jnp.asarray(cfg.coord_bounds)
        self.model_cfg = model_cfg

        @jax.jit
        def _act(variables, points, colors, valid, proprio, lang):
            vox = voxelize(points, colors, self.bounds, self.voxelizer,
                           valid=valid)
            out = self.net.apply(variables, vox, proprio, lang)
            q_trans, q_rot_grip, q_coll = out[:3]
            return choose_highest_action(q_trans, q_rot_grip, q_coll,
                                         cfg.rotation_resolution)

        self._act = _act

    def act(self, points: np.ndarray, colors: np.ndarray, valid: np.ndarray,
            proprio: np.ndarray):
        """-> (continuous xyz (3,), rotation deg (3,), gripper_open, collision)."""
        coords, rot_grip, coll = self._act(
            self.variables, jnp.asarray(points)[None], jnp.asarray(colors)[None],
            jnp.asarray(valid)[None], jnp.asarray(proprio)[None], self.lang)
        xyz = np.asarray(voxel_index_to_point(
            coords, self.model_cfg.voxel_size, self.bounds))[0]
        rg = np.asarray(rot_grip)[0]
        rot_deg = (rg[:3] + 1) * self.cfg.rotation_resolution - 180.0
        return xyz, rot_deg.astype(np.float32), int(rg[3]), int(np.asarray(coll)[0, 0])


def run_deployment(server: PolicyServer, robot: RobotIO,
                   safety_check: Optional[Callable] = None,
                   num_steps: Optional[int] = None) -> List[dict]:
    """The capture->infer->move loop; returns the action trace."""
    trace = []
    steps = num_steps if num_steps is not None else server.cfg.num_steps
    for t in range(steps):
        obs = robot.capture_pointcloud()
        pts, cols, valid = pad_point_cloud(obs, server.voxelizer.max_num_coords)
        xyz_p, rot_p, grip_p = robot.get_proprio()
        prev = discretize_action(
            jnp.asarray(xyz_p)[None], jnp.asarray(rot_p)[None],
            jnp.asarray([grip_p]), jnp.ones((1,)), server.bounds,
            server.model_cfg.voxel_size, server.cfg.rotation_resolution)
        proprio = np.concatenate([
            np.asarray(prev.trans[0], np.float32),
            np.asarray(prev.rot_grip[0], np.float32)])
        xyz, rot_deg, grip, coll = server.act(pts, cols, valid, proprio)
        action = {"step": t, "xyz": xyz, "rotation": rot_deg,
                  "gripper_open": grip, "ignore_collision": coll}
        if safety_check is not None and not safety_check(action, obs):
            action["aborted"] = True
            trace.append(action)
            break
        robot.move_to(xyz, rot_deg, float(grip))
        trace.append(action)
    return trace
