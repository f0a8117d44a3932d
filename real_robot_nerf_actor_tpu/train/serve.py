"""Closed-loop deployment: capture -> voxelize -> policy -> decode -> move.

Reference behavior: /root/reference/val_real_camera_prev.py:811-876 (20
sequential act steps against RealSense + xArm). Hardware is behind the
RobotIO protocol (data/replay.py), so this same loop drives either a real
robot backend or a replay stub. The blocking Open3D safety window is
replaced by an optional `safety_check` callback.

TPU design — the control step is ONE device dispatch:
  - `PolicyServer.act` jits the ENTIRE step: proprio discretization,
    scatter voxelization, the PerceiverIO forward, argmax decode AND the
    voxel-index -> continuous-pose conversion. (An earlier design paid two
    dispatches per control step — a separate discretize_action call in the
    loop — which doubles the per-action host<->device round-trip cost; the
    reference's loop similarly recomputes proprio on host,
    val_real_camera_prev.py:822-830.)
  - `run_deployment_scan` additionally runs a whole recorded horizon as a
    device-side lax.scan: per-action cost equals the device step time with
    the dispatch round trip amortized across the horizon — the replay
    validation mode bench.py reports as serve_scan_ms_per_action.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from real_robot_nerf_actor_tpu.data.replay import (
    ReplayStep, RobotIO, pad_point_cloud)
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

        def _step(variables, points, colors, valid, prop_xyz, prop_rot,
                  prop_grip, lang):
            """The whole control step, batch axis 1: raw proprio in,
            continuous action out."""
            prev = discretize_action(
                prop_xyz, prop_rot, prop_grip, jnp.ones_like(prop_grip),
                self.bounds, model_cfg.voxel_size, cfg.rotation_resolution)
            proprio = jnp.concatenate(
                [prev.trans.astype(jnp.float32),
                 prev.rot_grip.astype(jnp.float32)], axis=-1)
            vox = voxelize(points, colors, self.bounds, self.voxelizer,
                           valid=valid)
            out = self.net.apply(variables, vox, proprio, lang)
            q_trans, q_rot_grip, q_coll = out[:3]
            coords, rot_grip, coll = choose_highest_action(
                q_trans, q_rot_grip, q_coll, cfg.rotation_resolution)
            xyz = voxel_index_to_point(coords, model_cfg.voxel_size,
                                       self.bounds)
            rot_deg = ((rot_grip[:, :3].astype(jnp.float32) + 1.0)
                       * cfg.rotation_resolution - 180.0)
            # ONE packed (B, 8) row [xyz, rot_deg, grip, coll]: the action
            # crosses host<->device as a single array, so a served step is
            # exactly one dispatch + one result fetch (four separate
            # fetches cost four round trips on a high-latency link)
            return jnp.concatenate(
                [xyz, rot_deg, rot_grip[:, 3:4].astype(jnp.float32),
                 coll[:, :1].astype(jnp.float32)], axis=-1)

        self._step = _step
        # act() path: batching happens INSIDE the jit so a served step is
        # one program dispatch with no per-input reshape dispatches
        self._act = jax.jit(
            lambda v, p, c, vl, px, pr, pg, lang: _step(
                v, p[None], c[None], vl[None], px[None], pr[None],
                pg[None], lang)[0])

        @jax.jit
        def _act_scan(variables, points, colors, valid, prop_xyz, prop_rot,
                      prop_grip, lang):
            """Replay horizon as ONE device program (leading axis T)."""
            def body(_, obs):
                p, c, v, px, pr, pg = obs
                out = _step(variables, p[None], c[None], v[None], px[None],
                            pr[None], pg[None], lang)
                return (), out[0]

            _, outs = jax.lax.scan(
                body, (), (points, colors, valid, prop_xyz, prop_rot,
                           prop_grip))
            return outs

        self._act_scan = _act_scan

    def act(self, points: np.ndarray, colors: np.ndarray, valid: np.ndarray,
            proprio_xyz: np.ndarray, proprio_rot: np.ndarray,
            proprio_grip: float):
        """One control step, ONE device dispatch.
        -> (continuous xyz (3,), rotation deg (3,), gripper_open, collision).
        """
        packed = np.asarray(self._act(
            self.variables, points, colors, valid,
            np.asarray(proprio_xyz, np.float32),
            np.asarray(proprio_rot, np.float32),
            np.float32(proprio_grip), self.lang))
        return (packed[:3], packed[3:6], int(packed[6]), int(packed[7]))


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
        xyz, rot_deg, grip, coll = server.act(pts, cols, valid, xyz_p, rot_p,
                                              grip_p)
        action = {"step": t, "xyz": xyz, "rotation": rot_deg,
                  "gripper_open": grip, "ignore_collision": coll}
        if safety_check is not None and not safety_check(action, obs):
            action["aborted"] = True
            trace.append(action)
            break
        robot.move_to(xyz, rot_deg, float(grip))
        trace.append(action)
    return trace


def run_deployment_scan(server: PolicyServer, steps: Sequence[ReplayStep],
                        robot: Optional[RobotIO] = None) -> List[dict]:
    """Replay-validation deployment: the whole recorded horizon runs as one
    jitted lax.scan on device (per-action latency = device step time; the
    host<->device round trip is paid once for the horizon, not per action).

    Semantics match run_deployment over a ReplayRobotIO exactly — the
    replayed observations are fixed, so actions are independent given the
    recording (the real-robot loop stays sequential by nature; this mode is
    for validating recorded horizons at device speed). If `robot` is given,
    the decoded commands are replayed into it (move_to per step).
    """
    pts, cols, valid, pxyz, prot, pgrip = [], [], [], [], [], []
    for s in steps:
        p, c, v = pad_point_cloud(s.observation,
                                  server.voxelizer.max_num_coords)
        pts.append(p)
        cols.append(c)
        valid.append(v)
        pxyz.append(np.asarray(s.proprio_xyz, np.float32))
        prot.append(np.asarray(s.proprio_rot, np.float32))
        pgrip.append(np.float32(s.proprio_grip))
    packed = np.asarray(server._act_scan(
        server.variables, jnp.asarray(np.stack(pts)),
        jnp.asarray(np.stack(cols)), jnp.asarray(np.stack(valid)),
        jnp.asarray(np.stack(pxyz)), jnp.asarray(np.stack(prot)),
        jnp.asarray(np.stack(pgrip)), server.lang))   # (T, 8), one fetch
    xyz, rot_deg = packed[:, :3], packed[:, 3:6]
    grip, coll = packed[:, 6], packed[:, 7]
    trace = []
    for t in range(len(steps)):
        action = {"step": t, "xyz": xyz[t], "rotation": rot_deg[t],
                  "gripper_open": int(grip[t]),
                  "ignore_collision": int(coll[t])}
        if robot is not None:
            robot.move_to(xyz[t], rot_deg[t], float(grip[t]))
        trace.append(action)
    return trace
