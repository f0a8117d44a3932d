"""Demonstration generation + keyframe buffers for the sim suite.

Reference behavior:
  - gen_demonstration_keyframe.py:36-200: roll out a trained policy, store
    rgb/depth/pointcloud/transitions per trajectory, keep successes
  - gen_nerf_data.py:20-72: random policy + orbiting camera -> per-scene
    multi-view images + camera poses for NeRF training
  - utils_keyframe.py:88-139 KeyframeBuffer: keyframe discovery (gripper
    change + stopping points) over stored trajectories

A scripted expert replaces the pretrained SAC policies so demo generation
is hermetic.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from real_robot_nerf_actor_tpu.data.scene_dataset import Scene
from real_robot_nerf_actor_tpu.envs.base import XArmSimEnv
from real_robot_nerf_actor_tpu.envs.rendering import (
    RaycastRenderer, camera_pose)


def scripted_expert(env: XArmSimEnv) -> np.ndarray:
    """A simple goal-seeking expert for the bundled tasks: move toward the
    task-relevant point, close the gripper near objects, lift when grasped."""
    task = env.task
    ee = env.ee_pos()
    name = task.name
    if name in ("reach", "reach_wall"):
        import mujoco
        mid = env.model.body_mocapid[
            mujoco.mj_name2id(env.model, mujoco.mjtObj.mjOBJ_BODY, "target")]
        delta = env.data.mocap_pos[mid] - ee
        return np.clip(np.concatenate([delta * 12, [-1.0]]), -1, 1)
    # the graspable body: most tasks name it "object"; peg_insert names it
    # "peg", golf names it "ball" (mj_name2id returns -1 for a missing
    # name, which silently indexes the LAST body — guard instead of
    # try/except). The golf lookup matters: falling through to obj = ee
    # makes the push branch chase the hand's own position and the ball
    # never moves (round-5 forensics: 0% expert success, ball at rest).
    import mujoco
    obj_name = {"peg_insert": "peg", "golf": "ball"}.get(name, "object")
    if mujoco.mj_name2id(env.model, mujoco.mjtObj.mjOBJ_BODY, obj_name) >= 0:
        obj = task.body_pos(env, obj_name)
    else:
        obj = ee
    # the fingers hang ~0.035 below the hand center; a hand height of
    # obj_z + 0.035 centers them on the object
    grasp_z = obj[2] + 0.035
    hover = np.array([obj[0], obj[1], grasp_z + 0.10])
    grasping = env.gripper_open() < 0.55
    grasped = grasping and abs(ee[2] - grasp_z) < 0.05 \
        and np.linalg.norm(ee[:2] - obj[:2]) < 0.03
    if name == "peg_insert":
        # staged pick -> transport -> threaded descent (the reference's
        # pick-then-insert stages, env/robot/peg_insert.py:37-120). The peg
        # is a tall thin cylinder: grip just below its TOP (palm clear of
        # the shaft), lift gently, and require an ACTUAL hold (peg tracks
        # the hand) before transporting — a pose-only grasp proxy happily
        # carries air while the peg lies flung on the table.
        lying = obj[2] < 0.035
        grasp_z = obj[2] + (0.035 if lying else 0.06)
        g = env.gripper_open()
        xy_err = float(np.linalg.norm(ee[:2] - obj[:2]))
        # a REAL pinch = both finger geoms in contact with the shaft (the
        # finger gap equals the 24 mm peg diameter exactly at open~0.17,
        # so no joint-reading band separates stall from transit)
        shaft = mujoco.mj_name2id(env.model, mujoco.mjtObj.mjOBJ_GEOM,
                                  "peg_shaft")
        fids = {mujoco.mj_name2id(env.model, mujoco.mjtObj.mjOBJ_GEOM, n)
                for n in ("lfinger", "rfinger")}
        touch = set()
        for i in range(env.data.ncon):
            c = env.data.contact[i]
            pair = {int(c.geom1), int(c.geom2)}
            if shaft in pair:
                touch |= pair & fids
        # hold LATCH with hysteresis (expert-side state on the task object):
        # establish on a verified two-finger pinch; maintain while the
        # gripper stays closed-ish and the peg hangs anywhere under the
        # hand. The old stateless predicate flickered for one step when the
        # transported peg swung past its xy window and the expert opened
        # the gripper mid-air (round-5 trace) — a dropped cylinder then
        # rolls out of the workspace.
        contact_hold = len(touch) == 2 and g < 0.5
        latched = getattr(task, "_expert_hold", False)
        if contact_hold:
            latched = True
        elif not (g < 0.65 and obj[2] > 0.015
                  and xy_err < 0.10 and -0.02 < (ee[2] - obj[2]) < 0.20):
            latched = False
        task._expert_hold = latched
        holding = latched
        if holding and (obj[2] > 0.08 or getattr(task, "_picked", False)):
            hole = task._site(env, "hole_goal")
            head = task._site(env, "peg_head")
            dxy = float(np.linalg.norm(ee[:2] - hole[:2]))
            # transport height: the gripped peg's head hangs ~0.11 under
            # the hand; the hole walls top out at z=0.10, so the hand
            # stays above ~0.23 while translating. Every held-phase move
            # is speed-capped — slower than the free-space approach — so
            # the hanging peg doesn't pendulum out of the pinch.
            if ee[2] < 0.22 and dxy > 0.03:
                return np.array([0, 0, 0.25, 1.0], np.float32)  # gentle
            if dxy > 0.005:
                # 1.2 mm/step: every mocap step is an impulsive jerk on
                # the welded hand and the 0.08 kg peg slips a little at
                # each one — measured slip-free only at this crawl
                # (cap 0.1 drops the peg mid-transport, cap 0.05 is 50/50)
                tgt = np.array([hole[0], hole[1], 0.24])
                return np.clip(np.concatenate([(tgt - ee) * 4, [1.0]]),
                               -0.03, 0.03).astype(np.float32) \
                    + np.array([0, 0, 0, 0.97], np.float32)
            # aligned over the channel: slow centered descent until the
            # peg head is inside the channel mouth, then RELEASE — the
            # fingers (36 mm outer span) cannot follow the peg into the
            # 30 mm opening; the walls guide the free-falling peg the rest
            # of the way to the goal (reference peg_insert.py:182-185
            # success = head near the in-hole goal site).
            if head[2] > 0.075 and ee[2] > 0.178:
                return np.clip(np.array(
                    [(hole[0] - ee[0]) * 8, (hole[1] - ee[1]) * 8,
                     -0.12, 1.0]), -1, 1)
            task._expert_hold = False
            return np.array([0, 0, 0.2, -1.0], np.float32)      # release
        if holding:
            return np.array([0, 0, 0.25, 1.0], np.float32)      # lift
        hole = task._site(env, "hole_goal")
        if (np.linalg.norm(obj[:2] - hole[:2]) < 0.02 and obj[2] < 0.07):
            # released into the channel: hover clear, let it settle
            return np.array([0, 0, 0.3, -1.0], np.float32)
        aligned = xy_err < 0.01 and ee[2] <= grasp_z + 0.015
        if aligned and g < 0.05:
            # closed on air: reopen and rise a little, retry the grasp
            return np.array([0, 0, 0.3, -1.0], np.float32)
        if aligned:
            return np.array([0, 0, 0, 1.0], np.float32)         # close
        if xy_err > 0.01:
            tgt = np.array([obj[0], obj[1], grasp_z + 0.10]) \
                if ee[2] < grasp_z + 0.05 else np.array(
                    [obj[0], obj[1], ee[2]])
            return np.clip(np.concatenate([(tgt - ee) * 6, [-1.0]]), -1, 1)
        return np.clip(np.concatenate(
            [(obj[:2] - ee[:2]) * 6, [(grasp_z - ee[2]) * 4], [-1.0]]),
            -1, 1)
    if name in ("lift", "hammer", "pick_place", "stacking", "shelf_placing",
                "peg_in_box"):
        if grasped:
            return np.array([0, 0, 1.0, 1.0], np.float32)
        if np.linalg.norm(ee[:2] - obj[:2]) > 0.012:
            # approach from above, never sweeping through the object
            tgt = hover if ee[2] < grasp_z + 0.06 else \
                np.array([obj[0], obj[1], ee[2]])
            return np.clip(np.concatenate([(tgt - ee) * 8, [-1.0]]), -1, 1)
        if ee[2] > grasp_z + 0.01:
            return np.clip(np.concatenate(
                [[0, 0, (grasp_z - ee[2]) * 8], [-1.0]]), -1, 1)
        return np.array([0, 0, 0, 1.0], np.float32)
    if name == "golf":
        # Corner-guided dribble, stateless (Markovian on {ee, ball,
        # ball_vel, hole} — all observable, GolfTask.extra_obs carries the
        # planar ball velocity). Striking is hopeless here: the fingers
        # are axis-aligned boxes, so a struck ball departs along a box
        # FACE normal (pure +-x/+-y), never along the diagonal aim line,
        # and the hole subtends only ~3.6 deg. Instead the expert pushes
        # the heavy reference-parity ball (golf.xml:40, mass 2) with the
        # finger-box CORNER facing the hole — sphere-vs-edge contact
        # normals point from the corner to the ball center, so tracking
        # the corner on the ball->hole line steers the ball continuously.
        # Phases (each a pure function of the state):
        #   push   — corner behind the ball on the aim line: light-contact
        #            feedforward along u, lateral error servoed out
        #   block  — ball gliding off-heading: stand in its path
        #   chase  — ball coasting toward the hole (or we lost position):
        #            track a standoff point behind it
        #   settle — descend onto the standoff point
        #   travel — approach high, never sweeping through the ball
        # 86% success over 50 episodes at 400-step horizon (p90 episode
        # length 100); misses stall at the hole lip.
        hole = task._hole(env)[:2]
        to_goal = hole - obj[:2]
        d_goal = float(np.linalg.norm(to_goal))
        if d_goal < 1e-6:
            return np.zeros(4, np.float32)
        u = to_goal / d_goal
        corner = np.array([0.012 * np.sign(u[0]), 0.014 * np.sign(u[1])])
        p = ee[:2] + corner                # the striking corner's position
        z_strike = obj[2] + 0.035          # fingers centered on the ball
        rel = p - obj[:2]
        along = float(rel @ u)             # <0 means behind the ball
        lat = float(np.linalg.norm(rel - along * u))
        z_ok = abs(ee[2] - z_strike) < 0.02
        sp = task._ball_speed(env)
        in_push_pose = lat < 0.006 and -0.055 < along < -0.015 and z_ok
        if sp > 0.03:
            jid = mujoco.mj_name2id(env.model, mujoco.mjtObj.mjOBJ_JOINT,
                                    "ball_joint")
            vadr = env.model.jnt_dofadr[jid]
            vhat = env.data.qvel[vadr:vadr + 2] / max(sp, 1e-9)
            if float(vhat @ u) < 0.9 and sp > 0.06:
                tgt = np.array([*(obj[:2] + vhat * 0.045), z_strike])
                return np.clip(np.concatenate([(tgt - ee) * 10, [1.0]]),
                               -1, 1).astype(np.float32)          # block
            if sp > 0.15 or not in_push_pose:
                tgt = np.array([*(obj[:2] - u * 0.04 - corner), z_strike])
                a = np.clip(np.concatenate([(tgt - ee) * 10, [0.0]]),
                            -0.35, 0.35)
                a[3] = 1.0
                return a.astype(np.float32)                       # chase
        behind = obj[:2] - u * 0.045
        if in_push_pose and sp <= 0.15:
            v = max(min(0.3, 3.0 * d_goal), 0.12)
            tgt = obj[:2] - u * 0.023
            axy = np.clip((tgt - p) * 10.0, -0.12, 0.12) + u * v
            return np.clip(np.array([axy[0], axy[1],
                                     (z_strike - ee[2]) * 6, 1.0]),
                           -1, 1).astype(np.float32)              # push
        if np.linalg.norm(p - behind) < 0.025:
            return np.clip(np.concatenate(
                [(behind - p) * 10, [(z_strike - ee[2]) * 8], [1.0]]),
                -1, 1).astype(np.float32)                         # settle
        tgt = np.array([*(behind - corner), z_strike + 0.08])
        a = np.clip(np.concatenate([(tgt - ee) * 8, [-1.0]]), -1, 1)
        if np.linalg.norm(ee[:2] - obj[:2]) < 0.09:
            a[:2] = np.clip(a[:2], -0.25, 0.25)   # never punch the ball
        return a.astype(np.float32)                               # travel
    if name == "push":
        # goal-aware pushing: travel to a point BEHIND the object (opposite
        # the goal), descend, then drive through the object toward the goal
        goal = task._goal(env)[:2]
        to_goal = goal - obj[:2]
        d_goal = float(np.linalg.norm(to_goal))
        if d_goal < 1e-6:
            return np.zeros(4, np.float32)
        u = to_goal / d_goal
        z_work = obj[2] + 0.03
        behind = obj[:2] - u * 0.05
        aligned = np.linalg.norm(ee[:2] - behind) < 0.02
        if aligned and ee[2] < z_work + 0.02:
            speed = min(0.6, 4.0 * d_goal)   # ease off near the goal
            return np.clip(np.array([u[0] * speed, u[1] * speed,
                                     (z_work - ee[2]) * 4, 1.0]), -1, 1)
        if aligned:
            return np.clip(np.concatenate(
                [(behind - ee[:2]) * 8, [(z_work - ee[2]) * 8], [1.0]]),
                -1, 1)
        tgt = np.array([behind[0], behind[1], z_work + 0.08])
        if ee[2] < z_work + 0.05 and np.linalg.norm(ee[:2] - behind) > 0.03:
            tgt[2] = z_work + 0.12           # rise to clear the object
        return np.clip(np.concatenate([(tgt - ee) * 8, [1.0]]), -1, 1)
    # push-like default: move toward the object at table height and push
    return np.clip(np.concatenate([(obj - ee) * 10, [1.0]]), -1, 1)


@dataclasses.dataclass
class Trajectory:
    observations: List
    actions: List[np.ndarray]
    rewards: List[float]
    gripper_open: List[float]
    ee_positions: List[np.ndarray]
    success: bool


def generate_demonstrations(task_name: str = "lift", n_demos: int = 5,
                            obs_mode: str = "state", image_size: int = 32,
                            episode_length: int = 40, seed: int = 0,
                            keep_failures: bool = False,
                            policy=None) -> List[Trajectory]:
    """Roll out the expert (or a given policy), keep successful episodes."""
    env = XArmSimEnv(task_name=task_name, obs_mode=obs_mode,
                     image_size=image_size, seed=seed)
    trajs: List[Trajectory] = []
    ep = 0
    while len(trajs) < n_demos and ep < n_demos * 10:
        obs, _ = env.reset(seed=seed + ep)
        ep += 1
        tr = Trajectory([], [], [], [], [], False)
        for _ in range(episode_length):
            a = (policy(obs) if policy is not None else scripted_expert(env))
            tr.observations.append(obs)
            tr.actions.append(np.asarray(a, np.float32))
            tr.ee_positions.append(env.ee_pos())
            tr.gripper_open.append(env.gripper_open())
            obs, r, term, trunc, info = env.step(a)
            tr.rewards.append(float(r))
            if info.get("success"):
                tr.success = True
                break
        if tr.success or keep_failures:
            trajs.append(tr)
    return trajs


def generate_nerf_scene(task_name: str = "lift", n_views: int = 12,
                        image_size: int = 48, seed: int = 0,
                        n_random_steps: int = 3) -> Scene:
    """Random-policy rollout + camera orbit -> multi-view Scene (the
    gen_nerf_data flow), rendered with the raycast renderer."""
    env = XArmSimEnv(task_name=task_name, obs_mode="state",
                     image_size=image_size, seed=seed)
    env.reset(seed=seed)
    rng = np.random.default_rng(seed)
    for _ in range(n_random_steps):
        env.step(rng.uniform(-1, 1, 4))

    renderer = RaycastRenderer(env.model, image_size, image_size)
    images, poses, depths = [], [], []
    center = np.array([0.0, 0.0, 0.08])
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        eye = center + np.array([0.75 * np.cos(ang), 0.75 * np.sin(ang), 0.5])
        fwd = center - eye
        fwd /= np.linalg.norm(fwd)
        right = np.cross(fwd, [0, 0, 1.0])
        right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        env.set_camera_pose("dynamic", eye, np.concatenate([right, up]))
        out = renderer.render(env.data, "dynamic")
        images.append(out.rgb)
        depths.append(out.depth)
        poses.append(camera_pose(env.model, env.data, "dynamic"))
    k = env.camera_intrinsic("dynamic")
    return Scene(images=np.stack(images).astype(np.float32),
                 poses=np.stack(poses).astype(np.float32),
                 focal=float(k[0, 0]),
                 depth=np.stack(depths).astype(np.float32))


class KeyframeBuffer:
    """Keyframe discovery + storage over trajectories (utils_keyframe.py):
    a frame is a keyframe when the gripper state flips or the end effector
    stops (low velocity), plus the final frame."""

    def __init__(self, stop_threshold: float = 2e-3):
        self.stop_threshold = stop_threshold
        self.keyframes: List[Dict] = []

    def _discover(self, tr: Trajectory) -> List[int]:
        n = len(tr.actions)
        ks: List[int] = []
        for i in range(1, n):
            if (tr.gripper_open[i] > 0.5) != (tr.gripper_open[i - 1] > 0.5):
                ks.append(i)
            elif (i + 1 < n and np.linalg.norm(
                    tr.ee_positions[i] - tr.ee_positions[i - 1])
                    < self.stop_threshold):
                ks.append(i)
        ks.append(n - 1)
        return sorted(set(ks))

    def add_trajectory(self, tr: Trajectory):
        for k in self._discover(tr):
            self.keyframes.append({
                "obs": tr.observations[k],
                "ee_pos": tr.ee_positions[k],
                "gripper_open": tr.gripper_open[k],
                "action": tr.actions[k],
            })

    def __len__(self):
        return len(self.keyframes)

    def sample(self, batch_size: int, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        idx = rng.integers(0, len(self.keyframes), batch_size)
        return [self.keyframes[i] for i in idx]


def simple_motion_planning(start: np.ndarray, goal: np.ndarray,
                           n_steps: int = 10) -> np.ndarray:
    """Linear end-effector interpolation between keyframes (the reference's
    train_bc_keyframe.py:42 helper)."""
    ts = np.linspace(0.0, 1.0, n_steps + 1)[1:, None]
    return start[None] * (1 - ts) + goal[None] * ts
