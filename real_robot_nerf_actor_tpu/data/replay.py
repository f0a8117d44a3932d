"""Robot/camera I/O behind a protocol, with replay implementations.

The reference talks to hardware directly (XArmAPI + pyrealsense2 in
/root/reference/val_real_camera_prev.py:46-160,700-876). Per BASELINE.json,
real-sensor I/O is stubbed behind a replay interface: `RobotIO` is the
protocol a hardware backend would implement; `ReplayRobotIO` serves recorded
demos so training/eval/deployment code runs identically with or without a
robot.
"""
from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Protocol, Tuple

import numpy as np

from real_robot_nerf_actor_tpu.data.keyframes import (
    KeyframeDemo, parse_xarm_position_file)
from real_robot_nerf_actor_tpu.data.ply import read_ply


@dataclasses.dataclass
class PointCloudSample:
    """One observation: points in robot-base frame + normalized colors.

    `valid` marks real rows in a pre-padded cloud (False = padding).
    None means every row is a real point — a pre-padded device-resident
    cloud (the serving fast path) MUST either carry its mask here or hold
    exactly max_num_coords real points: zero-pad rows land at the origin,
    which is inside the kitchen coord_bounds, and would voxelize into a
    phantom occupied cell."""

    points: np.ndarray  # (N, 3) float32, metres, base frame
    colors: np.ndarray  # (N, 3) float32 in [-1, 1] (reference normalization)
    valid: Optional[np.ndarray] = None  # (N,) bool, real-point mask


def load_rgb_pcd(pcd_path: str, cam2base: np.ndarray,
                 max_range: float = 3.0) -> PointCloudSample:
    """Load a .ply, filter far points, transform to base frame, normalize rgb.

    Mirrors get_rgb_pcd (train_peract_single_kitchen_single_task.py:375-390):
    drop points with ||p|| >= 3 m, p_base = p @ R^T + t, rgb -> (rgb-0.5)/0.5.
    """
    pts, colors = read_ply(pcd_path)
    if colors is None:
        colors = np.zeros_like(pts)
    keep = np.linalg.norm(pts, axis=1) < max_range
    pts, colors = pts[keep], colors[keep]
    pts = pts @ cam2base[:3, :3].T + cam2base[:3, 3]
    colors = (colors - 0.5) / 0.5
    return PointCloudSample(points=pts.astype(np.float32),
                            colors=colors.astype(np.float32))


def pad_point_cloud(sample: PointCloudSample, max_num_coords: int
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad/truncate to a static size; returns (points, colors, valid_mask).

    Device arrays pass through in-namespace: a pre-padded device-resident
    cloud (the serving fast path) costs ZERO host work and zero
    host->device transfer here — a fresh np.ones(220k) mask would ship
    220 KB over the link every control step."""
    n = sample.points.shape[0]
    if n >= max_num_coords:
        if not isinstance(sample.points, np.ndarray):
            import jax.numpy as jnp
            pts = sample.points if n == max_num_coords \
                else sample.points[:max_num_coords]
            cols = sample.colors if n == max_num_coords \
                else sample.colors[:max_num_coords]
            if sample.valid is not None:
                valid = (sample.valid if n == max_num_coords
                         else sample.valid[:max_num_coords])
            else:
                # no mask supplied: every row is declared real (see
                # PointCloudSample.valid — pre-padded clouds must carry
                # their mask or phantom origin points get voxelized)
                valid = jnp.ones(max_num_coords, bool)
            return pts, cols, valid
        if sample.valid is not None:
            return (sample.points[:max_num_coords],
                    sample.colors[:max_num_coords],
                    np.asarray(sample.valid[:max_num_coords], bool))
        return (sample.points[:max_num_coords], sample.colors[:max_num_coords],
                np.ones(max_num_coords, bool))
    pad = max_num_coords - n
    pts = np.concatenate([sample.points, np.zeros((pad, 3), np.float32)])
    cols = np.concatenate([sample.colors, np.zeros((pad, 3), np.float32)])
    base_valid = (np.asarray(sample.valid, bool) if sample.valid is not None
                  else np.ones(n, bool))
    valid = np.concatenate([base_valid, np.zeros(pad, bool)])
    return pts, cols, valid


class RobotIO(Protocol):
    """Hardware abstraction used by the deployment loop (train/serve.py)."""

    def capture_pointcloud(self) -> PointCloudSample: ...

    def get_proprio(self) -> Tuple[np.ndarray, np.ndarray, float]:
        """Returns (xyz metres, rotation degrees, gripper_open)."""
        ...

    def move_to(self, xyz: np.ndarray, rotation_deg: np.ndarray,
                gripper_open: float) -> None: ...


@dataclasses.dataclass
class ReplayStep:
    observation: PointCloudSample
    proprio_xyz: np.ndarray
    proprio_rot: np.ndarray
    proprio_grip: float


class ReplayRobotIO:
    """RobotIO implementation that replays a recorded demo; `move_to` records
    the commanded actions so tests can assert on the policy's outputs."""

    def __init__(self, steps: List[ReplayStep]):
        self._steps = steps
        self._t = 0
        self.commands: List[Tuple[np.ndarray, np.ndarray, float]] = []

    def capture_pointcloud(self) -> PointCloudSample:
        return self._steps[min(self._t, len(self._steps) - 1)].observation

    def get_proprio(self):
        s = self._steps[min(self._t, len(self._steps) - 1)]
        return s.proprio_xyz, s.proprio_rot, s.proprio_grip

    def move_to(self, xyz, rotation_deg, gripper_open):
        self.commands.append((np.asarray(xyz), np.asarray(rotation_deg),
                              float(gripper_open)))
        self._t += 1


class ReplaySource:
    """Keyframe-demo dataset over a directory tree shaped like the
    reference's data layout (train_nerfact_multi_kitchen.py:1256-1284):

        root/
          calibration.json               # cam2base/gt_pose/focal (optional)
          {demo}_xarm_position.txt       # keyframe poses
          real{demo}/pcd{k}.ply          # per-keyframe point clouds
          real{demo}/rgb{k}.png          # GT view (nerfact; optional)
          real{demo}/embed{k}.npy        # teacher features (optional)
          real{demo}/depth{k}.npy        # GT depth (optional)

    cam2base: explicit override; when None it comes from calibration.json
    (identity if neither exists).
    """

    def __init__(self, root: str, n_demos: int,
                 cam2base: Optional[np.ndarray] = None):
        import json
        self.root = root
        self.calibration: dict = {}
        calib_path = os.path.join(root, "calibration.json")
        if os.path.exists(calib_path):
            with open(calib_path) as f:
                self.calibration = json.load(f)
        if cam2base is None:
            cam2base = np.asarray(
                self.calibration.get("cam2base", np.eye(4)), np.float64)
        self.cam2base = cam2base
        self.demos: List[KeyframeDemo] = [
            parse_xarm_position_file(
                os.path.join(root, f"{d}_xarm_position.txt"))
            for d in range(n_demos)]

    def num_keyframes(self, demo: int) -> int:
        return self.demos[demo].num_keyframes

    def pose(self, demo: int, k: int):
        d = self.demos[demo]
        return d.xyz[k], d.rotation[k], d.gripper_open[k]

    def pointcloud(self, demo: int, k: int) -> PointCloudSample:
        path = os.path.join(self.root, f"real{demo}", f"pcd{k}.ply")
        return load_rgb_pcd(path, self.cam2base)

    # ------------------------------------------------------- GT views
    @property
    def has_views(self) -> bool:
        """True when the dataset carries GT RGB views (the nerfact joint
        trainer's requirement; PerAct-only recordings may omit them)."""
        return os.path.exists(
            os.path.join(self.root, "real0", "rgb0.png"))

    @property
    def gt_pose(self) -> np.ndarray:
        """(4, 4) OpenGL camera-to-world pose for ray generation. Falls
        back to cam2base (the reference uses its calibration matrix as the
        render pose, train_nerfact_multi_kitchen.py:1390-1397)."""
        return np.asarray(
            self.calibration.get("gt_pose", self.cam2base), np.float32)

    @property
    def focal(self) -> float:
        return float(self.calibration.get("focal", 76.18))

    @property
    def has_holdout(self) -> bool:
        """True when the recording carries a second, never-trained-on view
        (real{d}/holdout{k}.png + calibration holdout_pose) for novel-view
        eval — the eval_novel.py analog for the real-robot stack."""
        return ("holdout_pose" in self.calibration and os.path.exists(
            os.path.join(self.root, "real0", "holdout0.png")))

    @property
    def holdout_pose(self) -> np.ndarray:
        return np.asarray(self.calibration["holdout_pose"], np.float32)

    def holdout_view(self, demo: int, k: int) -> dict:
        from PIL import Image
        rgb = np.asarray(
            Image.open(os.path.join(self.root, f"real{demo}",
                                    f"holdout{k}.png")).convert("RGB"),
            np.float32) / 255.0
        return {"rgb": rgb, "pose": self.holdout_pose, "focal": self.focal}

    @property
    def n_train_views(self) -> int:
        """Number of distinct GT training cameras (multi-view recordings
        write rgb{k}_v{j}.png + calibration train_poses; single-view = 1)."""
        return max(1, len(self.calibration.get("train_poses", [])))

    def train_pose(self, v: int = 0) -> np.ndarray:
        tp = self.calibration.get("train_poses")
        return (np.asarray(tp[v], np.float32) if tp else self.gt_pose)

    def view(self, demo: int, k: int, v: int = 0) -> dict:
        """GT view for keyframe k (camera v): {'rgb' (H,W,3) in [0,1],
        'pose' (4,4), 'focal', and optionally 'embed' (H,W,D),
        'depth' (H,W)}."""
        from PIL import Image
        ddir = os.path.join(self.root, f"real{demo}")
        sfx = "" if v == 0 else f"_v{v}"
        rgb = np.asarray(
            Image.open(os.path.join(ddir, f"rgb{k}{sfx}.png")).convert("RGB"),
            np.float32) / 255.0
        out = {"rgb": rgb, "pose": self.train_pose(v), "focal": self.focal}
        epath = os.path.join(ddir, f"embed{k}{sfx}.npy")
        if os.path.exists(epath):
            out["embed"] = np.load(epath).astype(np.float32)
        dpath = os.path.join(ddir, f"depth{k}{sfx}.npy")
        if os.path.exists(dpath):
            out["depth"] = np.load(dpath).astype(np.float32)
        return out
