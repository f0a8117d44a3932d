"""Episode datasets: stored sim trajectories -> keyframe PerAct batches.

Reference behavior: featurenerf/src/data/PerActDataset.py (RLBench episode
dirs + CLIP text features -> keyframe training tuples) and
src/utils.py BehaviorCloneDataset. Here episodes are the npz files written
by scripts/gen_data.py demos (or built in-memory from
data.demos.Trajectory), keyframes are discovered with KeyframeBuffer's
rules, and batches match train/peract.py's layout — closing the loop
sim rollout -> keyframe discovery -> voxel BC training.
"""
from __future__ import annotations

import glob
import os
from typing import Dict, Iterator, List, Optional

import numpy as np

from real_robot_nerf_actor_tpu.data.demos import Trajectory


def save_trajectory(path: str, tr: Trajectory, pointclouds=None) -> None:
    data = dict(
        actions=np.stack(tr.actions),
        rewards=np.asarray(tr.rewards),
        ee_positions=np.stack(tr.ee_positions),
        gripper_open=np.asarray(tr.gripper_open),
        success=tr.success)
    obs0 = tr.observations[0]
    if isinstance(obs0, dict):      # pointcloud observations
        n = min(o["points"].shape[0] for o in tr.observations)
        data["obs_points"] = np.stack([o["points"][:n] for o in tr.observations])
        data["obs_colors"] = np.stack([o["colors"][:n] for o in tr.observations])
    else:
        data["observations"] = np.stack(tr.observations)
    np.savez_compressed(path, **data)


def load_trajectory(path: str) -> Trajectory:
    z = np.load(path)
    if "obs_points" in z:
        obs = [{"points": p, "colors": c}
               for p, c in zip(z["obs_points"], z["obs_colors"])]
    else:
        obs = list(z["observations"])
    return Trajectory(observations=obs, actions=list(z["actions"]),
                      rewards=list(z["rewards"]),
                      gripper_open=list(z["gripper_open"]),
                      ee_positions=list(z["ee_positions"]),
                      success=bool(z["success"]))


class EpisodeDataset:
    """Keyframe tuples over stored episodes (PerActDataset equivalent).

    Each sample is (current keyframe obs, next keyframe action) with the
    same field layout PerActTrainer.train_step consumes.
    """

    def __init__(self, root_or_trajs, coord_bounds, voxel_size: int = 100,
                 rotation_resolution: float = 5.0,
                 max_num_coords: int = 220000,
                 lang_embs: Optional[np.ndarray] = None,
                 lang_shape=(77, 512)):
        if isinstance(root_or_trajs, str):
            paths = sorted(glob.glob(os.path.join(root_or_trajs, "*.npz")))
            self.trajs = [load_trajectory(p) for p in paths]
        else:
            self.trajs = list(root_or_trajs)
        if not self.trajs:
            raise ValueError("no trajectories")
        from real_robot_nerf_actor_tpu.data.demos import KeyframeBuffer
        self.bounds = np.asarray(coord_bounds, np.float32)
        self.voxel_size = voxel_size
        self.rotation_resolution = rotation_resolution
        self.max_num_coords = max_num_coords
        self.lang = (lang_embs if lang_embs is not None
                     else np.zeros(lang_shape, np.float32))

        # per-trajectory keyframe indices (KeyframeBuffer discovery rules)
        buf = KeyframeBuffer()
        self._kf: List[List[int]] = [buf._discover(t) for t in self.trajs]
        self.samples: List = []   # (traj_idx, kf_pos) with a next keyframe
        for ti, ks in enumerate(self._kf):
            for pi in range(len(ks) - 1):
                self.samples.append((ti, pi))
        if not self.samples:
            raise ValueError("no keyframe pairs discovered")

    def __len__(self):
        return len(self.samples)

    def _obs_pointcloud(self, tr: Trajectory, step: int):
        obs = tr.observations[step]
        if isinstance(obs, dict):
            return obs["points"], obs["colors"]
        raise ValueError("episode observations must be point clouds for "
                         "PerAct batches (obs_mode='pointcloud')")

    def get(self, idx: int) -> Dict[str, np.ndarray]:
        from real_robot_nerf_actor_tpu.data.replay import (
            PointCloudSample, pad_point_cloud)
        ti, pi = self.samples[idx]
        tr = self.trajs[ti]
        ks = self._kf[ti]
        cur, nxt = ks[pi], ks[pi + 1]
        pts, cols = self._obs_pointcloud(tr, cur)
        pts, cols, valid = pad_point_cloud(
            PointCloudSample(np.asarray(pts, np.float32),
                             np.asarray(cols, np.float32) * 2.0 - 1.0),
            self.max_num_coords)

        def rot_deg(step):
            # sim episodes store no wrist rotation; encode identity
            return np.zeros(3, np.float32)

        r = int(360 // self.rotation_resolution)
        rot_bins = ((rot_deg(nxt) + 180.0)
                    / self.rotation_resolution).astype(np.int32) - 1
        grip = int(tr.gripper_open[nxt] > 0.5)
        cur_bins = ((rot_deg(cur) + 180.0)
                    / self.rotation_resolution).astype(np.int32) - 1
        return {
            "points": pts,
            "colors": cols,
            "valid": valid,
            "proprio": np.concatenate(
                [np.zeros(3, np.float32), cur_bins.astype(np.float32),
                 [float(tr.gripper_open[cur] > 0.5)]]),
            "lang": self.lang,
            "kf_xyz": np.stack([tr.ee_positions[cur], tr.ee_positions[nxt]]
                               ).astype(np.float32),
            "rot_grip": np.concatenate([rot_bins, [grip]]).astype(np.int32),
            "collision": np.asarray([1], np.int32),
        }

    def batches(self, batch_size: int = 1, seed: int = 0
                ) -> Iterator[Dict[str, np.ndarray]]:
        import jax.numpy as jnp
        rng = np.random.default_rng(seed)
        while True:
            idx = rng.integers(0, len(self.samples), batch_size)
            items = [self.get(int(i)) for i in idx]
            yield {k: jnp.asarray(np.stack([it[k] for it in items]))
                   for k in items[0]}
