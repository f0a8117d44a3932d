#!/usr/bin/env python
"""Closed-loop deployment (reference val_real_camera_prev.py) with the robot
behind the RobotIO protocol — replay mode by default."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    from real_robot_nerf_actor_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import numpy as np
    import jax
    from real_robot_nerf_actor_tpu.data.replay import ReplayRobotIO
    from real_robot_nerf_actor_tpu.data.synthetic import (
        make_replay_steps, make_synthetic_demo, make_synthetic_scene)
    from real_robot_nerf_actor_tpu.train import PerActConfig, PerActTrainer
    from real_robot_nerf_actor_tpu.train.serve import (
        PolicyServer, ServeConfig, run_deployment)
    from real_robot_nerf_actor_tpu.train.trainer import CheckpointManager

    cfg = PerActConfig()
    tr = PerActTrainer(cfg)
    state = tr.init_state(jax.random.key(0))
    if args.ckpt_dir:
        restored = CheckpointManager(args.ckpt_dir).restore(state, params_only=True)
        if restored is not None:
            state = restored
            print(f"restored step {int(state.step)}")

    scene = make_synthetic_scene(seed=0)
    demo = make_synthetic_demo(scene)
    robot = ReplayRobotIO(make_replay_steps(scene, demo))
    server = PolicyServer(
        ServeConfig(coord_bounds=cfg.coord_bounds, num_steps=args.steps),
        cfg.model, cfg.voxelizer,
        {"params": state.params, **state.extra},
        np.zeros((cfg.model.lang_max_seq_len, cfg.model.lang_emb_dim),
                 np.float32))
    trace = run_deployment(server, robot)
    for a in trace:
        print(a["step"], a["xyz"].round(3), a["rotation"].round(1),
              "grip", a["gripper_open"])


if __name__ == "__main__":
    main()
