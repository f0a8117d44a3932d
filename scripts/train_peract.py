#!/usr/bin/env python
"""PerAct BC training driver (reference train_peract_* family: single/multi
task and kitchen are data configs, not script copies).

Usage:
  python scripts/train_peract.py --steps 1000 --ckpt-dir /tmp/ckpt \
      [--data-root DIR --n-demos 5] [--config cfg.yaml] [-o optim.lr=3e-4]

Without --data-root it trains on the bundled synthetic kitchen scene.
"""
import argparse
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="YAML/JSON PerActConfig")
    ap.add_argument("-o", "--override", action="append", default=[],
                    help="dot-path config overrides, e.g. optim.lr=3e-4")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--log-dir", default=None)
    ap.add_argument("--data-root", default=None,
                    help="directory with {demo}_xarm_position.txt + real{demo}/pcd{k}.ply")
    ap.add_argument("--n-demos", type=int, default=5)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    import dataclasses
    from real_robot_nerf_actor_tpu.train import PerActConfig, PerActTrainer
    from real_robot_nerf_actor_tpu.utils.config import load_config

    cfg = load_config(PerActConfig, args.config, args.override)
    tcfg = cfg.train
    if args.steps is not None:
        tcfg = dataclasses.replace(tcfg, num_steps=args.steps)
    tcfg = dataclasses.replace(tcfg, ckpt_dir=args.ckpt_dir or tcfg.ckpt_dir,
                               log_dir=args.log_dir or tcfg.log_dir)
    cfg = dataclasses.replace(cfg, train=tcfg)

    tr = PerActTrainer(cfg)
    if args.data_root:
        data = replay_data(tr, args.data_root, args.n_demos, args.batch_size)
    else:
        data = tr.synthetic_data(batch_size=args.batch_size)
    trainer = tr.make_trainer(data)
    trainer.run(resume=not args.no_resume)


def replay_data(tr, root, n_demos, batch_size):
    """Batches from recorded demos (reference data layout)."""
    import numpy as np
    import jax.numpy as jnp
    from real_robot_nerf_actor_tpu.data.replay import (
        ReplaySource, pad_point_cloud)
    from real_robot_nerf_actor_tpu.ops import discretize_action

    c = tr.cfg
    src = ReplaySource(root, n_demos, np.eye(4))
    rng = np.random.default_rng(0)
    lang = np.zeros((c.model.lang_max_seq_len, c.model.lang_emb_dim),
                    np.float32)
    while True:
        out = {k: [] for k in ("points", "colors", "valid", "proprio", "lang",
                               "kf_xyz", "rot_grip", "collision")}
        for _ in range(batch_size):
            d = int(rng.integers(0, n_demos))
            k = int(rng.integers(0, src.num_keyframes(d) - 1))
            pc = src.pointcloud(d, k)
            pts, cols, valid = pad_point_cloud(pc, c.voxelizer.max_num_coords)
            xyz0, rot0, g0 = src.pose(d, k)
            xyz1, rot1, g1 = src.pose(d, k + 1)
            nxt = discretize_action(
                jnp.asarray(xyz1)[None], jnp.asarray(rot1)[None],
                jnp.asarray([g1]), jnp.ones((1,)), tr.bounds,
                c.model.voxel_size, c.rotation_resolution)
            cur = discretize_action(
                jnp.asarray(xyz0)[None], jnp.asarray(rot0)[None],
                jnp.asarray([g0]), jnp.ones((1,)), tr.bounds,
                c.model.voxel_size, c.rotation_resolution)
            out["points"].append(pts)
            out["colors"].append(cols)
            out["valid"].append(valid)
            out["proprio"].append(np.concatenate(
                [np.zeros(3, np.float32), np.asarray(cur.rot_grip[0], np.float32)]))
            out["lang"].append(lang)
            out["kf_xyz"].append(np.stack([xyz0, xyz1]))
            out["rot_grip"].append(np.asarray(nxt.rot_grip[0]))
            out["collision"].append(np.asarray(nxt.collision[0]))
        yield {k: jnp.asarray(np.stack(v)) for k, v in out.items()}


if __name__ == "__main__":
    main()
