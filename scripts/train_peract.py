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

    from real_robot_nerf_actor_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

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
        data = tr.replay_data(args.data_root, args.n_demos, args.batch_size)
    else:
        data = tr.synthetic_data(batch_size=args.batch_size)
    trainer = tr.make_trainer(data)
    trainer.run(resume=not args.no_resume)


if __name__ == "__main__":
    main()
