#!/usr/bin/env python
"""FeatureNeRF pretraining driver (reference featurenerf train_embed.py):
pixelNeRF + teacher-feature distillation over scene npz datasets."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default=None,
                    help="dir of scene npz files; generated if absent")
    ap.add_argument("--config", default=None)
    ap.add_argument("-o", "--override", action="append", default=[])
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--log-dir", default=None)
    args = ap.parse_args()

    from real_robot_nerf_actor_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import dataclasses
    import tempfile
    from real_robot_nerf_actor_tpu.data.scene_dataset import (
        SceneDataset, synthesize_scene_npz)
    from real_robot_nerf_actor_tpu.train.featurenerf import (
        FeatureNerfConfig, FeatureNerfTrainer)
    from real_robot_nerf_actor_tpu.utils.config import load_config

    cfg = load_config(FeatureNerfConfig, args.config, args.override)
    tcfg = cfg.train
    if args.steps is not None:
        tcfg = dataclasses.replace(tcfg, num_steps=args.steps)
    tcfg = dataclasses.replace(tcfg, ckpt_dir=args.ckpt_dir or tcfg.ckpt_dir,
                               log_dir=args.log_dir or tcfg.log_dir)
    cfg = dataclasses.replace(cfg, train=tcfg)

    root = args.data_root
    if root is None:
        root = tempfile.mkdtemp(prefix="fnerf_scenes_")
        for i in range(4):
            synthesize_scene_npz(os.path.join(root, f"scene_{i}.npz"),
                                 seed=i, d_feature=cfg.model.d_embed)
        print(f"generated synthetic scenes -> {root}")
    scenes = SceneDataset(root, split="train")

    tr = FeatureNerfTrainer(cfg)
    trainer = tr.make_trainer(tr.scene_data(scenes))
    trainer.run()


if __name__ == "__main__":
    main()
