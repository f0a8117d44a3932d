#!/usr/bin/env python
"""Train the geometry-guided contrastive teacher and dump its features.

Round-4 gap: no pretrained DINO exists in this sandbox, so FeatureNeRF
distilled a random-init ViT whose features are not view-invariant
(corr@2px 0.9%). This trains an in-repo teacher whose objective IS
view-invariance (InfoNCE over depth-reprojection-matched pixels — Pri3D's
geometry-guided pretraining; the reference ships Pri3D in its zoo,
src/representations/utils_pri3d), then writes its dense features + saliency
into the scene npz files exactly where dump_teacher_features.py would,
so train_featurenerf.py / eval_novel.py run unchanged downstream.

Usage:
  python scripts/train_teacher.py --data-root datasets/nerf_lift_r4 \
      --steps 3000 --out artifacts/round5_featurenerf/teacher.msgpack \
      --dump --quality-out artifacts/round5_featurenerf/teacher_quality.json
"""
import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True, help="dir of scene .npz")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--d-embed", type=int, default=64)
    ap.add_argument("--n-pairs", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--temperature", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--val-scenes", type=int, default=2,
                    help="LAST n scenes held out of teacher training for "
                         "the view-invariance metrics")
    ap.add_argument("--out", default=None, help="save params (msgpack)")
    ap.add_argument("--resume", default=None, help="load params instead of "
                    "training (implies --steps 0 unless given)")
    ap.add_argument("--dump", action="store_true",
                    help="write features+attn into every scene npz")
    ap.add_argument("--quality-out", default=None)
    args = ap.parse_args()

    from real_robot_nerf_actor_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import serialization
    from real_robot_nerf_actor_tpu.data.scene_dataset import (load_scene,
                                                              save_scene)
    from real_robot_nerf_actor_tpu.train.teacher import (
        TeacherConfig, TeacherTrainer, match_pixels, teacher_quality)

    paths = sorted(glob.glob(os.path.join(args.data_root, "*.npz")))
    assert paths, args.data_root
    scenes = [load_scene(p) for p in paths]
    assert scenes[0].depth is not None, \
        "teacher training needs scenes recorded with depth (gen_data nerf)"
    n_val = min(args.val_scenes, max(0, len(scenes) - 1))
    train_scenes = scenes[: len(scenes) - n_val]
    val_scenes = scenes[len(scenes) - n_val:]
    h, w = scenes[0].images.shape[1:3]

    cfg = TeacherConfig(d_embed=args.d_embed, n_pairs=args.n_pairs,
                        lr=args.lr, temperature=args.temperature,
                        steps=args.steps, seed=args.seed)
    tr = TeacherTrainer(cfg)
    state = tr.init_state(jax.random.key(args.seed), (h, w))
    if args.resume:
        with open(args.resume, "rb") as f:
            state = serialization.from_bytes(state, f.read())
        print(f"[teacher] resumed {args.resume}")

    rng = np.random.default_rng(args.seed)
    step_fn = tr.make_step()
    t_imgs = [jnp.asarray(sc.images) for sc in train_scenes]
    for step in range(args.steps):
        while True:
            si = int(rng.integers(0, len(train_scenes)))
            sc = train_scenes[si]
            i, j = rng.choice(len(sc.images), 2, replace=False)
            m = match_pixels(sc.poses, sc.focal, sc.depth, int(i), int(j),
                             cfg.n_pairs, rng, cfg.depth_tol)
            if m is not None:
                break
        imgs = jnp.stack([t_imgs[si][int(i)], t_imgs[si][int(j)]])
        state, metrics = step_fn(state, imgs, jnp.asarray(m[0]),
                                 jnp.asarray(m[1]))
        if step % 100 == 0 or step == args.steps - 1:
            print(f"[teacher] step {step} "
                  + " ".join(f"{k}={float(v):.4f}"
                             for k, v in metrics.items()))

    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "wb") as f:
            f.write(serialization.to_bytes(state))
        print(f"[teacher] saved {args.out}")

    q = teacher_quality(state, tr, val_scenes or train_scenes[-1:],
                        np.random.default_rng(123))
    print(f"[teacher] view-invariance: {q}")
    if args.quality_out:
        os.makedirs(os.path.dirname(args.quality_out) or ".", exist_ok=True)
        with open(args.quality_out, "w") as f:
            json.dump({"provenance": "in-repo geometry-contrastive teacher "
                       f"({args.steps} steps, seed {args.seed})", **q},
                      f, indent=1)

    if args.dump:
        for p, sc in zip(paths, scenes):
            feats, attn = tr.feature_maps(state, sc.images)
            sc.features = feats
            sc.cls_attn = attn
            save_scene(p, sc)
            print(f"{os.path.basename(p)}: features {feats.shape}")
        print("[teacher] features dumped into scene npz files")


if __name__ == "__main__":
    main()
