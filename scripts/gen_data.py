#!/usr/bin/env python
"""Data generation: expert demonstrations and multi-view NeRF scenes
(reference gen_demonstration_keyframe.py + gen_nerf_data.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["demos", "nerf", "kitchen",
                                     "multikitchen"],
                    help="demos: expert keyframe trajectories; "
                         "nerf: multi-view scene npz files; "
                         "kitchen: recorded real-robot-format demos "
                         "(ply + rgb png + xarm txt + calibration); "
                         "multikitchen: kitchens x language-conditioned "
                         "tasks grid + manifest + CLIP lang embeddings")
    ap.add_argument("--kitchens", type=int, default=2)
    ap.add_argument("--tasks", type=int, default=3)
    ap.add_argument("--task", default="lift")
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--views", type=int, default=12)
    ap.add_argument("--image-size", type=int, default=48)
    ap.add_argument("--image-hw", type=int, nargs=2, default=(60, 80),
                    help="kitchen GT view size (reference: 60 80)")
    ap.add_argument("--focal", type=float, default=76.18)
    ap.add_argument("--keyframes", type=int, default=5)
    ap.add_argument("--d-embed", type=int, default=512)
    ap.add_argument("--no-embeds", action="store_true")
    ap.add_argument("--train-views", type=int, default=1,
                    help="extra GT training cameras (multi-view GT "
                         "supervision; holdout camera always excluded)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import numpy as np
    os.makedirs(args.out, exist_ok=True)

    if args.mode == "multikitchen":
        from real_robot_nerf_actor_tpu.data.kitchen import (
            write_multi_kitchen_dataset)
        m = write_multi_kitchen_dataset(
            args.out, n_kitchens=args.kitchens, n_tasks=args.tasks,
            n_demos=args.n, seed=args.seed, image_hw=tuple(args.image_hw),
            focal=args.focal, d_embed=args.d_embed,
            write_embeds=not args.no_embeds,
            n_train_views=args.train_views)
        print(f"saved {m['n_kitchens']} kitchens x {m['n_tasks']} tasks x "
              f"{m['n_demos']} demos -> {args.out}")
    elif args.mode == "kitchen":
        from real_robot_nerf_actor_tpu.data.kitchen import write_kitchen_demos
        write_kitchen_demos(
            args.out, n_demos=args.n, n_keyframes=args.keyframes,
            image_hw=tuple(args.image_hw), focal=args.focal, seed=args.seed,
            d_embed=args.d_embed, write_embeds=not args.no_embeds,
            n_train_views=args.train_views)
        print(f"saved {args.n} kitchen demos x {args.keyframes} keyframes "
              f"-> {args.out}")
    elif args.mode == "demos":
        from real_robot_nerf_actor_tpu.data.demos import (
            KeyframeBuffer, generate_demonstrations)
        trajs = generate_demonstrations(
            args.task, n_demos=args.n, obs_mode="state",
            episode_length=80, seed=args.seed)
        buf = KeyframeBuffer()
        for i, tr in enumerate(trajs):
            buf.add_trajectory(tr)
            np.savez_compressed(
                os.path.join(args.out, f"traj_{i}.npz"),
                observations=np.stack(tr.observations),
                actions=np.stack(tr.actions),
                rewards=np.asarray(tr.rewards),
                ee_positions=np.stack(tr.ee_positions),
                gripper_open=np.asarray(tr.gripper_open),
                success=tr.success)
        print(f"saved {len(trajs)} trajectories ({len(buf)} keyframes) "
              f"-> {args.out}")
    else:
        from real_robot_nerf_actor_tpu.data.demos import generate_nerf_scene
        from real_robot_nerf_actor_tpu.data.scene_dataset import save_scene
        for i in range(args.n):
            sc = generate_nerf_scene(args.task, n_views=args.views,
                                     image_size=args.image_size,
                                     seed=args.seed + i)
            save_scene(os.path.join(args.out, f"scene_{i:04d}.npz"), sc)
        print(f"saved {args.n} scenes x {args.views} views -> {args.out}")


if __name__ == "__main__":
    main()
