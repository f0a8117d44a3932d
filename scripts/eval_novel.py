#!/usr/bin/env python
"""Novel-view evaluation (reference featurenerf/eval/eval_novel.py): render
held-out views with a trained pixelNeRF and report PSNR/SSIM."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True, help="scene npz dir")
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--n-scenes", type=int, default=2)
    ap.add_argument("--out", default=None, help="save render panels here")
    args = ap.parse_args()

    from real_robot_nerf_actor_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from real_robot_nerf_actor_tpu.data.scene_dataset import SceneDataset
    from real_robot_nerf_actor_tpu.eval.metrics import psnr_np, ssim_np
    from real_robot_nerf_actor_tpu.ops import gen_rays
    from real_robot_nerf_actor_tpu.train.featurenerf import (
        FeatureNerfConfig, FeatureNerfTrainer)
    from real_robot_nerf_actor_tpu.train.trainer import CheckpointManager

    scenes = SceneDataset(args.data_root, split="val")
    sc0 = scenes[0]
    h, w = sc0.images.shape[1:3]
    cfg = FeatureNerfConfig()
    tr = FeatureNerfTrainer(cfg)
    state = tr.init_state(jax.random.key(0), image_shape=(h, w))
    if args.ckpt_dir:
        restored = CheckpointManager(args.ckpt_dir).restore(state)
        if restored is not None:
            state = restored

    variables = {"params": state.params, **state.extra}
    psnrs, ssims = [], []
    for si in range(min(args.n_scenes, len(scenes))):
        sc = scenes[si]
        src, tgt = 0, len(sc.images) // 2  # held-out middle view
        latent = tr.net.apply(variables,
                              jnp.asarray(sc.images[src] * 2 - 1)[None],
                              method=tr.net.encode)
        w2c = jnp.linalg.inv(jnp.asarray(sc.poses[src]))[None]
        focal = jnp.asarray([sc.focal, -sc.focal])
        enc = (latent, w2c, focal, jnp.zeros(2), (h, w))
        rays = gen_rays(jnp.asarray(sc.poses[tgt])[None], w, h,
                        jnp.asarray(sc.focal), cfg.z_near,
                        cfg.z_far).reshape(-1, 8)
        out = tr.renderer.render_rays(variables, enc, rays, jax.random.key(si))
        pred = np.asarray(out["fine"].rgb).reshape(h, w, 3)
        gt = sc.images[tgt]
        psnrs.append(psnr_np(pred, gt))
        ssims.append(ssim_np(pred.mean(-1), gt.mean(-1)))
        if args.out:
            os.makedirs(args.out, exist_ok=True)
            from real_robot_nerf_actor_tpu.utils.visualize import (
                save_render_panel)
            save_render_panel(os.path.join(args.out, f"novel_{si}.png"),
                              gt, pred, psnr=psnrs[-1])
    print(f"novel-view PSNR: {np.mean(psnrs):.2f} +- {np.std(psnrs):.2f}  "
          f"SSIM: {np.mean(ssims):.3f}")


if __name__ == "__main__":
    main()
