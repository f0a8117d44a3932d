#!/usr/bin/env python
"""NeRF -> feature point cloud extraction (reference extract_nerf_feat,
train_nerfact_multi_kitchen.py:849-1077 / featurenerf_robo/extract_nerf_feat.py):
render one view's per-sample radiance from a trained nerfact checkpoint,
sigma-threshold into a 50-70k point feature cloud, save npz.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--out", default="nerf_feat.npz")
    ap.add_argument("--target-min", type=int, default=50000)
    ap.add_argument("--target-max", type=int, default=70000)
    args = ap.parse_args()

    from real_robot_nerf_actor_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from real_robot_nerf_actor_tpu.train import NerfActConfig, NerfActTrainer
    from real_robot_nerf_actor_tpu.train.trainer import CheckpointManager
    from real_robot_nerf_actor_tpu.eval import extract_nerf_pointcloud
    from real_robot_nerf_actor_tpu.ops import gen_rays, voxelize

    cfg = NerfActConfig()
    tr = NerfActTrainer(cfg)
    state = tr.init_state(jax.random.key(0))
    mgr = CheckpointManager(args.ckpt_dir)
    restored = mgr.restore(state, params_only=True)
    if restored is not None:
        state = restored
        print(f"restored step {int(state.step)}")

    # voxel features from the policy on a synthetic observation
    batch = next(tr.synthetic_data(batch_size=1))
    out = tr._forward(state.params["policy"], state.extra, voxelize(
        batch["points"], batch["colors"], tr.bounds, cfg.peract.voxelizer,
        valid=batch["valid"]), batch["proprio"], batch["lang"], train=False)
    voxel_feat = out[0][3]

    rc = cfg.renderer
    rays = gen_rays(batch["gt_pose"][:1], rc.image_width, rc.image_height,
                    batch["focal"][0], rc.z_near, rc.z_far).reshape(-1, 8)
    r = tr.renderer
    out = r.render_rays({"params": state.params["nerf"]}, voxel_feat[:1],
                        rays, jax.random.key(1))
    fine = out["fine"]
    k = fine.weights.shape[-1]
    # reconstruct per-sample points from sorted z (weights carry z implicitly;
    # use the midpoint approximation via depth-weighted samples)
    field = r.field
    # direct per-sample export: evaluate once more with explicit z
    from real_robot_nerf_actor_tpu.ops.sampling import sample_coarse
    z = sample_coarse(jax.random.key(2), rays, rc.n_coarse)
    pts = rays[:, None, :3] + z[..., None] * rays[:, None, 3:6]
    dirs = jnp.broadcast_to(rays[:, None, 3:6], pts.shape)
    rkd = pts.shape[0] * pts.shape[1]
    fo = field.apply({"params": state.params["nerf"]}, voxel_feat[:1],
                     pts.reshape(1, rkd, 3), dirs.reshape(1, rkd, 3))
    res = extract_nerf_pointcloud(
        np.asarray(pts).reshape(-1, 3), np.asarray(fo["rgb"]).reshape(-1, 3),
        np.asarray(fo["sigma"]).reshape(-1),
        np.asarray(fo["embed"]).reshape(rkd, -1),
        target_min=args.target_min, target_max=args.target_max)
    np.savez_compressed(args.out, **{k: v for k, v in res.items()})
    print(f"saved {res['points'].shape[0]} points -> {args.out} "
          f"(sigma thr {float(res['threshold']):.4f})")


if __name__ == "__main__":
    main()
